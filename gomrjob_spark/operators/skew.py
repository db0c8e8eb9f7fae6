"""Skew controls: salted joins and salted aggregation.

AQE's skew-join splitting (on in this engine's session) handles most skew
by splitting oversized partitions of a sort-merge join. Two cases it does
not cover: (a) broadcast-ineligible joins where ONE key dominates so hard
that even a split partition's rows all carry the same key (the split
can't separate them), and (b) high-cardinality aggregation where one
group floods a single reducer. The classic remedy is salting:

- join: replicate the small side R times (salt 0..R-1), scatter the big
  side's rows uniformly over R salts, join on (key, salt). Every hot key
  now spreads over R tasks at the cost of R x |small side| shuffle volume.
- aggregation: two-phase — aggregate on (key, salt) first (spreads the
  hot group), then re-aggregate on key (tiny input).

Salting is opt-in per join/agg because it costs replication; profile
first (AQE metrics show the skew), then apply where the plan proves hot.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with ``salt``-way key
    spreading. ``small`` is replicated ``salt`` times; ``big`` rows get a
    uniform deterministic salt (hash of all columns, not a random() —
    reruns and task retries must salt identically or results change).

    ``how`` must preserve the big (non-replicated) side: 'inner' or
    'left'. A 'right'/'full' join would emit ``salt`` duplicate
    null-extended rows for every unmatched small-side row (each replica
    fails the match independently), so those are rejected."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how in {{'inner','left'}}, got {how!r}: "
            "right/full would duplicate unmatched replicated small-side rows"
        )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    big_salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    salted_big = big.withColumn("_salt", big_salt.cast("int"))
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


_MERGE_FNS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for algebraic aggregates.

    ``aggs`` maps output names to ``(phase1_aggregate, merge)`` where
    ``merge`` in {'sum','min','max'} re-combines the salted partials
    (count partials merge by 'sum'; sum/min/max by themselves). Phase 1
    groups on (keys, salt) so the hot group's rows spread over ``salt``
    tasks; phase 2 merges at most ``salt`` partial rows per key."""
    for name, (_, merge) in aggs.items():
        if merge not in _MERGE_FNS:
            raise ValueError(f"{name}: merge must be one of {sorted(_MERGE_FNS)}")
    phase1 = (
        df.withColumn(
            "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
        )
        .groupBy(*keys, "_salt")
        .agg(*[c.alias(name) for name, (c, _) in aggs.items()])
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGE_FNS[merge](name).alias(name) for name, (_, merge) in aggs.items()]
    )
