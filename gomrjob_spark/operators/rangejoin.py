"""Bucketed band join — inequality-only joins made shuffle-friendly.

A join whose ONLY predicate is a range (``r.ts - l.ts BETWEEN lo AND hi``,
no equi key) compiles to BroadcastNestedLoopJoin in Spark: O(|L| x |R|)
compares and a broadcast requirement — unusable at 100 TB. The standard
scalable formulation (what Databricks' range-join hint and KDB-style band
joins do under the hood) turns the band into an equi key:

1. pick a bucket width >= the band width,
2. each left row keys by its bucket, each right row *explodes* to the
   (at most two) buckets its admissible band overlaps,
3. equi-join on the bucket id (hash shuffle, AQE-skew-splittable),
4. apply the exact band predicate as a post-join residual filter.

Cost: one row duplication on one side + a hash shuffle, versus a full
cross product. Any additional equi keys just join on (key, bucket).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gomrjob_spark.functions import epoch_us


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    extra_keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Pairs where ``right_ts - left_ts`` falls in
    ``[lower_seconds, upper_seconds]`` (inclusive both ends).

    Output columns: all of ``left`` + all of ``right`` (caller should
    pre-select/alias to avoid collisions). ``extra_keys`` are additional
    equi-join column names present on both sides.

    Only ``how='inner'`` is supported: the exact band predicate is a
    post-join residual filter, which would silently drop the
    null-extended rows of any outer join (residual evaluates to NULL),
    and the right side's 2-bucket explode would duplicate unmatched
    right rows — so outer variants are rejected rather than wrong.
    """
    if how != "inner":
        raise ValueError(
            f"band_join supports how='inner' only, got {how!r}: the residual "
            "band filter and the bucket explode break outer-join semantics"
        )
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds must be >= lower_seconds")
    width = max(upper_seconds - lower_seconds, 1)

    l_ts = epoch_us(left_ts)
    r_ts = epoch_us(right_ts)
    width_us = width * 1_000_000
    lower_us = lower_seconds * 1_000_000
    upper_us = upper_seconds * 1_000_000

    # derivation: with x = l_ts + lo, the band is x <= r_ts <= x + W,
    # i.e. x in [r_ts - W, r_ts] — an interval of length exactly W, which
    # the width-W bucket grid covers with at most the two buckets
    # floor(r_ts/W) and floor(r_ts/W)-1. So: left keys by floor(x/W),
    # right explodes to those two buckets.
    l_b = left.withColumn("_bucket", F.floor((l_ts + lower_us) / F.lit(width_us)))
    r_bucket = F.floor(r_ts / F.lit(width_us))
    r_b = right.withColumn("_bucket", F.explode(F.array(r_bucket, r_bucket - 1)))
    keys = ["_bucket"] + list(extra_keys or [])
    # qualified refs so the residual resolves even when both ts columns
    # share a name
    delta: Column = epoch_us(r_b[right_ts]) - epoch_us(l_b[left_ts])
    residual: Column = (delta >= lower_us) & (delta <= upper_us)
    return l_b.join(r_b, keys, how).filter(residual).drop("_bucket")


def interval_lookup(
    facts: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Point-in-interval dimension lookup (ip-geo / tier-table shape):
    each fact row picks up the dim row whose half-open ``[lo, hi)``
    interval contains its value; facts in no interval keep NULL dim
    columns (LEFT semantics). Intervals must be non-overlapping (the
    static-config contract of tier tables; overlap would make the
    lookup ambiguous).

    The naive predicate join (``f.v >= d.lo AND f.v < d.hi``) is a
    BroadcastNestedLoopJoin — O(|facts| x |dim|) predicate evaluations
    through the join machinery. This shape instead ranks each value
    into its candidate interval ROW-LOCALLY against a 1-row broadcast
    of the sorted lo-boundaries (codegen'd array scan, no join until
    the interval id is known), then resolves dim attributes with a
    plain broadcast HASH equi-join on ``lo`` and keeps the ``hi`` bound
    as a row-local residual. No driver read: the boundary array is
    built with one dim-sized aggregation and crossed in as a 1-row
    broadcast, the same class as the q11/q22 global scalars.
    """
    bounds = dim.agg(F.sort_array(F.collect_list(F.col(lo_col))).alias("_bnds"))
    v = F.col(value_col)
    with_idx = (
        facts.join(F.broadcast(bounds))
        .withColumn("_idx", F.size(F.filter(F.col("_bnds"), lambda b: b <= v)))
        .withColumn(
            "_lo_key",
            F.when(F.col("_idx") >= 1, F.element_at("_bnds", F.col("_idx"))),
        )
        .drop("_bnds")
    )
    dimr = dim.withColumnRenamed(lo_col, "_lo_key")
    joined = with_idx.join(F.broadcast(dimr), "_lo_key", "left")
    dim_cols = [c for c in dim.columns if c != lo_col]
    keep_dim = [
        F.when(v < F.col(hi_col), F.col(c)).alias(c) for c in dim_cols
    ]
    return joined.select(
        *[F.col(c) for c in facts.columns],
        F.when(v < F.col(hi_col), F.col("_lo_key")).alias(lo_col),
        *keep_dim,
    )
