"""As-of join and sessionization — time-series operators Spark lacks
natively (SURVEY.md §2F joins row; a gomrjob user would have written these
as a Reducer over a key-sorted union stream — which is precisely the
execution shape used here, minus the hand-rolled shuffle).

Scale strategy: both operators are ONE shuffle on the partition key with a
single window pass — no self-join, no pandas. The union-stream as-of join
is the classic scalable formulation: rows from both sides interleave in
(key, ts) order and a running ``last(ignoreNulls)`` carries the most
recent right-side values forward onto left rows. Skewed keys are bounded
by AQE; at 100 TB add a coarse time-bucket to the partition key if a
single key's history exceeds one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _minutes_interval(minutes: float):
    """Day-time interval of ``minutes``, exact to the microsecond.

    ``F.expr(f"INTERVAL {int(m)} MINUTE")`` silently truncated
    fractional tolerances (0.5 -> 0); make_dt_interval takes fractional
    seconds at microsecond precision, so float callers get the interval
    they asked for. Works for TIMESTAMP and TIMESTAMP_NTZ arithmetic
    alike (both subtract to day-time intervals)."""
    return F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), F.lit(round(float(minutes) * 60, 6)))



def _tagged_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None,
):
    """The union stream both as-of variants scan: left and right rows
    interleaved with (_k, _ts, _side, _tb) sort keys and the right-side
    carried values in one struct ``_r`` (non-null for every right row,
    so NULL value fields surface as NULL instead of leaking older
    values). Returns (unioned, left_cols, carried_struct_type)."""
    from pyspark.sql.types import StructField, StructType

    if "_mts" in value_cols:
        # the matched timestamp rides in the carried struct under this
        # reserved name (same hazard class as the _k/_ts/_side scratch cols)
        raise ValueError("'_mts' is reserved in value_cols (carries the matched timestamp)")
    lcols = [c for c in left.columns]
    r_struct_type = StructType(
        [StructField(c, right.schema[c].dataType) for c in value_cols]
        + [StructField("_mts", right.schema[right_ts].dataType)]
    )
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")).alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(
            *[F.col(c) for c in value_cols], F.col(right_ts).alias("_mts")
        ).alias("_r"),
    )
    return l_tagged.unionByName(r_tagged), lcols, r_struct_type


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    direction: str = "backward",
    tolerance_minutes: float | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    ``on`` key: greatest ``right_ts <= left_ts`` for backward (the
    default — DuckDB ``ASOF JOIN ... >=`` semantics), smallest
    ``right_ts >= left_ts`` for forward (DuckDB ``<=``). Both inclusive;
    unmatched left rows keep nulls (LEFT join semantics).

    ``value_cols`` are the right-side columns to carry. ``tiebreak``
    (right-side column) makes the choice among equal-``right_ts`` rows
    deterministic. ``tolerance_minutes`` nulls out matches farther than
    the tolerance from the left timestamp (match SELECTION is unchanged
    — the nearest row is still the nearest; it is only disqualified),
    mirroring pandas ``merge_asof(tolerance=...)``.

    The carried values ride in ONE struct per right row and the running
    ``last(ignoreNulls)`` runs over the struct, not per column: the
    struct is non-null for every right row even when its value fields
    are NULL, so a matched row's NULL fields surface as NULL instead of
    leaking a stale value from an older right row. Forward is the same
    single window pass over the DESCENDING stream — still one shuffle,
    no self-join.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    unioned, lcols, _ = _tagged_union(
        left, right, on, left_ts, right_ts, value_cols, tiebreak
    )
    # right rows sort before left rows at equal ts (inclusive match);
    # among right rows at the same ts the tiebreak's last row wins.
    # Backward scans the stream in ascending ts order; forward scans
    # descending, so "last right seen" is the nearest FUTURE row.
    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    w = (
        W.partitionBy("_k")
        .orderBy(ts_order, F.col("_side"), F.col("_tb"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*", F.last("_r", ignorenulls=True).over(w).alias("_m")
    )
    m = F.col("_m")
    if tolerance_minutes is not None:
        # timestamp subtraction yields a day-time interval for both
        # TIMESTAMP and TIMESTAMP_NTZ inputs (unix_micros rejects NTZ,
        # and an NTZ->TIMESTAMP cast is session-timezone/DST-dependent)
        gap = (
            F.col("_ts") - m.getField("_mts")
            if direction == "backward"
            else m.getField("_mts") - F.col("_ts")
        )
        m = F.when(gap <= _minutes_interval(tolerance_minutes), F.col("_m"))
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[m.getField(c).alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
    tolerance_minutes: float | None = None,
) -> DataFrame:
    """Nearest-in-time as-of join (pandas ``merge_asof
    direction='nearest'``): for each left row, the right row of the
    same key minimizing ``|right_ts - left_ts|``; equal gaps resolve to
    the BACKWARD (past) match, equal timestamps within a side to the
    highest ``tiebreak``. With ``tolerance_minutes``, each side's
    candidate is disqualified independently before the pick (so a
    too-far past match never shadows an in-tolerance future one).
    Unmatched left rows keep nulls.

    Plan: the SAME union stream as :func:`asof_join`, windowed twice
    over ONE hash exchange (both windows partition by the key; only
    the sort direction differs): the ascending running
    ``last(ignoreNulls)`` carries the nearest past right row, the
    descending one the nearest future row, and the pick is a row-local
    interval comparison. Still one shuffle, no self-join — the naive
    formulation (join all pairs in key, rank by gap) shuffles
    |left| x |right-per-key| rows and is what the DuckDB oracle runs."""
    unioned, lcols, r_struct_type = _tagged_union(
        left, right, on, left_ts, right_ts, value_cols, tiebreak
    )
    base = W.partitionBy("_k").rowsBetween(W.unboundedPreceding, 0)
    w_b = base.orderBy(F.col("_ts"), F.col("_side"), F.col("_tb"))
    w_f = base.orderBy(F.col("_ts").desc(), F.col("_side"), F.col("_tb"))
    carried = unioned.select(
        "*",
        F.last("_r", ignorenulls=True).over(w_b).alias("_mb"),
        F.last("_r", ignorenulls=True).over(w_f).alias("_mf"),
    )
    mb = F.col("_mb")
    mf = F.col("_mf")
    gb = F.col("_ts") - mb.getField("_mts")
    gf = mf.getField("_mts") - F.col("_ts")
    if tolerance_minutes is not None:
        tol = _minutes_interval(tolerance_minutes)
        mb = F.when(gb <= tol, mb)  # null when no match or out of tolerance
        mf = F.when(gf <= tol, mf)
        gb = F.col("_ts") - mb.getField("_mts")
        gf = mf.getField("_mts") - F.col("_ts")
    m = (
        F.when(mb.isNull() & mf.isNull(), F.lit(None).cast(r_struct_type))
        .when(mb.isNull(), mf)
        .when(mf.isNull(), mb)
        .when(gb <= gf, mb)
        .otherwise(mf)
    )
    return carried.filter(F.col("_side") == 1).select(
        *[F.col(c) for c in lcols],
        *[m.getField(c).alias(f"asof_{c}") for c in value_cols],
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float = 30,
) -> DataFrame:
    """Assign gap-based session ids: a new session starts when the time
    since the previous event of the same key is >= gap (matching
    ``session_window``'s half-open [start, last+gap) semantics).

    Returns (key, session_id, session_start, session_end, n_events) where
    session_end = last event + gap. One shuffle on key, two window passes
    (lag + running sum), then the session aggregate.
    """
    w = W.partitionBy(key).orderBy(ts)
    # interval arithmetic works for both TIMESTAMP and TIMESTAMP_NTZ
    # (unix_micros rejects NTZ, and an NTZ->TIMESTAMP cast would be
    # session-timezone/DST-dependent)
    gap = _minutes_interval(gap_minutes)
    marked = df.select(
        F.col(key),
        F.col(ts).alias("_ts"),
        F.when(
            F.lag(ts).over(w).isNull()
            | ((F.col(ts) - F.lag(ts).over(w)) >= gap),
            1,
        )
        .otherwise(0)
        .alias("_new"),
    )
    w2 = W.partitionBy(key).orderBy("_ts").rowsBetween(W.unboundedPreceding, 0)
    with_sid = marked.withColumn("session_id", F.sum("_new").over(w2))
    return (
        with_sid.groupBy(key, "session_id")
        .agg(
            F.min("_ts").alias("session_start"),
            (F.max("_ts") + gap).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def scd2_build(
    log: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 build from a change log: collapse
    a per-key event stream into versioned validity intervals — one row
    per (key, attr-run) with ``valid_from`` / ``valid_to`` (NULL = still
    current) and a 1-based ``version``. Consecutive repeats of the same
    attribute value merge into one interval; ``tiebreak`` orders same-
    instant updates deterministically (each surviving change opens a
    version, so same-instant flips yield zero-duration versions rather
    than nondeterministic drops).

    Plan: one hash exchange on ``key`` feeds every window (lag for the
    change flag, lead + row_number on the filtered change rows) — the
    sort rides the single exchange, nothing re-shuffles. This is the
    streaming-CDC companion shape: `streaming_upsert_apply` maintains
    the CURRENT row per key live; this builds the full HISTORY table in
    batch.
    """
    w = W.partitionBy(key).orderBy(ts, tiebreak)
    changed = (
        log.select(key, attr, ts, tiebreak)
        .withColumn("_prev", F.lag(attr).over(w))
        .filter(
            F.col("_prev").isNull()
            | ~F.col(attr).eqNullSafe(F.col("_prev"))
        )
    )
    w2 = W.partitionBy(key).orderBy(ts, tiebreak)
    return changed.select(
        F.col(key),
        F.col(attr).alias("state"),
        F.col(ts).alias("valid_from"),
        F.lead(ts).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"),
    )
