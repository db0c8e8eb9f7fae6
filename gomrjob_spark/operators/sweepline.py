"""Sweep-line operators: distributed prefix sum and interval concurrency.

The query "how many intervals cover instant t" is an interval join at
heart — naively a range join (quadratic candidate space, or a band join
with a width guess). The sweep-line formulation replaces it with a
GLOBAL RUNNING SUM over +1/-1 boundary events: linear work, one range
exchange, no join at all.

The catch at scale is the running sum itself: ``Window.orderBy(ts)``
with no partition key collapses the whole stream into ONE task (Spark
warns exactly this). :func:`prefix_sum` is the distributed form — the
classic two-phase scan:

1. range-partition by the order key (RangePartitioner keeps equal keys
   in one partition and assigns partition ids in key order);
2. per-partition local cumulative sum (parallel window, partitioned by
   ``spark_partition_id()``);
3. per-partition totals (ONE row per partition — bounded) are
   prefix-summed on a single task and broadcast back as offsets.

Every stage is whole-stage-codegen column work; the only single-task
step touches ``#partitions`` rows, not data.

Determinism contract: the per-row running values form a deterministic
multiset when the order key is unique OR ``value_col`` is constant
within order-key ties (any permutation of equal deltas yields the same
partial-sum multiset) — which is what downstream order-insensitive
aggregates (max/min/grouped extrema) need to be exact, and what the
DuckDB oracle's single-threaded window reproduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gomrjob_spark.cache import scoped_persist


def prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running sum of ``value_col`` in ``order_cols`` order,
    computed with bounded per-task state (no single-task global window).

    The range-partitioned frame is scoped-persisted: the local-cumsum
    branch and the totals branch both read it, and RangePartitioner's
    boundary sampling must not be resampled between them.
    """
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = scoped_persist(
        df.repartitionByRange(n, *[F.col(c) for c in order_cols]).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = ranged.withColumn("_local", F.sum(value_col).over(w_local))
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_tot"))
    # one row per partition: the single-task window below is bounded by
    # the partition COUNT, the same class as the q11/q22 scalar reads.
    w_prior = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_tot").over(w_prior), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_local", "_off")
    )


def interval_concurrency(
    intervals: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
    ts_out: str = "ts",
) -> DataFrame:
    """Boundary stream with a running concurrency count: each interval
    contributes (+1 at start, -1 at end); ``concurrent`` after each
    boundary is the number of open intervals. Ends sort before starts at
    the same instant (delta ascending), so half-open [start, end)
    semantics hold and back-to-back intervals never double-count."""
    starts = intervals.select(
        F.col(start_col).alias(ts_out), F.lit(1).alias("delta")
    )
    ends = intervals.select(
        F.col(end_col).alias(ts_out), F.lit(-1).alias("delta")
    )
    return prefix_sum(
        starts.unionByName(ends),
        order_cols=[ts_out, "delta"],
        value_col="delta",
        out_col="concurrent",
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row_number in ``order_cols`` order WITHOUT the
    single-task global window (``Window.orderBy`` with no partition key
    collapses the stream into one task — the plan that dies first at
    100 TB). Same two-phase scan as :func:`prefix_sum`: range partition
    (ids ordered by range), per-partition local row_number, bounded
    per-partition counts prefix-summed and broadcast back as offsets.
    ``order_cols`` must be a total order (include a unique tiebreaker)
    for the result to be deterministic — this is row_number, not rank.

    This is how global ntile / percent_rank / CDF feature transforms
    run at scale: derive the quantile/decile label from ``rn`` and the
    total count (``offsets`` already materializes per-partition counts,
    so the total is a bounded aggregate, not an extra corpus scan)."""
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    ranged = scoped_persist(
        df.repartitionByRange(n, *[F.col(c) for c in order_cols]).withColumn(
            "_pid", F.spark_partition_id()
        )
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_lrn", F.row_number().over(w_local))
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    w_prior = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w_prior), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lrn") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )
