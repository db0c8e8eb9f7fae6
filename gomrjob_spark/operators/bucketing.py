"""Bucketed tables: shuffle-free co-located joins for repeated big-big
joins.

At 100 TB the dominant recurring cost is re-shuffling the same fact
tables on the same keys for every join. Hive-style bucketing pays that
shuffle ONCE at write time: both tables hash-partitioned into the same
number of buckets on the join key, so a later join reads matching buckets
pairwise — the plan shows SortMergeJoin with NO Exchange on either side.

This is the engine's analog of the reference's static 30-reducer
partitioning (runner.go:100) done right: the partitioning is persisted
with the data and reused across jobs instead of re-created per job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 32,
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    Sorting within buckets additionally removes the Sort from later
    sort-merge joins on the bucket key."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst
    recognizes the matching output partitioning and elides both
    exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
