"""Testdata catalog: load the driver-generated parquet tables.

Reference analog: gomrjob inputs are glob patterns over multi-scheme paths
(/root/reference/runner.go:51-52, hdfs/job.go:27-56). Spark's DataSource API
natively handles ``hdfs://``/``s3a://``/``gs://``/``file://`` and globs, so
the whole path-resolution layer collapses to ``spark.read.parquet(path)``.

At 100 TB the same entry point applies: parquet scans get predicate pushdown,
column pruning, and partition pruning from Catalyst for free, which is why the
engine exposes *tables* (DataFrames) rather than line streams.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Columns written as parquet TIMESTAMP(NANOS) — Spark has no nanosecond
# timestamp type, so these are read as raw int64 (nanosAsLong) and truncated
# to microseconds. DuckDB's parquet reader truncates NANOS to its micro
# TIMESTAMP at scan, so this matches the oracle bit-for-bit.
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ns_cols = _NANOS_TS_COLS.get(name, ())
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    dtypes = dict(df.dtypes)
    for c in ns_cols:
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL surface)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
