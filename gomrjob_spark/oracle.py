"""Differential-testing harness: Spark result vs DuckDB oracle.

Engine analog of the reference's golden-output comparison
(/root/reference/mrtest/testing.go:111-123) — but differential against an
independent SQL engine instead of hand-maintained golden files, which is
strictly stronger (SURVEY.md §5).

Mirrors the driver's comparison: sort columns by name, sort rows, compare
values (exact for ints/strings/bools/timestamps, tolerant for floats).
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

from gomrjob_spark.catalog import TABLES, table_path


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL in DuckDB with every testdata table as a view."""
    con = duckdb.connect()
    try:
        for name in TABLES:
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
            )
        return con.sql(sql).df()
    finally:
        con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("boolean")
        elif df[c].dtype == object and df[c].map(
            lambda v: v is None or isinstance(v, (datetime.date, datetime.datetime))
        ).all():
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort", na_position="last").reset_index(
        drop=True
    )


def _values_equal(a: Any, b: Any) -> bool:
    """Strict equality, mirroring the driver's value-hash: floats must be
    bit-identical (the engine guarantees this via exact-decimal aggregation,
    see gomrjob_spark.functions)."""
    a_na, b_na = pd.isna(a), pd.isna(b)
    if a_na or b_na:
        return bool(a_na and b_na)
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
    return a == b


def compare(spark_df: DataFrame, oracle_df: pd.DataFrame, name: str = "query") -> None:
    """Raise AssertionError with a readable diff if results differ."""
    got = _canon(spark_df.toPandas())
    want = _canon(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch\n  spark:  {list(got.columns)}\n  oracle: {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} != oracle {len(want)}"
    for col in got.columns:
        gv, wv = got[col].tolist(), want[col].tolist()
        for i, (a, b) in enumerate(zip(gv, wv)):
            if not _values_equal(a, b):
                ctx_g = got.iloc[max(0, i - 1) : i + 2].to_string()
                ctx_w = want.iloc[max(0, i - 1) : i + 2].to_string()
                raise AssertionError(
                    f"{name}: value mismatch col={col!r} row={i}: spark={a!r} oracle={b!r}\n"
                    f"spark context:\n{ctx_g}\noracle context:\n{ctx_w}"
                )
