"""Serde / protocol layer — engine analog of mrproto/protocol.go.

The reference's data protocol is line-oriented ``key \\t value`` text with
JSON or raw-bytes encodings, grouped by run-length key detection over a
sorted stream (SURVEY.md §1-2B). In the engine, data lives in DataFrames;
this module provides the *boundary* codecs:

- reading schema-less JSON-lines with bad-record skip + count
  (JsonInputProtocol, protocol.go:17-42),
- splitting/forming internal ``k\\tv`` lines (protocol.go:94-216),
- canonical JSON encoding matching Go's ``json.Marshal`` (sorted object
  keys) so golden outputs are byte-comparable (SURVEY.md §1.3).

Key-equality parity: the reference groups by *byte equality of the
serialized key* — ``1`` and ``1.0`` are different keys. The engine keeps
grouping keys as their canonical serialized strings wherever byte parity
matters, and as native columns otherwise.

Scale note: the canonical-JSON codec is an Arrow-batched pandas UDF (the
only Python hop); everything else (split/concat/cast) is JVM-side and
codegen'd, so a 100 TB text-protocol job stays on the fast path except for
the one canonicalization column.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def canonical_json_dumps(obj) -> str:
    """Match Go json.Marshal for the JSON types the reference round-trips:
    object keys sorted, no whitespace (protocol.go:233-248; Go sorts map
    keys, SURVEY.md §1.3)."""
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


@F.pandas_udf(T.StringType())
def canonicalize_json(col: pd.Series) -> pd.Series:
    """Re-serialize a JSON string column canonically; invalid JSON -> null."""

    def _c(s):
        if s is None:
            return None
        try:
            return canonical_json_dumps(json.loads(s))
        except (ValueError, TypeError):
            return None

    return col.map(_c)


def json_encode(col: Column | str) -> Column:
    """JSON-encode any native column (scalar/array/struct/map) JVM-side.

    Trick: ``to_json(array(c))`` emits ``[<json of c>]``; stripping the
    brackets yields the bare JSON value — no Python hop. Struct fields are
    emitted in schema order: build structs with sorted field names (or use
    :func:`canonicalize_json`) when byte parity with Go's sorted-key
    ``json.Marshal`` is required (SURVEY.md §1.3).
    """
    c = F.col(col) if isinstance(col, str) else col
    arr = F.to_json(F.array(c))
    return arr.substr(F.lit(2), F.length(arr) - F.lit(2))


# -- JSON-lines source (JsonInputProtocol analog) ---------------------------


def read_json_lines(
    spark: SparkSession,
    path_or_df: str | DataFrame,
    schema: T.StructType | str | None = None,
    corrupt_col: str = "_corrupt_record",
):
    """Read JSON-lines permissively; returns (good_df, bad_count_df).

    Reference parity: invalid lines are skipped and counted, never fatal
    (protocol.go:32-35 + counter at reporter.go). ``bad_count_df`` is a
    1-row DataFrame with the skip count — an ``observe``-style exact
    metric rather than a retry-inflatable accumulator.
    """
    if isinstance(path_or_df, str):
        reader = spark.read.option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", corrupt_col
        )
        if schema is not None:
            df = reader.schema(schema).json(path_or_df)
        else:
            df = reader.json(path_or_df)
    else:
        df = path_or_df
    if corrupt_col in df.columns:
        # Spark requires caching the parsed frame before referencing the
        # corrupt-record column from a filter; scoped so a long-lived
        # session can release it (gomrjob_spark.cache.release_scoped)
        from gomrjob_spark.cache import scoped_persist

        df = scoped_persist(df)
        bad = df.filter(F.col(corrupt_col).isNotNull()).agg(
            F.count(F.lit(1)).alias("bad_records")
        )
        good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
        return good, bad
    return df, df.limit(0).agg(F.count(F.lit(1)).alias("bad_records"))


# -- internal k\tv line protocol (Raw/JsonInternal*Protocol analogs) ---------


def parse_kv_lines(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """``k\\tv`` lines -> DataFrame[key string, value string].

    Malformed lines (no tab) are dropped, matching the reference's
    skip-with-counter (protocol.go:95-100); count them separately with
    :func:`count_malformed_kv` when the metric matters. JVM-only: one
    ``split`` per row, no Python.
    """
    parts = F.split(F.col(line_col), "\t", 2)
    return (
        lines.select(parts.alias("_p"))
        .filter(F.size("_p") == 2)
        .select(F.col("_p")[0].alias("key"), F.col("_p")[1].alias("value"))
    )


def count_malformed_kv(lines: DataFrame, line_col: str = "value") -> DataFrame:
    """1-row DataFrame counting lines without a tab separator."""
    return lines.agg(
        F.count(F.when(~F.col(line_col).contains("\t"), 1)).alias("malformed_lines")
    )


def format_kv_lines(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """DataFrame[key, value] -> one-column DataFrame of ``k\\tv`` lines
    (JsonInternalOutputProtocol analog, protocol.go:224-254). Encode-error
    rows (null key/value after upstream canonicalization) are skipped,
    matching protocol.go:233-244."""
    return (
        df.filter(F.col(key_col).isNotNull() & F.col(value_col).isNotNull())
        .select(
            F.concat_ws("\t", F.col(key_col).cast("string"), F.col(value_col).cast("string")).alias(
                "value"
            )
        )
    )
