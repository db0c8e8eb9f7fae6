"""Protocol/serde unit tests mirroring /root/reference/mrproto/protocol_test.go."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gomrjob_spark.protocols import (
    canonical_json_dumps,
    canonicalize_json,
    count_malformed_kv,
    format_kv_lines,
    json_encode,
    parse_kv_lines,
    read_json_lines,
)
from gomrjob_spark.testing import lines_df


def test_json_input_skips_bad_records(spark, tmp_path):
    """TestJsonInputProtocol parity (protocol_test.go:11-25): invalid JSON
    line skipped + counted, valid records preserved in order."""
    p = tmp_path / "in.json"
    p.write_text('{"_HEARTBEAT_":1359516282.66455, "row": 0}\nnot-json-data\n{"row":1}\n')
    good, bad = read_json_lines(spark, str(p))
    rows = good.select("row").orderBy("row").collect()
    assert [r.row for r in rows] == [0, 1]
    assert bad.collect()[0].bad_records == 1


def test_json_output_canonical():
    """TestJsonInternalOutputProtocol parity (protocol_test.go:27-42):
    scalar and array keys serialize like Go json.Marshal."""
    assert canonical_json_dumps("a") == '"a"'
    assert canonical_json_dumps(["b", "c"]) == '["b","c"]'
    assert canonical_json_dumps({"b": 1, "a": 2}) == '{"a":2,"b":1}'


def test_json_encode_jvm(spark):
    df = spark.createDataFrame([("a",), (None,)], "v string").select(
        json_encode("v").alias("j")
    )
    assert [r.j for r in df.collect()] == ['"a"', "null"]
    df2 = spark.createDataFrame([([1, 2],)], "v array<int>").select(json_encode("v").alias("j"))
    assert df2.collect()[0].j == "[1,2]"


def test_canonicalize_json_udf(spark):
    df = spark.createDataFrame(
        [('{"b": 1, "a": 2}',), ("not-json",), (None,)], "v string"
    ).select(canonicalize_json("v").alias("c"))
    got = [r.c for r in df.collect()]
    assert got == ['{"a":2,"b":1}', None, None]


def test_kv_grouping_edge_cases(spark):
    """TestRawInternalChanInputProtocol parity (protocol_test.go:44-76):
    (input, expected_keys, expected_values) incl. the empty-string key."""
    cases = [
        ("\tkey\n\tkey\n", 1, 2),
        ("a\tkey\na\tkey\n", 1, 2),
        ("a\tkey\nb\tkey\nc\tkey\n", 3, 3),
    ]
    for text, want_keys, want_values in cases:
        kv = parse_kv_lines(
            spark.createDataFrame([(ln,) for ln in text.split("\n") if ln], "value string")
        )
        grouped = kv.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
        assert len(grouped) == want_keys, text
        assert sum(r.n for r in grouped) == want_values, text


def test_malformed_kv_skipped_and_counted(spark):
    """No-tab lines are dropped + countable (protocol.go:95-100)."""
    df = spark.createDataFrame(
        [("a\t1",), ("malformed-no-tab",), ("b\t2",)], "value string"
    )
    kv = parse_kv_lines(df)
    assert kv.count() == 2
    assert count_malformed_kv(df).collect()[0].malformed_lines == 1


def test_format_kv_skips_nulls(spark):
    """Encode-error skip parity (protocol.go:233-244)."""
    df = spark.createDataFrame(
        [("a", "1"), (None, "2"), ("c", None)], "key string, value string"
    )
    out = format_kv_lines(df).collect()
    assert [r.value for r in out] == ["a\t1"]
