"""asof_join edge semantics: NULL fields of the matched right row must
surface as NULL — not be papered over with stale values from older right
rows (ADVICE r1: per-column last(ignoreNulls) leaked stale values; the
fix carries the whole row as one struct)."""

from __future__ import annotations

import datetime as dt

from gomrjob_spark.operators.asof import asof_join

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds: int) -> dt.datetime:
    return EPOCH + dt.timedelta(seconds=seconds)


def test_asof_null_in_matched_row_is_preserved(spark):
    left = spark.createDataFrame([("k", _ts(100))], "k string, lts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(10), 1.0, "old"), ("k", _ts(50), None, "new")],
        "k string, rts timestamp, price double, tag string",
    )
    out = asof_join(left, right, "k", "lts", "rts", ["price", "tag"]).collect()
    assert len(out) == 1
    # the ts=50 row is the as-of match; its NULL price must NOT fall back
    # to the ts=10 row's 1.0
    assert out[0].asof_price is None
    assert out[0].asof_tag == "new"


def test_asof_unmatched_left_keeps_nulls(spark):
    left = spark.createDataFrame([("k", _ts(5))], "k string, lts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(50), 2.0)], "k string, rts timestamp, price double"
    )
    out = asof_join(left, right, "k", "lts", "rts", ["price"]).collect()
    assert len(out) == 1
    assert out[0].asof_price is None


def test_asof_inclusive_and_tiebreak(spark):
    left = spark.createDataFrame([("k", _ts(50))], "k string, lts timestamp")
    right = spark.createDataFrame(
        [("k", _ts(50), 1.0, 1), ("k", _ts(50), 2.0, 2)],
        "k string, rts timestamp, price double, seq int",
    )
    out = asof_join(
        left, right, "k", "lts", "rts", ["price"], tiebreak="seq"
    ).collect()
    # equal-ts rows match (inclusive); highest tiebreak wins
    assert out[0].asof_price == 2.0
