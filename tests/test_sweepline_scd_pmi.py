"""Unit tests: distributed prefix sum / interval concurrency (sweep
line), SCD type-2 build, and fixed-point PMI collocations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from gomrjob_spark.cache import release_scoped
from gomrjob_spark.operators.asof import scd2_build
from gomrjob_spark.operators.sweepline import interval_concurrency, prefix_sum
from gomrjob_spark.operators.text import pmi_collocations


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


def test_prefix_sum_matches_serial_cumsum(spark):
    # deterministic but shuffled insert order; unique order keys
    vals = [(i * 37) % 100 for i in range(100)]
    df = spark.createDataFrame(
        [Row(k=k, v=k % 7 - 3) for k in vals]
    )
    out = prefix_sum(df, ["k"], "v", out_col="run", num_partitions=8)
    got = {r["k"]: r["run"] for r in out.collect()}
    release_scoped()
    acc = 0
    for k in sorted(vals):
        acc += k % 7 - 3
        assert got[k] == acc, f"prefix mismatch at k={k}"


def test_prefix_sum_partition_invariance(spark):
    df = spark.createDataFrame([Row(k=i, v=1) for i in range(57)])
    a = sorted(
        prefix_sum(df, ["k"], "v", num_partitions=1).collect(),
        key=lambda r: r["k"],
    )
    release_scoped()
    b = sorted(
        prefix_sum(df, ["k"], "v", num_partitions=7).collect(),
        key=lambda r: r["k"],
    )
    release_scoped()
    assert [r["running"] for r in a] == [r["running"] for r in b]


def test_interval_concurrency_half_open(spark):
    # back-to-back [0,10) [10,20): never concurrent; [5,15) overlaps both
    iv = spark.createDataFrame(
        [
            Row(session_start=_ts(0), session_end=_ts(10)),
            Row(session_start=_ts(10), session_end=_ts(20)),
        ]
    )
    conc = interval_concurrency(iv)
    peak = conc.agg(F.max("concurrent")).collect()[0][0]
    release_scoped()
    assert peak == 1, "half-open back-to-back intervals must not overlap"

    iv2 = iv.unionByName(
        spark.createDataFrame(
            [Row(session_start=_ts(5), session_end=_ts(15))]
        )
    )
    conc2 = interval_concurrency(iv2)
    peak2 = conc2.agg(F.max("concurrent")).collect()[0][0]
    # every running value must stay non-negative (ends never precede starts)
    neg = conc2.filter(F.col("concurrent") < 0).count()
    release_scoped()
    assert peak2 == 2
    assert neg == 0


def test_scd2_collapses_runs_and_versions(spark):
    log = spark.createDataFrame(
        [
            Row(uid=1, state="A", ts=_ts(1), eid=1),
            Row(uid=1, state="A", ts=_ts(2), eid=2),  # repeat: collapsed
            Row(uid=1, state="B", ts=_ts(3), eid=3),
            Row(uid=1, state="A", ts=_ts(5), eid=4),
            Row(uid=2, state="X", ts=_ts(1), eid=5),
        ]
    )
    out = scd2_build(log, key="uid", attr="state", ts="ts", tiebreak="eid")
    rows = {(r["uid"], r["version"]): r for r in out.collect()}
    assert len(rows) == 4
    assert rows[(1, 1)]["state"] == "A"
    assert rows[(1, 1)]["valid_from"] == _ts(1)
    assert rows[(1, 1)]["valid_to"] == _ts(3)  # repeat at ts=2 merged
    assert rows[(1, 2)]["state"] == "B"
    assert rows[(1, 3)]["state"] == "A"
    assert rows[(1, 3)]["valid_to"] is None  # still current
    assert rows[(2, 1)]["valid_to"] is None


def test_scd2_same_instant_flip_is_deterministic(spark):
    log = spark.createDataFrame(
        [
            Row(uid=1, state="A", ts=_ts(1), eid=2),
            Row(uid=1, state="B", ts=_ts(1), eid=1),  # earlier tiebreak
        ]
    )
    out = scd2_build(log, key="uid", attr="state", ts="ts", tiebreak="eid")
    rows = sorted(out.collect(), key=lambda r: r["version"])
    # eid order: B first, then A — B's interval is zero-duration
    assert [r["state"] for r in rows] == ["B", "A"]
    assert rows[0]["valid_from"] == rows[0]["valid_to"] == _ts(1)
    assert rows[1]["valid_to"] is None


def test_pmi_collocations_exact_counts(spark):
    # corpus: "x y" appears 6 times, tokens x,y also appear alone
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="x y") for i in range(6)]
        + [Row(doc_id=10, text="x z x z x z x z x z"), Row(doc_id=11, text="y y y y")]
    )
    out = pmi_collocations(docs, min_count=5, k=10).collect()
    got = {(r["w1"], r["w2"]): r for r in out}
    # counts: c(x)=11, c(y)=10, c(z)=5, N=26; pairs >=5: (x,y)=6? no —
    # "x y" docs give 6 adjacent (x,y); "x z..." gives 5 (x,z) + 4 (z,x);
    # "y y y y" gives 3 (y,y). Only (x,y) and (x,z) meet min_count=5.
    assert set(got) == {("x", "y"), ("x", "z")}
    xy = got[("x", "y")]
    assert xy["n_pair"] == 6
    assert xy["lift_fp"] == ((6 * 100000) // 11) * 26 // 10
    xz = got[("x", "z")]
    assert xz["n_pair"] == 5
    assert xz["lift_fp"] == ((5 * 100000) // 11) * 26 // 5


def test_profile_columns_exact_and_typed(spark):
    from gomrjob_spark.operators.profile import profile_columns

    df = spark.createDataFrame(
        [Row(a="x", b=1, c=0.5), Row(a=None, b=1, c=0.5), Row(a="y", b=None, c=0.5)]
    )
    got = {r["column"]: r for r in profile_columns(df, ["a", "b"]).collect()}
    assert got["a"]["n_rows"] == 3
    assert got["a"]["n_nulls"] == 1
    assert got["a"]["n_distinct"] == 2
    assert (got["a"]["min_value"], got["a"]["max_value"]) == ("x", "y")
    assert got["b"]["n_nulls"] == 1
    assert got["b"]["n_distinct"] == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="float string-rendering"):
        profile_columns(df, ["c"])
    with _pytest.raises(ValueError, match="no such column"):
        profile_columns(df, ["zz"])


def test_weighted_priority_sample_deterministic_and_biased(spark):
    from gomrjob_spark.operators.sampling import weighted_priority_sample

    df = spark.createDataFrame(
        [(i, 1 if i < 500 else 1000) for i in range(600)], "id int, w int"
    )
    a = [r["id"] for r in weighted_priority_sample(df, "id", "w", k=50).collect()]
    b = [r["id"] for r in weighted_priority_sample(df, "id", "w", k=50).collect()]
    assert a == b, "sample must be rerun-deterministic"
    # 100 heavy rows (w=1000) vs 500 light (w=1): heavy dominate the top
    heavy = sum(1 for i in a if i >= 500)
    assert heavy >= 45, f"weight bias too weak: {heavy}/50 heavy"
    # zero/negative weights excluded
    df2 = spark.createDataFrame([(1, 0), (2, -5), (3, 10)], "id int, w int")
    got = [r["id"] for r in weighted_priority_sample(df2, "id", "w", k=10).collect()]
    assert got == [3]


def test_zscore_outlier_counts_exact(spark):
    from gomrjob_spark.operators.sampling import zscore_outlier_counts

    # group g: 99 values of 100 plus one of 10000 -> the spike is the
    # only point beyond 3 sigma
    rows = [("g", 100)] * 99 + [("g", 10000)]
    df = spark.createDataFrame(rows, "grp string, cents long")
    got = zscore_outlier_counts(df, "grp", "cents").collect()[0]
    assert (got["n"], got["n_outliers"]) == (100, 1)
    # uniform group: no outliers (variance 0, strict inequality)
    df2 = spark.createDataFrame([("u", 7)] * 20, "grp string, cents long")
    got2 = zscore_outlier_counts(df2, "grp", "cents").collect()[0]
    assert (got2["n"], got2["n_outliers"]) == (20, 0)


def test_global_row_number_matches_serial(spark):
    from gomrjob_spark.operators.sweepline import global_row_number

    vals = [(i * 53) % 200 for i in range(200)]
    df = spark.createDataFrame([Row(k=v, uid=i) for i, v in enumerate(vals)])
    for parts in (1, 7):
        out = global_row_number(df, ["k", "uid"], num_partitions=parts).collect()
        release_scoped()
        got = [ (r["k"], r["uid"]) for r in sorted(out, key=lambda r: r["rn"]) ]
        want = sorted(zip(vals, range(200)))
        assert got == want, f"ranking mismatch at {parts} partitions"
        assert sorted(r["rn"] for r in out) == list(range(1, 201))
