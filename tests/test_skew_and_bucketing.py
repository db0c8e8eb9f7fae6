"""Skew-control and bucketing tests: salted operators must be
result-identical to their plain forms (on skewed data), and bucketed
joins must actually elide the exchanges."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from gomrjob_spark.operators.bucketing import bucketed_join, write_bucketed
from gomrjob_spark.operators.skew import salted_agg, salted_join


def _skewed_df(spark):
    # 10k rows where key 0 holds 90% of the data — the shape AQE's
    # partition splitting can't always fix (one key, one hash target)
    return spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 2).alias("v"),
    )


def test_salted_join_matches_plain(spark):
    big = _skewed_df(spark)
    small = spark.createDataFrame([(i, f"dim{i}") for i in range(100)], "k int, label string")
    plain = big.join(small, "k").groupBy("label").agg(F.sum("v").alias("s"))
    salted = salted_join(big, small, "k", salt=8).groupBy("label").agg(F.sum("v").alias("s"))
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "a"), (2, "b"), (99, "z")], "k int, payload string")
    small = spark.createDataFrame([(1, "one"), (2, "two")], "k int, label string")
    out = salted_join(big, small, "k", salt=4, how="left").orderBy("k")
    rows = [(r.k, r.label) for r in out.collect()]
    assert rows == [(1, "one"), (2, "two"), (99, None)]


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"), F.max("v").alias("mx")
    )
    salted = salted_agg(
        df,
        ["k"],
        {
            "s": (F.sum("v"), "sum"),
            "n": (F.count(F.lit(1)), "sum"),
            "mx": (F.max("v"), "max"),
        },
        salt=8,
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_bucketed_join_elides_exchange(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS bkt_orders")
    spark.sql("DROP TABLE IF EXISTS bkt_items")
    orders = spark.range(1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_flag")
    )
    items = spark.range(5000).select(
        (F.col("id") % 1000).alias("o_key"), F.col("id").alias("item_id")
    )
    write_bucketed(orders, "bkt_orders", ["o_key"], num_buckets=8,
                   path=str(tmp_path / "orders"))
    write_bucketed(items, "bkt_items", ["o_key"], num_buckets=8,
                   path=str(tmp_path / "items"))

    # force the non-broadcast path: bucketing matters precisely when both
    # sides are too big to broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bkt_orders", "bkt_items", ["o_key"])
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 5000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_rejects_right_and_full(spark):
    """right/full would emit salt-many duplicate null-extended rows for
    unmatched small-side rows (ADVICE r1) — rejected, not wrong."""
    big = spark.createDataFrame([(1, "a")], "k int, payload string")
    small = spark.createDataFrame([(1, "one")], "k int, label string")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", salt=4, how=how)
