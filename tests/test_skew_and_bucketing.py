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


def test_minhash_verify_join_90pct_duplicate_fixture(spark):
    """VERDICT r3 #7: a boilerplate document duplicated by most of the
    corpus makes id_a/id_b hot keys in the Jaccard verify join (every
    pair in the dup cluster carries the same ids). Differential gate on
    the pathological fixture: the propose/verify output must equal the
    exact-Jaccard pair set (duplicate docs have identical signatures, so
    LSH recall is total here) and be invariant to input partitioning —
    executed under the session's AQE skew-join handling, which is the
    production mitigation (candidate stream and shingle frame both
    shuffle on the hot id; AQE splits the oversized partitions)."""
    from gomrjob_spark.cache import release_scoped
    from gomrjob_spark.operators.dedup import jaccard_pairs, minhash_dedup_pairs

    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    # 360 of 400 docs are copies of 3 boilerplate variants (hot cluster);
    # 40 unique tails. Variants share all but one trailing token.
    base = "terms of service boilerplate text repeated across the corpus body"
    rows = []
    for i in range(400):
        if i < 360:
            rows.append((i, f"{base} variant {i % 3}"))
        else:
            rows.append((i, f"unique document number {i} with its own words {i * 7} {i * 13}"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    exact = {
        (r.id_a, r.id_b)
        for r in jaccard_pairs(docs, threshold=0.6, max_shingle_freq=None).collect()
    }
    release_scoped()
    got = {}
    for parts in (1, 16):
        pairs = minhash_dedup_pairs(docs.repartition(parts), threshold=0.6)
        got[parts] = {(r.id_a, r.id_b) for r in pairs.collect()}
        release_scoped()
    assert got[1] == got[16], "partitioning changed the verified pair set"
    assert got[1] == exact, "propose/verify lost pairs on the duplicate-heavy fixture"
    assert len(exact) > 20_000  # the hot cluster really is quadratic
