"""Bloom runtime-prefilter gates: exactness (no false negatives ever,
false positives removed by the exact join), real pruning power, and the
broadcast-shape plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gomrjob_spark.operators.bloomfilter import (
    bloom_build,
    bloom_might_contain,
    bloom_semi_join,
)


@pytest.fixture(scope="module")
def spark():
    from gomrjob_spark.session import get_session

    return get_session(app_name="bloom_tests")


def test_bloom_semi_join_equals_plain_semi_join(spark):
    """Exactness: for overlapping, disjoint, and duplicate-key inputs
    the bloom-prefiltered semi join returns exactly the plain semi
    join's rows."""
    fact = spark.range(0, 5000).select((F.col("id") % 700).alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 200).select((F.col("id") * 3).alias("k"))
    got = sorted((r.k, r.v) for r in bloom_semi_join(fact, dim, on="k").collect())
    want = sorted(
        (r.k, r.v) for r in fact.join(dim, "k", "left_semi").collect()
    )
    assert got == want and got, "bloom semi join diverged from exact"

    empty_dim = dim.filter(F.col("k") < 0)
    assert bloom_semi_join(fact, empty_dim, on="k").count() == 0


def test_bloom_prefilter_has_no_false_negatives_and_prunes(spark):
    """Every true member passes the membership test (structural: all k
    bits were set at build), and on a disjoint key range the filter
    prunes almost everything (fpp << 5% at 10 bits/key)."""
    num_bits = 1 << 14
    dim = spark.range(0, 1000).select(F.col("id").alias("k"))
    flt = bloom_build(dim, "k", num_bits=num_bits)
    members = (
        dim.crossJoin(F.broadcast(flt))
        .filter(bloom_might_contain(F.col("k"), F.col("arr"), num_bits))
        .count()
    )
    assert members == 1000, "false negative: a built key failed the test"

    outside = spark.range(1_000_000, 1_020_000).select(F.col("id").alias("k"))
    passed = (
        outside.crossJoin(F.broadcast(flt))
        .filter(bloom_might_contain(F.col("k"), F.col("arr"), num_bits))
        .count()
    )
    assert passed / 20_000 < 0.05, f"fpp too high: {passed / 20_000:.3f}"


def test_bloom_build_is_dense_and_bounded(spark):
    """The filter is ONE row holding num_bits/64 words — the broadcast
    contract (size independent of key count or key width)."""
    dim = spark.range(0, 500).select(F.concat(F.lit("user-"), F.col("id")).alias("k"))
    rows = bloom_build(dim, "k", num_bits=1 << 12).collect()
    assert len(rows) == 1
    assert len(rows[0]["arr"]) == (1 << 12) // 64
    assert not any(w is None for w in rows[0]["arr"])


def test_measured_fpp_tracks_the_formula(spark):
    """The measured false-positive rate on non-member probes sits near
    the textbook (1 - e^{-kn/m})^k prediction (r9 verdict item #4's
    bar: measured FPP vs the m/n/k formula). Deterministic probes
    (fixed key ranges, fixed seed), generous 2x band: the estimate is
    exact only for independent ideal hashes."""
    import math

    n, num_bits, k = 2000, 1 << 14, 3
    dim = spark.range(0, n).select(F.col("id").alias("key"))
    flt = bloom_build(dim, "key", num_bits=num_bits, num_hashes=k)
    probes = 50_000
    outside = spark.range(10_000_000, 10_000_000 + probes).select(
        F.col("id").alias("key")
    )
    hits = (
        outside.crossJoin(F.broadcast(flt))
        .filter(bloom_might_contain(F.col("key"), F.col("arr"), num_bits, num_hashes=k))
        .count()
    )
    measured = hits / probes
    predicted = (1.0 - math.exp(-k * n / num_bits)) ** k
    assert predicted / 2 < measured < predicted * 2, (
        f"measured fpp {measured:.4f} vs predicted {predicted:.4f}"
    )


def test_bloom_dedup_gate_stream_equals_exact_antijoin_truth(spark, sf_dir):
    """The 21st topology's verdicts are EXACTLY the plain containment
    rollup (bloom false positives removed by the exact join, no false
    negatives by construction) — the hash-gate claim, checked here
    against a batch recomputation without any bloom filter."""
    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators.text import chunk_text
    from gomrjob_spark.streaming import bloom_dedup_gate_stream
    from gomrjob_spark.streaming.ops import run_to_memory

    docs = load_table(spark, sf_dir, "documents")
    store = chunk_text(docs.filter(F.col("doc_id") < 250), size=256, overlap=0).select(
        F.md5(F.col("chunk")).alias("fp")
    )
    from gomrjob_spark.streaming import read_documents_stream

    stream = read_documents_stream(spark, sf_dir).filter(F.col("doc_id") >= 250)
    q, name = run_to_memory(bloom_dedup_gate_stream(stream, store), "complete")
    try:
        got = sorted(map(tuple, spark.table(name).collect()))
    finally:
        q.stop()
    chunks = chunk_text(docs.filter(F.col("doc_id") >= 250), size=256, overlap=0).select(
        "doc_id", F.md5(F.col("chunk")).alias("fp")
    )
    hit = chunks.join(
        store.select(F.col("fp").alias("_k")).distinct(),
        chunks["fp"] == F.col("_k"),
        "left_outer",
    )
    want = sorted(
        map(
            tuple,
            hit.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_par"),
                F.sum(F.when(F.col("_k").isNotNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_dup"),
            )
            .select(
                "doc_id",
                "n_par",
                "n_dup",
                F.expr("(1000000 * n_dup) DIV n_par").cast("bigint").alias("dup_ppm"),
                (F.expr("(1000000 * n_dup) DIV n_par") < 300000).alias("admitted"),
            )
            .collect(),
        )
    )
    assert got == want and got


def test_bloom_dedup_gate_plan_contains_the_probe(spark, sf_dir):
    """The bloom prefilter must actually be IN the topology's plan
    (shiftleft membership tests + the xxhash64 position streams) — a
    regression where the optimizer or a refactor drops the probe would
    silently degrade the gate to the plain store join."""
    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators.text import chunk_text
    from gomrjob_spark.streaming import (
        bloom_dedup_gate_stream,
        read_documents_stream,
    )

    docs = load_table(spark, sf_dir, "documents")
    store = chunk_text(docs.filter(F.col("doc_id") < 250), size=256, overlap=0).select(
        F.md5(F.col("chunk")).alias("fp")
    )
    stream = read_documents_stream(spark, sf_dir).filter(F.col("doc_id") >= 250)
    plan = bloom_dedup_gate_stream(stream, store)._jdf.queryExecution().analyzed().toString()
    assert "shiftleft" in plan and "xxhash64" in plan
