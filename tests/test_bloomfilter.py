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
