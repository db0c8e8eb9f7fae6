"""SemDeDup (dedup_semantic_diversity) unit gates: deterministic
md5-seeded k-means, within-cell survivorship semantics, and the
cell-scoped plan shape. The full DuckDB hash gate runs in
test_oracle_parity; these pin the operator-level contracts the gate
can't articulate."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gomrjob_spark.operators import similarity


def _toy_corpus(spark, n=64, dim=8, seed=3):
    import random

    rng = random.Random(seed)
    rows = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(dim)]) for i in range(n)
    ]
    # append exact-scaled twins of the first 8 vectors (cosine == 1.0
    # to their source up to rounding: scaling by 2 is IEEE-exact)
    rows += [(1000 + i, [2.0 * x for x in rows[i][1]]) for i in range(8)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_seeds_are_md5_ordered_and_numbered(spark):
    corpus = _toy_corpus(spark)
    seeds = similarity.kmeans_seeds_md5(corpus, 5).collect()
    assert [r["cell"] for r in seeds] == [1, 2, 3, 4, 5]
    expect = [
        r["vec_id"]
        for r in corpus.select(
            "vec_id", F.md5(F.col("vec_id").cast("string")).alias("h")
        )
        .orderBy("h")
        .limit(5)
        .collect()
    ]
    got_vecs = {tuple(r["centroid"]) for r in seeds}
    src = {
        tuple(float(x) for x in r["embedding"])
        for r in corpus.filter(F.col("vec_id").isin(expect)).collect()
    }
    assert got_vecs == src


def test_exact_twins_dropped_lowest_id_survives(spark):
    corpus = _toy_corpus(spark)
    surv = similarity.semantic_diversity_survivors(
        corpus, threshold=0.999, target_cell=16, min_cells=4, n_iters=2
    )
    kept = {r["vec_id"] for r in surv.collect()}
    # a scaled twin has cosine 1.0 to its source: same argmax cell by
    # construction (identical score vector), so the higher id drops
    for i in range(8):
        assert i in kept, f"source {i} must survive"
        assert 1000 + i not in kept, f"twin {1000 + i} must drop"


def test_survivors_deterministic_rerun(spark):
    corpus = _toy_corpus(spark)
    a = sorted(
        (r["vec_id"], r["cell"])
        for r in similarity.semantic_diversity_survivors(
            corpus, threshold=0.9, target_cell=16, min_cells=4
        ).collect()
    )
    b = sorted(
        (r["vec_id"], r["cell"])
        for r in similarity.semantic_diversity_survivors(
            corpus, threshold=0.9, target_cell=16, min_cells=4
        ).collect()
    )
    assert a == b


def test_cells_cover_1_to_k_and_survivor_plan_is_equi_joined(spark):
    corpus = _toy_corpus(spark)
    surv = similarity.semantic_diversity_survivors(
        corpus, threshold=0.999, target_cell=16, min_cells=4
    )
    rows = surv.collect()
    cells = {r["cell"] for r in rows}
    assert cells <= set(range(1, 5)), cells
    plan = surv._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the pair stage must be the cell-keyed equi join, never a product
    assert "BroadcastNestedLoopJoin" not in plan


def test_threshold_1_drops_nothing_but_exact_rays(spark):
    corpus = _toy_corpus(spark).filter(F.col("vec_id") < 1000)
    surv = similarity.semantic_diversity_survivors(
        corpus, threshold=0.9999999, target_cell=16, min_cells=4
    )
    assert surv.count() == 64


# ---- paragraph containment (sibling r8 dedup family) ----


def test_paragraph_containment_semantics(spark):
    from gomrjob_spark.operators import dedup

    boiler = "B" * 256
    fresh_a = "x" * 256
    fresh_b = "y" * 256
    docs = spark.createDataFrame(
        [
            (1, boiler + fresh_a),          # first owner of boiler: 0 contained
            (2, boiler + boiler + fresh_b), # 2 of 3 contained -> dropped
            (3, fresh_b),                   # 1 of 1 contained -> dropped
            (4, "z" * 100),                 # unique, short: kept
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.paragraph_containment(docs, size=256, drop_ppm=500_000).collect()
    }
    assert rows[1]["n_contained"] == 0 and rows[1]["keep"]
    assert rows[2]["n_par"] == 3 and rows[2]["n_contained"] == 2
    assert not rows[2]["keep"]
    assert rows[3]["contained_ppm"] == 1_000_000 and not rows[3]["keep"]
    assert rows[4]["n_par"] == 1 and rows[4]["keep"]


def test_crossmodal_alignment_gate(spark):
    """Alignment semantics: identical pair -> 1.0 aligned; negated ->
    -1.0 dropped; orthogonal -> 0.0 dropped; only shared pair ids
    survive the equi-join."""
    from gomrjob_spark.operators.similarity import crossmodal_alignment

    a = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]), (3, [1.0, 0.0]), (9, [1.0, 0.0])],
        "pair_id long, embedding array<double>",
    )
    b = spark.createDataFrame(
        [(1, [2.0, 0.0]), (2, [-1.0, 0.0]), (3, [0.0, 5.0])],
        "pair_id long, embedding array<double>",
    )
    rows = {r["pair_id"]: r for r in crossmodal_alignment(a, b, 0.5).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["align_sim"] == 1.0 and rows[1]["aligned"]
    assert rows[2]["align_sim"] == -1.0 and not rows[2]["aligned"]
    assert rows[3]["align_sim"] == 0.0 and not rows[3]["aligned"]


def test_hier_assign_empty_coarse_cell_falls_back_to_fcell_1(spark):
    """r13 advisor (medium): Lloyd's can leave a coarse cell with zero
    training members whose centroid survives via COALESCE — it then has
    NO fine centroids. A (streaming) arrival whose coarse argmax lands
    there must still be assigned (fcell=1 fallback), not silently
    dropped by an inner join — the gate's 'first arrival passes with
    n_same_cell=0' invariant depends on it."""
    coarse = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "cell int, centroid array<double>"
    )
    # fine centroids exist ONLY for coarse cell 1
    fine = spark.createDataFrame(
        [(1, 1, [1.0, 0.0]), (1, 2, [0.9, 0.1])],
        "ccell int, fcell int, centroid array<double>",
    )
    model = similarity.SemDedupModel(coarse, fine, 2)
    arrivals = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["cell"]
        for r in similarity.hier_assign(arrivals, model).collect()
    }
    assert got[10] == 1  # (1-1)*2 + 1: normal fine argmax
    assert got[11] == 3  # (2-1)*2 + 1: the empty-coarse-cell fallback
