"""r15 pair-stage rewrite: the capped (grouped single-exchange)
candidate path must produce exactly the same pairs, counts and scores
as the uncapped equi-join path whenever the cap is not binding, and
must drop exactly the over-cap shingles when it is — the two physical
shapes pin one semantics."""

from __future__ import annotations

import pytest

from gomrjob_spark.operators import dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "a completely different document about spark joins"),
        (5, "a completely different document about spark joins"),
        (6, "the quick brown fox"),
        (7, "short text"),
        (8, None),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_capped_grouped_equals_uncapped_join_when_cap_loose(docs):
    """No shingle in this corpus appears in > 100 docs, so a cap of 100
    filters nothing: grouped candidates must equal the equi-join path
    bit-for-bit (same pairs, same n_common-derived scores)."""
    loose = dedup.jaccard_pairs(docs, n=3, threshold=0.2, max_shingle_freq=100)
    exact = dedup.jaccard_pairs(docs, n=3, threshold=0.2, max_shingle_freq=None)
    cols = ["id_a", "id_b", "jaccard"]
    assert _rows(loose, cols) == _rows(exact, cols)
    assert _rows(loose, cols)  # non-vacuous


def test_capped_grouped_equals_uncapped_join_containment(docs):
    loose = dedup.containment_pairs(docs, n=3, threshold=0.2, max_shingle_freq=100)
    exact = dedup.containment_pairs(docs, n=3, threshold=0.2, max_shingle_freq=None)
    cols = ["id_src", "id_dst", "containment"]
    assert _rows(loose, cols) == _rows(exact, cols)
    assert _rows(loose, cols)


def test_binding_cap_drops_hot_shingles(spark):
    """Five docs share one hot shingle; two also share a rare one. With
    the cap below the hot frequency, only the rare-shingle pair
    survives and the per-doc sizes count KEPT shingles only."""
    rows = [(i, "common shingle here") for i in range(1, 6)]
    rows += [(10, "common shingle here rare extra words"),
             (11, "common shingle here rare extra words")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = dedup.jaccard_pairs(docs, n=3, threshold=0.1, max_shingle_freq=4)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in got.collect()}
    # 'common shingle here' appears in 7 docs (> 4) -> dropped; docs
    # 10/11 share their remaining 3 shingles exactly -> jaccard 1.0
    assert set(pairs) == {(10, 11)}
    assert pairs[(10, 11)] == 1.0


def test_connected_components_edges_distinct_flag(spark):
    pairs = [(1, 2), (2, 3), (5, 6)]
    edges = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id bigint")
    base = {
        (r["doc_id"], r["component"])
        for r in dedup.connected_components(edges, nodes).collect()
    }
    fast = {
        (r["doc_id"], r["component"])
        for r in dedup.connected_components(
            edges, nodes, edges_distinct=True
        ).collect()
    }
    assert fast == base
    assert base == {(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5), (7, 7)}
