"""cap_pair_fanout: the mega-cluster valve must cut clique pair volume
to linear while leaving the connected-component assignment unchanged
(cliques are exactly the replica-duplication shape that explodes; the
r7 sweep measured 33 pairs/cluster at 8x vs 7.2 at 4x with the cluster
count frozen — see SCALING.md)."""

from __future__ import annotations

import itertools

from gomrjob_spark.operators.dedup import cap_pair_fanout, connected_components


def _clique_pairs(cliques):
    pairs = []
    for members in cliques:
        pairs.extend(itertools.combinations(sorted(members), 2))
    return pairs


def _components(spark, pairs, nodes):
    edges = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    node_df = spark.createDataFrame([(n,) for n in nodes], "doc_id bigint")
    comp = connected_components(edges, node_df)
    return {r["doc_id"]: r["component"] for r in comp.collect()}


def test_capped_cliques_keep_components_and_go_linear(spark):
    # 12 cliques of size 9 with interleaved, non-contiguous ids: 36
    # pairs per clique uncapped.
    cliques = [[c + 12 * i for i in range(9)] for c in range(12)]
    nodes = [n for c in cliques for n in c]
    pairs = _clique_pairs(cliques)
    assert len(pairs) == 12 * 36

    edges = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    capped = cap_pair_fanout(edges, k=1)
    kept = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    # per clique of size s: the per-src rule keeps the (v_i, v_{i+1})
    # chain, the per-dst rule keeps the (v_1, v_j) star -> <= 2(s-1)
    assert len(kept) <= 12 * 2 * 8
    assert len(kept) < len(pairs)
    # the star around each clique minimum survives the k=1 cap
    for members in cliques:
        m = sorted(members)
        for j in m[1:]:
            assert (m[0], j) in kept

    want = _components(spark, pairs, nodes)
    got = _components(spark, sorted(kept), nodes)
    assert got == want


def test_cap_is_noop_when_fanout_already_bounded(spark):
    pairs = [(1, 2), (3, 4), (5, 6)]
    edges = spark.createDataFrame(pairs, "id_a bigint, id_b bigint")
    kept = {
        (r["id_a"], r["id_b"]) for r in cap_pair_fanout(edges, k=2).collect()
    }
    assert kept == set(pairs)
