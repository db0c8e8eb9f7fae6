"""r7 composites: cluster-aware split must never straddle a near-dup
pair across splits; hard negatives must exclude same-label vectors and
rank by exact cosine."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from gomrjob_spark import plans
from gomrjob_spark.catalog import load_table
from gomrjob_spark.operators.similarity import hard_negatives

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_cluster_split_never_straddles_near_dup_pairs(spark):
    from gomrjob_spark.operators import dedup

    docs = load_table(spark, SF_DIR, "documents")
    out = plans.QUERIES["split_cluster_aware"](spark, SF_DIR)
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    pairs = dedup.jaccard_pairs(
        docs, n=3, threshold=0.6, max_shingle_freq=None
    ).select("id_a", "id_b").collect()
    assert pairs, "fixture must contain near-dup pairs for the property"
    for r in pairs:
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (
            r["id_a"], r["id_b"])
    # and the split is non-degenerate
    assert len(set(split_of.values())) >= 2


def test_hard_negatives_excludes_same_label_and_ranks_by_cosine(spark):
    rows = [
        Row(vec_id=0, label=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, label=0, embedding=[0.99, 0.1, 0.0]),   # same label: excluded
        Row(vec_id=2, label=1, embedding=[0.95, 0.3, 0.0]),   # best hard negative
        Row(vec_id=3, label=1, embedding=[0.0, 1.0, 0.0]),    # orthogonal negative
        Row(vec_id=4, label=2, embedding=[-1.0, 0.0, 0.0]),   # opposite
    ]
    df = spark.createDataFrame(rows)
    got = hard_negatives(df.filter(F.col("vec_id") == 0), df, k=3).collect()
    assert [r["neighbor_id"] for r in got] == [2, 3, 4]
    assert all(r["neighbor_label"] != r["query_label"] for r in got)
    assert [r["rank"] for r in got] == [1, 2, 3]
