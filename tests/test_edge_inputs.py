"""Degenerate-input behavior for the r6 text/dedup operators: NULL
text, empty strings, whitespace-only docs, single tokens, and empty
corpora must produce empty-or-sensible results, never raise."""

from __future__ import annotations

from pyspark.sql import Row

from gomrjob_spark.cache import release_scoped
from gomrjob_spark.operators.dedup import jaccard_prefix_pairs, token_edit1_pairs
from gomrjob_spark.operators.text import (
    bpe_train_merges,
    compression_ratio,
    pmi_collocations,
)


def _edge(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=None),
            Row(doc_id=2, text=""),
            Row(doc_id=3, text="  "),
            Row(doc_id=4, text="one"),
        ]
    )


def test_degenerate_docs_never_raise(spark):
    edge = _edge(spark)
    assert pmi_collocations(edge, min_count=1, k=5).collect() == []
    release_scoped()
    assert bpe_train_merges(edge, n_merges=2).collect() == []
    release_scoped()
    assert jaccard_prefix_pairs(edge).collect() == []
    release_scoped()
    comp = {r["doc_id"]: r for r in compression_ratio(edge).collect()}
    assert len(comp) == 4
    assert comp[1]["raw_bytes"] == 0  # NULL text treated as empty
    assert comp[1]["ratio_permille"] >= 0


def test_empty_corpus_never_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert pmi_collocations(empty, min_count=1, k=5).collect() == []
    release_scoped()
    assert bpe_train_merges(empty, n_merges=2).collect() == []
    release_scoped()
    assert jaccard_prefix_pairs(empty).collect() == []
    release_scoped()
    earr = spark.createDataFrame([], "doc_id int, toks array<string>")
    assert token_edit1_pairs(earr).collect() == []
    release_scoped()
