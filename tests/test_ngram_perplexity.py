"""Bigram LM perplexity gate: the separation property (natural text
must score lower cross-entropy than the SAME tokens shuffled — identical
unigram mass, broken bigram structure) plus penalty-ordering sanity."""

from __future__ import annotations

import random

from pyspark.sql import Row

from gomrjob_spark.operators.text import ngram_perplexity

_SENTENCES = [
    "the quick brown fox jumps over the lazy dog",
    "a stitch in time saves nine every single day",
    "the cat sat on the mat near the door",
    "dogs bark at the moon over the quiet hill",
]


def _natural(i: int) -> str:
    rng = random.Random(1000 + i)
    return " ".join(rng.choice(_SENTENCES) for _ in range(12))


def _shuffled(i: int) -> str:
    toks = _natural(i).split()
    random.Random(2000 + i).shuffle(toks)
    return " ".join(toks)


def test_natural_scores_below_shuffled(spark):
    train = spark.createDataFrame(
        [Row(doc_id=i, text=_natural(i)) for i in range(10)]
    )
    score_rows = [Row(doc_id=100 + i, text=_natural(20 + i)) for i in range(5)]
    score_rows += [Row(doc_id=200 + i, text=_shuffled(20 + i)) for i in range(5)]
    docs = spark.createDataFrame(score_rows)
    out = {
        r["doc_id"]: r["mbits_per_bigram"]
        for r in ngram_perplexity(docs, train).collect()
    }
    nat = [out[100 + i] for i in range(5)]
    shuf = [out[200 + i] for i in range(5)]
    # every shuffled doc scores above every natural doc's mean, and the
    # means separate clearly (not a 1-millibit squeaker)
    assert sum(shuf) / len(shuf) > 1.5 * (sum(nat) / len(nat)), (nat, shuf)
    assert min(shuf) > max(nat), (nat, shuf)


def test_oov_scores_above_in_vocab(spark):
    train = spark.createDataFrame(
        [Row(doc_id=i, text=_natural(i)) for i in range(10)]
    )
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            Row(doc_id=2, text="zxq qqv wvx plk mnb zzz qqq www eee rrr"),
        ]
    )
    out = {
        r["doc_id"]: r["mbits_per_bigram"]
        for r in ngram_perplexity(docs, train).collect()
    }
    assert out[2] > out[1]


def test_short_docs_drop_out(spark):
    train = spark.createDataFrame([Row(doc_id=0, text=_natural(0))])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="one"),
            Row(doc_id=2, text=""),
            Row(doc_id=3, text=None),
            Row(doc_id=4, text="the quick brown fox"),
        ]
    )
    got = {r["doc_id"] for r in ngram_perplexity(docs, train).collect()}
    assert got == {4}


def test_trigram_natural_scores_below_shuffled(spark):
    from gomrjob_spark.operators.text import trigram_perplexity

    train = spark.createDataFrame(
        [Row(doc_id=i, text=_natural(i)) for i in range(10)]
    )
    score_rows = [Row(doc_id=100 + i, text=_natural(20 + i)) for i in range(5)]
    score_rows += [Row(doc_id=200 + i, text=_shuffled(20 + i)) for i in range(5)]
    docs = spark.createDataFrame(score_rows)
    out = {
        r["doc_id"]: r["mbits_per_trigram"]
        for r in trigram_perplexity(docs, train).collect()
    }
    nat = [out[100 + i] for i in range(5)]
    shuf = [out[200 + i] for i in range(5)]
    assert min(shuf) > max(nat), (nat, shuf)
    # trigram context separates at least as sharply as the bigram gate
    assert sum(shuf) / len(shuf) > 1.5 * (sum(nat) / len(nat))


def test_trigram_short_docs_drop_out(spark):
    from gomrjob_spark.operators.text import trigram_perplexity

    train = spark.createDataFrame([Row(doc_id=0, text=_natural(0))])
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="one two"),
            Row(doc_id=2, text="the quick brown fox"),
        ]
    )
    got = {r["doc_id"] for r in trigram_perplexity(docs, train).collect()}
    assert got == {2}
