"""BPE tokenizer training: greedy non-overlap merge semantics and
deterministic winner selection."""

from __future__ import annotations

from pyspark.sql import Row

from gomrjob_spark.cache import release_scoped
from gomrjob_spark.operators.text import bpe_train_merges


def _train(spark, texts, n):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    out = bpe_train_merges(docs, n_merges=n).collect()
    release_scoped()
    return [(r["round"], r["w1"], r["w2"], r["n_pair"]) for r in out]


def test_merge_table_and_recursive_merge(spark):
    # round 1: (a,b) x3 wins; round 2: merged symbols pair up
    got = _train(spark, ["a b a b c", "a b"], 2)
    assert got == [
        (1, "a", "b", 3),
        (2, "a\x02b", "a\x02b", 1),
    ]


def test_greedy_non_overlap_aaa(spark):
    # [a,a,a,a,a]: greedy left-to-right merges positions 1-2 and 3-4,
    # the 5th 'a' survives -> (a,a) count 4 but the merge is non-overlap
    got = _train(spark, ["a a a a a"], 2)
    assert got[0] == (1, "a", "a", 4)
    # after round 1: [aa, aa, a] -> pairs (aa,aa) and (aa,a) tie at 1;
    # w2 tie-break: "a" sorts before "a\x02a"
    assert got[1] == (2, "a\x02a", "a", 1)


def test_abab_merges_both_occurrences(spark):
    # the string-replace formulation would miss the second (a,b) after
    # consuming the shared boundary; the fold must catch both
    got = _train(spark, ["a b a b"], 2)
    assert got[0] == (1, "a", "b", 2)
    assert got[1] == (2, "a\x02b", "a\x02b", 1)


def test_tie_breaks_lexicographically(spark):
    # (a,b) and (b,a) both occur twice -> (a,b) wins on w1 order
    got = _train(spark, ["b a b a b"], 1)
    assert got == [(1, "a", "b", 2)]


def test_marker_bytes_stripped_from_input(spark):
    got = _train(spark, ["x\x02y x\x02y", "x\x02y xy"], 1)
    # 0x02 stripped: tokens are xy; top pair (xy, xy)
    assert got == [(1, "xy", "xy", 2)]


def _apply(spark, texts, n):
    from gomrjob_spark.operators.text import bpe_apply

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    merges = bpe_train_merges(docs, n_merges=n)
    out = {
        r["doc_id"]: r["toks"]
        for r in bpe_apply(docs, merges).collect()
    }
    release_scoped()
    return out


def _replay(text, merge_rows):
    """Driver-side greedy left-to-right replay — the semantics twin."""
    toks = [
        t.replace("\x02", "")
        for t in " ".join((text or "").lower().split()).split(" ")
        if t.replace("\x02", "") != ""
    ]
    for w1, w2 in merge_rows:
        out = []
        for x in toks:
            if out and out[-1] == w1 and x == w2:
                out[-1] = w1 + "\x02" + w2
            else:
                out.append(x)
        toks = out
    return toks


def test_bpe_apply_matches_driver_replay(spark):
    texts = ["a b a b c", "a b a b a b", "x", "", None, "a a a", "b a b"]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    merges_df = bpe_train_merges(docs, n_merges=3)
    rows = [(r["w1"], r["w2"]) for r in merges_df.orderBy("round").collect()]
    got = _apply(spark, texts, 3)
    for i, t in enumerate(texts):
        assert got[i] == _replay(t, rows), (i, t)


def test_bpe_apply_null_and_empty_encode_to_empty(spark):
    got = _apply(spark, ["", None, "   "], 1)
    assert got == {0: [], 1: [], 2: []}


def test_bpe_apply_merge_order_is_round_order(spark):
    # round 1 merges (a,b); round 2 merges (ab, c). Applying in round
    # order yields [abc]; reversed order would leave [ab, c] split.
    from gomrjob_spark.operators.text import bpe_apply

    docs = spark.createDataFrame([Row(doc_id=0, text="a b c a b c")])
    merges = spark.createDataFrame(
        [
            Row(round=1, w1="a", w2="b"),
            Row(round=2, w1="a\x02b", w2="c"),
        ]
    )
    out = bpe_apply(docs, merges).collect()[0]["toks"]
    release_scoped()
    assert out == ["a\x02b\x02c", "a\x02b\x02c"]
