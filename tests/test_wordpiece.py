"""WordPiece tokenizer unit gates (operators.text.wordpiece_train /
wordpiece_vocab / wordpiece_encode): likelihood scoring vs raw counts,
greedy longest-match-first semantics, the [UNK] whole-word rule,
memoize-twin agreement, determinism. The full DuckDB hash gates (train
trajectory + every piece boundary) run in test_oracle_parity."""

from __future__ import annotations

from gomrjob_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(
        list(enumerate(rows)), "doc_id long, text string"
    )


def test_likelihood_score_beats_raw_count(spark):
    # pair (a,##z) has the highest COUNT (10) but 'a' is diluted across
    # 16 words, so its score 10/(16*10) loses to (x,##y)'s 4/(4*4) —
    # the WordPiece-vs-BPE distinction, pinned
    corpus = "ab " * 6 + "az " * 10 + "xy " * 4
    merges = text.wordpiece_train(_docs(spark, [corpus]), n_merges=1).collect()
    assert (merges[0]["w1"], merges[0]["w2"]) == ("x", "##y")
    assert merges[0]["n_pair"] == 4


def test_merge_respects_continuation_marker(spark):
    # 'xyxy' is [x, ##y, ##x, ##y]: all three adjacent pairs tie at
    # score 1/16, and the (w1, w2) tie-break picks (##x, ##y) — the
    # interior ##x is a DIFFERENT symbol from the word-initial x, so
    # the marker participates in pair identity and ordering
    corpus = "xyxy " * 8
    merges = {
        r["round"]: r
        for r in text.wordpiece_train(_docs(spark, [corpus]), n_merges=2).collect()
    }
    assert (merges[1]["w1"], merges[1]["w2"]) == ("##x", "##y")
    # after the merge the word is [x, ##y, ##xy]; both remaining pairs
    # tie at 1/8 and (##y, ##xy) sorts first
    assert (merges[2]["w1"], merges[2]["w2"]) == ("##y", "##xy")


def test_encode_greedy_longest_match_first(spark):
    vocab = spark.createDataFrame(
        [("a",), ("ab",), ("abc",), ("b",), ("c",), ("d",),
         ("##b",), ("##c",), ("##d",), ("##cd",)],
        "piece string",
    )
    enc = text.wordpiece_encode(_docs(spark, ["abcd"]), vocab).collect()[0]
    # greedy takes 'abc' then '##d' — never backtracks to 'ab ##cd'
    assert enc["pieces_str"] == "abc ##d"
    assert enc["n_pieces"] == 2
    assert enc["n_unk"] == 0


def test_unk_whole_word_rule(spark):
    vocab = spark.createDataFrame(
        [("a",), ("##b",)], "piece string"
    )
    rows = {
        r["doc_id"]: r
        for r in text.wordpiece_encode(
            _docs(spark, ["ab zq ab"]), vocab
        ).collect()
    }
    # 'zq' has no match at position 1 -> the WHOLE word is [UNK]
    assert rows[0]["pieces_str"] == "a ##b [UNK] a ##b"
    assert rows[0]["n_unk"] == 1
    assert rows[0]["n_pieces"] == 5


def test_unk_on_unmatchable_continuation(spark):
    # 'a' matches at position 1 but there is no '##' piece for 'x':
    # the word fails mid-scan and still becomes ONE [UNK]
    vocab = spark.createDataFrame([("a",), ("x",)], "piece string")
    enc = text.wordpiece_encode(_docs(spark, ["ax"]), vocab).collect()[0]
    assert enc["pieces_str"] == "[UNK]"
    assert enc["n_unk"] == 1


def test_vocab_contains_seeds_and_merges(spark):
    # (c, ##d) wins round 1: 1/(1*1) = 1 beats (a, ##b)'s 3/(3*3) —
    # rare-but-exclusive pairs outrank frequent diluted ones
    docs = _docs(spark, ["ab ab ab cd"])
    merges = text.wordpiece_train(docs, n_merges=1)
    vocab = {r["piece"] for r in text.wordpiece_vocab(docs, merges).collect()}
    assert {"a", "##b", "c", "##d", "cd"} <= vocab


def test_train_encode_roundtrip_and_memoize_twins(spark):
    docs = _docs(spark, ["the cat sat on the mat", "the mat cat", "zq!"])
    merges = text.wordpiece_train(docs, n_merges=3)
    vocab = text.wordpiece_vocab(docs, merges)
    a = sorted(
        map(tuple, text.wordpiece_encode(docs, vocab, memoize=True).collect())
    )
    b = sorted(
        map(tuple, text.wordpiece_encode(docs, vocab, memoize=False).collect())
    )
    assert a == b
    # every char of the corpus is a seed piece, so nothing is UNK and
    # collapsing ' ##' joints reassembles the normalized text exactly
    import re

    norm = {i: re.sub(r"\s+", " ", t.replace("#", "").strip().lower())
            for i, t in ((0, "the cat sat on the mat"), (1, "the mat cat"),
                         (2, "zq!"))}
    for doc_id, _np, n_unk, pieces in a:
        assert n_unk == 0
        assert pieces.replace(" ##", "") == norm[doc_id]


def test_train_deterministic_rerun(spark):
    docs = _docs(spark, ["alpha beta gamma delta " * 2] * 3)
    a = sorted(map(tuple, text.wordpiece_train(docs, n_merges=3).collect()))
    b = sorted(map(tuple, text.wordpiece_train(docs, n_merges=3).collect()))
    assert a == b


def test_train_exhaustion_raises(spark):
    # 'ab' supports exactly ONE merge (a, ##b); a second round has no
    # adjacent pairs left, and the trainer must say so instead of
    # silently returning a 1-row merge table for n_merges=2
    # (ADVICE r9: the empty-top1 cross join used to empty `cur`).
    import pytest

    docs = _docs(spark, ["ab ab ab"])
    ok = text.wordpiece_train(docs, n_merges=1).collect()
    assert [(r["w1"], r["w2"]) for r in ok] == [("a", "##b")]
    with pytest.raises(RuntimeError, match="exhausted at round 2"):
        text.wordpiece_train(docs, n_merges=2)
