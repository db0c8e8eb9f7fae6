"""Unigram-LM tokenizer unit gates (operators.text.unigram_lm_train /
unigram_encode): Viterbi optimality and tie semantics, OOV coverage,
EM pruning invariants, determinism. The full DuckDB hash gate (train
trajectory + every segment boundary) runs in test_oracle_parity."""

from __future__ import annotations

import pyspark.sql.functions as F

from gomrjob_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


def test_learns_frequent_pieces_and_segments_compounds(spark):
    docs = _docs(spark, ["the cat sat on the mat " * 3 + "catmat " * 2] * 6)
    vocab = text.unigram_lm_train(docs, n_rounds=2, seed_min=3, prune_min=3)
    pieces = {r["piece"] for r in vocab.collect()}
    assert {"cat", "mat", "the"} <= pieces
    enc = text.unigram_encode(docs, vocab).collect()
    # "catmat" must split on the learned piece boundary
    assert all(" cat mat" in r["pieces_str"] for r in enc)


def test_single_chars_never_pruned_and_oov_covered(spark):
    docs = _docs(spark, ["aaa bbb aaa bbb aaa"] * 4)
    vocab = text.unigram_lm_train(docs, n_rounds=2, seed_min=3, prune_min=3)
    pieces = {r["piece"] for r in vocab.collect()}
    # chars survive even when every occurrence is swallowed by 'aaa'/'bbb'
    assert {"a", "b"} <= pieces
    # encoding a word with chars never seen in training must not fail:
    # unseen chars fall back to the OOV penalty, one char per piece
    enc = text.unigram_encode(
        _docs(spark, ["zzq aaa"]), vocab
    ).collect()[0]
    assert enc["pieces_str"] == "z z q aaa"


def test_viterbi_prefers_cheaper_total_then_longest_piece(spark):
    # vocab hand-built: 'abcd' cheap beats any split; for equal-cost
    # splits the LONGEST piece at each dp step must win
    vocab = spark.createDataFrame(
        [("abcd", 40, 2), ("ab", 10, 4), ("cd", 10, 4), ("a", 1, 8),
         ("b", 1, 8), ("c", 1, 8), ("d", 1, 8)],
        "piece string, n long, cost_bits long",
    )
    enc = text.unigram_encode(_docs(spark, ["abcd"]), vocab).collect()[0]
    assert enc["pieces_str"] == "abcd"
    assert enc["n_pieces"] == 1


def test_encode_totals_are_consistent(spark):
    docs = _docs(spark, ["the cat sat", "on the mat", None, ""])
    vocab = text.unigram_lm_train(docs, n_rounds=1, seed_min=2, prune_min=2)
    rows = text.unigram_encode(docs, vocab).collect()
    ids = {r["doc_id"] for r in rows}
    assert ids == {0, 1}  # null/empty text drops out
    for r in rows:
        assert r["n_pieces"] == len(r["pieces_str"].split(" "))
        assert r["mbits_per_piece"] == (1000 * r["total_bits"]) // r["n_pieces"]


def test_train_deterministic_rerun(spark):
    docs = _docs(spark, ["alpha beta gamma delta " * 2] * 5)
    a = sorted(map(tuple, text.unigram_lm_train(docs, n_rounds=2).collect()))
    b = sorted(map(tuple, text.unigram_lm_train(docs, n_rounds=2).collect()))
    assert a == b


def test_memoized_and_rowlocal_encode_agree(spark):
    docs = _docs(spark, ["the cat sat on the mat catmat", "on the mat zz"])
    vocab = text.unigram_lm_train(docs, n_rounds=1, seed_min=2, prune_min=2)
    a = sorted(map(tuple, text.unigram_encode(docs, vocab, memoize=True).collect()))
    b = sorted(map(tuple, text.unigram_encode(docs, vocab, memoize=False).collect()))
    assert a == b


# ---- Gopher top-ngram char fractions (sibling r8 text signal) ----


def test_top_ngram_char_fractions_slogan_case(spark):
    # a 5-token slogan repeated 10x: few distinct tokens but most of
    # the characters — top4 coverage must dwarf the fresh doc's
    slogan = "call now for best deals " * 10
    fresh = " ".join(f"w{i}" for i in range(50))
    docs = _docs(spark, [slogan, fresh])
    rows = {
        r["doc_id"]: r
        for r in text.top_ngram_char_fractions(docs, ns=(2, 3, 4)).collect()
    }
    assert rows[0]["top4_ppm"] > 500_000  # repeated 4-gram covers most chars
    assert rows[1]["top4_ppm"] < 200_000  # every 4-gram unique
    # coverage is exact: top2 for the fresh doc = one 2-gram's chars
    import re
    norm = re.sub(r"\s+", " ", fresh.strip())
    assert rows[1]["top2_ppm"] == (1_000_000 * len("w0 w1")) // len(norm)


# ---- Gopher duplicate-ngram char coverage (position-union) ----


def test_dup_ngram_coverage_disjoint_union(spark):
    # "a b c" duplicates at token positions 1 and 4: two disjoint
    # 5-char intervals -> 10 covered chars of the 17-char doc
    docs = _docs(spark, ["a b c a b c d e f"])
    r = text.dup_ngram_char_coverage(docs, n=3, min_tokens=3).collect()[0]
    assert (r["n_tokens"], r["dup_chars"]) == (9, 10)
    assert r["coverage_ppm"] == (1_000_000 * 10) // 17


def test_dup_ngram_coverage_overlap_counts_chars_once(spark):
    # "x y x"@{1,3} and "y x y"@{2,4} overlap: the interval union is
    # [0, 11) = 11 chars, NOT the 4x5=20 occurrences-times-length count
    docs = _docs(spark, ["x y x y x y z"])
    r = text.dup_ngram_char_coverage(docs, n=3, min_tokens=3).collect()[0]
    assert r["dup_chars"] == 11
    assert r["coverage_ppm"] == (1_000_000 * 11) // 13


def test_dup_ngram_coverage_no_dups_and_min_tokens(spark):
    docs = _docs(spark, ["a b c d e f g h", "a b"])
    rows = {
        r["doc_id"]: r
        for r in text.dup_ngram_char_coverage(
            docs, n=3, min_tokens=5
        ).collect()
    }
    assert set(rows) == {0}  # doc 1 is under min_tokens
    assert rows[0]["dup_chars"] == 0 and rows[0]["coverage_ppm"] == 0
