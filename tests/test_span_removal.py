"""Exact-substring removal unit gates (operators.dedup
.span_removal_rewrite — Lee et al. arXiv:2107.06499 ExactSubstr):
winner-keeps semantics, within-doc splice, overlap union, pass-through
of clean documents. The full DuckDB hash gate (every splice boundary
of the rewritten corpus) runs in test_oracle_parity."""

from __future__ import annotations

from gomrjob_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(
        list(enumerate(rows)), "doc_id long, text string"
    )


def _run(spark, rows, n=3):
    return {
        r["doc_id"]: r
        for r in dedup.span_removal_rewrite(_docs(spark, rows), n=n).collect()
    }


def test_cross_doc_winner_keeps_loser_spliced(spark):
    rows = _run(spark, ["a b c x y z", "p q a b c r"])
    # the lower (doc_id, pos) occurrence of "a b c" survives
    assert rows[0]["text_rewritten"] == "a b c x y z"
    assert rows[0]["n_removed"] == 0
    assert rows[1]["text_rewritten"] == "p q r"
    assert rows[1]["n_removed"] == 3


def test_within_doc_first_occurrence_survives_and_overlaps_merge(spark):
    # "a b c"@{1,5} and "b c d"@{2,6}: loser intervals [5,8) + [6,9)
    # union to [5,9) — 4 tokens removed, not 6
    rows = _run(spark, ["a b c d a b c d e"])
    assert rows[0]["text_rewritten"] == "a b c d e"
    assert rows[0]["n_removed"] == 4
    assert rows[0]["n_tokens"] == 9


def test_clean_docs_pass_through_normalized(spark):
    rows = _run(spark, ["Fresh   Unique WORDS here", "other text entirely"])
    assert rows[0]["text_rewritten"] == "fresh unique words here"
    assert rows[1]["text_rewritten"] == "other text entirely"
    assert all(r["n_removed"] == 0 for r in rows.values())


def test_short_docs_have_no_windows(spark):
    # under n tokens: no windows, never removed, still emitted
    rows = _run(spark, ["a b", "a b"], n=3)
    assert rows[0]["text_rewritten"] == "a b"
    assert rows[1]["text_rewritten"] == "a b"


def test_fully_duplicated_doc_empties(spark):
    # doc1 is an exact replica: every window duplicates doc0's, and the
    # merged loser interval covers the whole document
    t = " ".join(f"w{i}" for i in range(6))
    rows = _run(spark, [t, t])
    assert rows[0]["text_rewritten"] == t
    assert rows[1]["text_rewritten"] == ""
    assert rows[1]["n_removed"] == 6


def test_deterministic_rerun(spark):
    docs = _docs(spark, ["a b c d a b c d e", "p q a b c r"])
    a = sorted(map(tuple, dedup.span_removal_rewrite(docs, n=3).collect()))
    b = sorted(map(tuple, dedup.span_removal_rewrite(docs, n=3).collect()))
    assert a == b
