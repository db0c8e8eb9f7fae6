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


# ---- cross-source overlap matrix (r9 forensics sibling) ----


def test_cross_source_overlap_matrix(spark):
    docs = spark.createDataFrame(
        [
            (0, "a b c x y z", "srcA"),
            (1, "p a b c q", "srcB"),
            (2, "m n o", "srcC"),
            (3, "a b c again here", "srcA"),  # within-source dup: counts once
        ],
        "doc_id long, text string, source string",
    )
    rows = {
        (r["source_a"], r["source_b"]): r
        for r in dedup.cross_source_overlap(docs, n=3).collect()
    }
    # only the (A, B) pair shares a span ("a b c")
    assert set(rows) == {("srcA", "srcB")}
    r = rows[("srcA", "srcB")]
    assert r["n_shared"] == 1
    # srcB has 3 distinct 3-gram fingerprints (pab, abc, bcq) and is
    # the smaller inventory, so it is the containment denominator
    assert r["min_total"] == 3
    assert r["overlap_ppm"] == (1_000_000 * 1) // 3


def test_cross_source_overlap_symmetric_input_order(spark):
    # source naming order must not matter: a < b in the output key
    docs = spark.createDataFrame(
        [(0, "q w e r t y", "zz"), (1, "q w e o p u", "aa")],
        "doc_id long, text string, source string",
    )
    rows = dedup.cross_source_overlap(docs, n=3).collect()
    assert len(rows) == 1
    assert (rows[0]["source_a"], rows[0]["source_b"]) == ("aa", "zz")
    assert rows[0]["n_shared"] == 1  # "q w e"


# ---- surgical decontamination (the scrub companion) ----


def test_span_scrub_excises_every_benchmark_occurrence(spark):
    bench = _docs(spark, ["secret eval answer"])
    train = spark.createDataFrame(
        [
            (10, "intro secret eval answer outro"),
            (11, "secret eval answer secret eval answer"),  # BOTH go
            (12, "totally unrelated text here"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.decontaminate_span_scrub(train, bench, n=3).collect()
    }
    assert rows[10]["text_rewritten"] == "intro outro"
    assert rows[10]["n_removed"] == 3
    # no winner survives: surgical scrub removes ALL occurrences
    assert rows[11]["text_rewritten"] == ""
    assert rows[11]["n_removed"] == 6
    assert rows[12]["text_rewritten"] == "totally unrelated text here"
    assert rows[12]["n_removed"] == 0


def test_span_scrub_overlapping_hits_merge(spark):
    # benchmark spans "a b c" and "b c d" overlap in the train doc:
    # positions 1..4 union, not 6 removals
    bench = _docs(spark, ["a b c d"])
    train = spark.createDataFrame(
        [(10, "a b c d x y")], "doc_id long, text string"
    )
    r = dedup.decontaminate_span_scrub(train, bench, n=3).collect()[0]
    assert r["text_rewritten"] == "x y"
    assert r["n_removed"] == 4
