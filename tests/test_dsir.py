"""DSIR importance resampling unit gates (operators.sampling
.dsir_importance): target-enriched documents must outscore
target-disjoint ones; scores are deterministic and length-normalized.
The full DuckDB hash gate runs in test_oracle_parity."""

from __future__ import annotations

from gomrjob_spark.operators.sampling import dsir_importance


def _frames(spark):
    target = spark.createDataFrame(
        [(1000 + i, "quantum flux capacitor resonance " * 4) for i in range(4)],
        "doc_id long, text string",
    )
    raw = spark.createDataFrame(
        [
            (1, "quantum flux capacitor resonance tuning"),  # target-like
            (2, "cheap pills casino bonus click here now"),  # disjoint
            (3, "quantum flux something else entirely here"),  # partial
        ],
        "doc_id long, text string",
    )
    return raw, target


def test_target_like_docs_outscore_disjoint(spark):
    raw, target = _frames(spark)
    rows = {r["doc_id"]: r for r in dsir_importance(raw, target).collect()}
    assert rows[1]["imp_mbits"] > rows[3]["imp_mbits"] > rows[2]["imp_mbits"]


def test_scores_deterministic_and_normalized(spark):
    raw, target = _frames(spark)
    a = sorted(map(tuple, dsir_importance(raw, target).collect()))
    b = sorted(map(tuple, dsir_importance(raw, target).collect()))
    assert a == b
    # repeating a doc's text doubles features but not its mean score
    raw2 = spark.createDataFrame(
        [(1, "quantum flux capacitor resonance tuning"),
         (9, "quantum flux capacitor resonance tuning " * 2)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dsir_importance(raw2, target).collect()}
    assert rows[9]["n_feats"] > rows[1]["n_feats"]
    # mean stays in the same ballpark (the doubled text adds one
    # cross-boundary bigram, so allow a small wobble)
    assert abs(rows[9]["imp_mbits"] - rows[1]["imp_mbits"]) < 2000


# ---- repeated token-span dedup (sibling r8 addition) ----


def test_repeated_ngram_spans_semantics(spark):
    from gomrjob_spark.operators import dedup

    base = " ".join(f"w{i}" for i in range(13))  # one exact 13-token span
    docs = spark.createDataFrame(
        [
            (1, base + " unique1 tail1 here1"),
            (2, base + " other2 words2 go2"),      # shares the prefix span
            (3, "totally different thirteen token document body " 
                "alpha beta gamma delta eps zeta eta"),
            (4, "short doc"),                      # < 13 tokens: drops out
            (5, base + " " + base),                # within-doc repetition
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup.repeated_ngram_spans(docs, n=13).collect()}
    assert 4 not in rows
    # docs 1 and 2 share exactly the w0..w12 window (their tails differ)
    assert rows[1]["n_dup"] >= 1 and rows[2]["n_dup"] >= 1
    assert rows[3]["n_dup"] == 0 and rows[3]["dup_ppm"] == 0
    # within-doc repeats count: doc 5's two aligned copies of the span
    # duplicate each other (the 12 boundary-straddling windows between
    # them are each unique -> not counted)
    assert rows[5]["n_win"] == 14
    assert rows[5]["n_dup"] == 2
    for r in rows.values():
        assert r["dup_ppm"] == (1_000_000 * r["n_dup"]) // r["n_win"]


def test_paragraph_minhash_rollup_catches_edited_boilerplate(spark):
    from gomrjob_spark.operators import dedup

    # 256-char boilerplate with a tiny edit in the copy: exact chunk
    # fingerprints differ, minhash-at-0.8 still matches
    words = " ".join(f"tok{i:03d}" for i in range(36))  # 36*7-1=251 chars
    boiler = (words + " x" * 40)[:256]
    edited = boiler.replace("tok017", "tok917")
    fresh = " ".join(f"zz{i:03d}" for i in range(40))[:256]
    docs = spark.createDataFrame(
        [(1, boiler), (2, edited), (3, fresh)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in dedup.paragraph_minhash_rollup(
            docs, threshold=0.8, drop_ppm=500_000
        ).collect()
    }
    assert rows[1]["n_near"] == 0 and rows[1]["keep"]  # first owner
    assert rows[2]["n_near"] == 1 and not rows[2]["keep"]  # edited copy drops
    assert rows[3]["n_near"] == 0 and rows[3]["keep"]
    # the EXACT variant must miss the edited copy (the complementarity
    # this operator exists for)
    ex = {
        r["doc_id"]: r
        for r in dedup.paragraph_containment(
            docs, size=256, drop_ppm=500_000
        ).collect()
    }
    assert ex[2]["n_contained"] == 0 and ex[2]["keep"]
