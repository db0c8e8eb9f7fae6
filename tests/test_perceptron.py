"""Trained quality classifier (operators/text.py
quality_perceptron_train / quality_perceptron_gate).

The driver gate pins the round-by-round training replay; these tests
pin the LEARNING claims: the training curve genuinely descends, the
trained model agrees with its teacher far above chance, a separable
toy problem is solved exactly, and the portable floor-division device
matches Python's // on negative sums (the cross-engine trap)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gomrjob_spark.operators import text


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


@pytest.fixture(scope="module")
def trained(spark, fixture_docs):
    return text.quality_perceptron_train(fixture_docs, n_rounds=8).collect()


def test_training_curve_descends(trained):
    curve = [r["n_mistakes"] for r in sorted(trained, key=lambda r: r["round"])]
    assert curve[0] == 500  # w=0 misclassifies everything (margin 0)
    assert curve[-1] < 0.1 * curve[0]
    assert curve[-1] <= min(curve)  # the last round is the best seen


def test_gate_agrees_with_teacher_above_90pct(spark, fixture_docs, trained):
    w = spark.createDataFrame(trained)
    gate = text.quality_perceptron_gate(fixture_docs, w)
    rows = gate.count()
    agree = gate.filter("agrees").count()
    assert rows == 500
    assert agree / rows >= 0.90
    # both verdict classes occur — the gate genuinely gates
    keeps = gate.groupBy("keep").count().collect()
    assert len(keeps) == 2


def test_separable_toy_problem_reaches_zero_mistakes(spark):
    """Teacher rule on a crafted corpus where the two classes are far
    apart: high-stopword long docs vs stopword-free short ones. The
    perceptron must reach 0 mistakes (perfect separation) within the
    round budget."""
    good = "the cat is in the house and the dog is in the garden " * 8
    bad = "xqz kvw pfm"
    docs = spark.createDataFrame(
        [(i, good if i % 2 == 0 else bad) for i in range(40)],
        "doc_id long, text string",
    )
    curve = {
        r["round"]: r["n_mistakes"]
        for r in text.quality_perceptron_train(docs, n_rounds=8).collect()
    }
    assert curve[8] == 0


def test_signed_integer_division_truncates_on_both_engines(spark):
    """The decayed update divides NEGATIVE gradient sums, so the two
    engines' integer-division semantics must agree exactly. They do —
    by TRUNCATION toward zero (NOT Python's floor //): Spark DIV and
    DuckDB // both give -502/7 -> -71. An earlier draft assumed DuckDB
    floors and shipped a pmod floor shim; the sf0.001 parity run
    diverged at the first negative non-exact quotient — this test pins
    the real semantics on both engines so the assumption can never
    silently flip."""
    import duckdb

    cases = [(-7, 2), (-7, 3), (7, 2), (-1, 8), (-502, 7), (-25400, 3), (0, 5)]
    df = spark.createDataFrame(cases, "n long, d long")
    got = {
        (r["n"], r["d"]): r["q"]
        for r in df.select("n", "d", F.expr("n DIV d").alias("q")).collect()
    }
    con = duckdb.connect()
    for n, d in cases:
        duck = con.execute(
            "SELECT CAST(? AS BIGINT) // CAST(? AS BIGINT)", [n, d]
        ).fetchone()[0]
        trunc = int(n / d)  # truncation toward zero
        assert got[(n, d)] == duck == trunc, (n, d, got[(n, d)], duck)


def test_decay_is_what_converges(spark, fixture_docs, trained):
    """The design claim behind the 1/r step: replaying the same data
    with UNDECAYED batch updates (a driver-side replay over the exact
    integer features) never settles — its error RINGS across later
    rounds with amplitude several times the decayed run's final error,
    which sits under 10%. Pins that the decay is load-bearing, not
    decoration."""
    feats = [
        (r["y"], (r["x0"], r["r_stop"], r["r_punct"], r["r_digit"], r["len_cap"]))
        for r in text.teacher_label(
            text.quality_features(fixture_docs)
        ).collect()
    ]
    w = [0] * 5
    errs = []
    for _ in range(1, 17):
        mistakes = [
            (y, x)
            for y, x in feats
            if y * sum(wi * xi for wi, xi in zip(w, x)) <= 0
        ]
        errs.append(len(mistakes))
        for j in range(5):
            w[j] += sum(y * x[j] for y, x in mistakes)
    tail = errs[8:]  # rounds 9..16, past any initial descent
    decayed_err = sorted(trained, key=lambda r: r["round"])[-1]["n_mistakes"]
    assert decayed_err < 0.1 * len(feats)
    assert max(tail) > 3 * decayed_err          # the ringing amplitude
    assert max(tail) - min(tail) > decayed_err  # and it never settles
