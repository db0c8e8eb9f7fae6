"""Language-ID classifier unit gates (operators.text.langid_train /
langid_priors / langid_gate): learning on a corpus with REAL charset
signal (the fixture documents table is language-independent by
construction — see text_langid_train's honesty note — so accuracy is
provable only here), the unseen-gram scoring path, empty-text priors,
argmax tie determinism, and the allowed-set verdict. The full DuckDB
hash gates (dense model table + every per-doc prediction) run in the
driver contract (text_langid_train / text_langid_gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gomrjob_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def _signal_corpus(spark, n_each: int = 20):
    # two "languages" with DISJOINT character sets — separable by any
    # char-n-gram model that actually learns
    rows = []
    for i in range(n_each):
        rows.append((i, "aa ab ba bb ab aa", "aa"))
        rows.append((1000 + i, "xx xy yx yy xy xx", "xy"))
    return _docs(spark, rows)


def test_learns_disjoint_charsets(spark):
    docs = _signal_corpus(spark)
    got = {
        r["doc_id"]: (r["pred_lang"], r["keep"])
        for r in text.langid_gate(docs, docs, allowed=("aa",)).collect()
    }
    for i in range(20):
        assert got[i] == ("aa", True)
        assert got[1000 + i] == ("xy", False)


def test_model_is_dense_and_weights_monotone(spark):
    docs = _signal_corpus(spark)
    m = text.langid_train(docs).collect()
    langs = {r["lang"] for r in m}
    grams = {r["gram"] for r in m}
    # dense: every lang x every vocab gram, zero-count rows included
    assert len(m) == len(langs) * len(grams)
    by_lang_gram = {(r["lang"], r["gram"]): r for r in m}
    # 'xx' is frequent in xy-lang, absent in aa-lang: w must order that way
    assert by_lang_gram[("xy", "xx")]["cnt"] > 0
    assert by_lang_gram[("aa", "xx")]["cnt"] == 0
    assert by_lang_gram[("xy", "xx")]["w"] > by_lang_gram[("aa", "xx")]["w"]


def test_unseen_gram_scores_do_not_crash_and_stay_exact(spark):
    # gate docs containing grams NEVER seen in training exercise the
    # _unseen fallback array; scores remain deterministic integers
    train = _signal_corpus(spark)
    probe = _docs(spark, [(7, "qq qz zq", "aa")])
    out = text.langid_gate(probe, train).collect()
    assert len(out) == 1
    r = out[0]
    assert r["pred_lang"] in ("aa", "xy")
    assert isinstance(r["score"], int)
    rerun = text.langid_gate(probe, train).collect()[0]
    assert (r["pred_lang"], r["score"]) == (rerun["pred_lang"], rerun["score"])


def test_empty_text_scores_priors_only_and_ties_break_alphabetically(spark):
    # equal class priors -> tie -> alphabetically first language wins
    train = _signal_corpus(spark)
    probe = _docs(spark, [(9, "", "xy")])
    r = text.langid_gate(probe, train, allowed=("aa",)).collect()[0]
    assert r["n_grams"] == 0
    assert r["pred_lang"] == "aa"
    assert r["keep"] is True
    # priors-only score == sum over zero grams + prior weight
    wp = {p["lang"]: p["wp"] for p in text.langid_priors(train).collect()}
    assert r["score"] == wp["aa"]


def test_allowed_set_controls_keep(spark):
    docs = _signal_corpus(spark)
    both = text.langid_gate(docs, docs, allowed=("aa", "xy"))
    assert both.filter(~F.col("keep")).count() == 0


def test_priors_shift_prediction_when_grams_are_neutral(spark):
    # same text distribution in both classes, but 3x as many 'maj' docs:
    # a gram-neutral probe must fall to the larger prior
    rows = [(i, "cc cd dc", "maj") for i in range(30)]
    rows += [(100 + i, "cc cd dc", "min") for i in range(10)]
    train = _docs(spark, rows)
    r = text.langid_gate(_docs(spark, [(1, "cc cd dc", "maj")]), train).collect()[0]
    assert r["pred_lang"] == "maj"


def test_streaming_gate_equals_batch_apply(spark, sf_dir):
    """The 22nd topology's verdicts equal the batch scorer's on the
    same documents with the same offline model — stateless and
    batching-invariant by construction, checked end to end through a
    real streaming drain."""
    from pyspark.sql import functions as F

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.streaming import langid_gate_stream, read_documents_stream
    from gomrjob_spark.streaming.ops import run_to_memory

    train = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 250)
    row = text.langid_model(train)
    stream = read_documents_stream(spark, sf_dir).filter(F.col("doc_id") >= 250)
    q, name = run_to_memory(langid_gate_stream(stream, row), "append")
    try:
        got = sorted(map(tuple, spark.table(name).collect()))
    finally:
        q.stop()
    batch = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") >= 250)
    want = sorted(map(tuple, text.langid_apply(batch, row).collect()))
    assert got == want and got
