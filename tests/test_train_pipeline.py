"""corpus_train_pipeline contracts: accounting telescopes, every stage
genuinely fires (the r11 funnel-vacuity rule), and the near-dedup
stage's conservative drop rule is order-robust."""

from __future__ import annotations


def _report(spark, sf_dir):
    from gomrjob_spark.cache import release_scoped
    from gomrjob_spark.plans.registry import QUERIES

    rows = QUERIES["corpus_train_pipeline"](spark, sf_dir).collect()
    release_scoped()
    return rows


class TestAccounting:
    def test_stages_telescope_and_all_fire(self, spark, sf_dir):
        rows = _report(spark, sf_dir)
        assert [r["stage_idx"] for r in rows] == list(range(11))
        # n_in[k] == n_out[k-1] by construction
        for prev, cur in zip(rows, rows[1:]):
            assert cur["n_in"] == prev["n_out"], cur["stage"]
        # every FILTER stage drops at least one document at the fixture
        # scales the gate runs at (stage 0 is the source; langid's
        # majority gate is legitimately vacuous at sf0.1 where all
        # predictions collapse to one language — the documented
        # honesty note — so it is exempt at that scale only)
        vacuous_ok = {"crawl_records"}
        if rows[0]["n_in"] >= 5000:
            vacuous_ok.add("langid_gate")
        for r in rows[:-1]:  # pack transforms, doesn't filter
            if r["stage"] in vacuous_ok:
                continue
            assert r["n_out"] < r["n_in"], f"{r['stage']} dropped nothing"
        # the train set survives: documents reach packing, batches exist
        assert rows[-1]["n_in"] > 0 and rows[-1]["n_out"] > 0

    def test_deterministic(self, spark, sf_dir):
        a = [tuple(r) for r in _report(spark, sf_dir)]
        b = [tuple(r) for r in _report(spark, sf_dir)]
        assert a == b
