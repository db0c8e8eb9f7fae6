"""Query library. Importing this package populates the registry.

Registration order is significant: the correctness driver verifies the
first 50 registry entries against the DuckDB oracle. ``_reorder()`` puts
queries that most need a fresh driver-verified correctness row first
(never-yet-verified families, then anything new or changed this round),
keeps every oracle-eligible query ahead of the approximate rows-only
ones (which the driver can only rows-check), and preserves relative
registration order within each tier.
"""

from gomrjob_spark.plans.registry import ORACLES, QUERIES, query  # noqa: F401
from gomrjob_spark.plans import (  # noqa: F401,E402
    extras,
    llm,
    mr,
    relational,
    sqlapi,
    streaming,
    subqueries,
    timeseries,
    tpch,
)

# Tier 1 (round 8): the 14 NEW r8 queries first (their first shot at a
# driver row), then ALL 19 debt queries — every query whose newest
# green driver row is r01-r02 (the r7 verdict item #2 "zero the debt"
# list: 7 named + the 12-name r7 _BACKFILL) — then the longest-proven
# rotation (all 15 r03 rows + 2 of the 7 r04 rows) to fill the 50-slot
# window exactly; the five remaining r04 rows head _BACKFILL.
_VERIFY_FIRST = [
    # NEW r8: SemDeDup-style semantic diversity dedup (k-means cells +
    # within-cell cosine survivorship)
    "dedup_semantic_diversity",
    # NEW r8: unigram-LM (SentencePiece-style) tokenizer EM training
    "text_unigram_lm_train",
    # NEW r8: Viterbi encode against the trained unigram vocab
    "text_unigram_encode",
    # NEW r8: paragraph-grain containment dedup with doc-level rollup
    "dedup_paragraph_containment",
    # NEW r8 stretch: arithmetic LOSSLESS JPEG (SOF11) real decode
    "multimodal_lossless_pixel_stats",
    # NEW r8: DSIR hashed-ngram importance resampling
    "sample_dsir_importance",
    # NEW r8: Lee-et-al exact repeated 13-token-span dedup signal
    "dedup_repeated_ngram_spans",
    # NEW r8: live paragraph-containment admission (streaming twin)
    "streaming_paragraph_quarantine",
    # NEW r8: paragraph-grain MINHASH near-dup rollup (edited
    # boilerplate the exact-containment pass misses)
    "dedup_paragraph_minhash_rollup",
    # NEW r8: multi-signal per-doc triage table (quality + exact-dup +
    # containment + span signals composed into one keep verdict)
    "corpus_triage_report",
    # NEW r8: packing on REAL unigram piece counts (the loop closer)
    "pack_unigram_batches",
    # NEW r8: perplexity-ranked exact-decile curriculum buckets
    "curriculum_difficulty_buckets",
    # NEW r8: live DSIR admission gate (offline-trained weight model)
    "streaming_dsir_gate",
    # NEW r8: Gopher top-ngram character-coverage repetition signals
    "text_gopher_ngram_fractions",
    # debt: last driver-proven r01 (r7 verdict item #2)
    "scalar_math",
    "scalar_string",
    "set_ops",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
    "top_n_global",
    "udtf_sentences",
    "window_lag_lead",
    "window_rank_ntile",
    "window_running_total",
    "window_topk_per_group",
    # debt: last driver-proven r02
    "funnel_conversion",
    "multimodal_audio_headers",
    "multimodal_resize",
    "sample_hash_split",
    "text_stopword_strip",
    "udaf_weighted_avg",
    # longest-proven rotation: last green row r03
    "pack_token_batches",
    "agg_quantile_exact",
    "multimodal_audio_samples",
    "sample_stratified",
    "embedding_centroids",
    "quality_percentile_filter",
    "streaming_mr_sum",
    "dedup_incremental",
    "select_token_budget",
    "cap_per_source",
    "text_repetition_stats",
    "text_pii_scrub",
    "corpus_curation_pipeline",
    "dedup_repeated_chunks",
    "corpus_vocab_topk",
    # last green row r04
    "dedup_ngram_jaccard",
    "window_range_frame",
]

# next-oldest queries: first in line after the window above, and the
# head of the r09 rotation (last green row r05). Debt ledger: ZERO
# r01-r02 queries remain after the r8 window above — from r9 onward the
# invariant is "every registered query driver-green <= 3 rounds old".
_BACKFILL = [
    "text_chunks",
    "join_asof_forward",
    "decontaminate_ngrams",
    "streaming_incremental_dedup",
    "mix_weights_equal_tokens",
    "dedup_embedding_cosine",
    "q4_order_priority",
    "q7_volume_shipping",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "join_asof",
    "join_band_time",
    "sessionize_windows",
    "timeseries_rollup",
]


def _reorder() -> None:
    tier1 = [n for n in _VERIFY_FIRST if n in QUERIES]
    backfill = [n for n in _BACKFILL if n in QUERIES and n not in tier1]
    tier2 = [
        n for n in QUERIES if n not in tier1 and n not in backfill and n in ORACLES
    ]
    tier3 = [n for n in QUERIES if n not in tier1 and n not in ORACLES]
    for name in tier1 + backfill + tier2 + tier3:
        QUERIES[name] = QUERIES.pop(name)


_reorder()
