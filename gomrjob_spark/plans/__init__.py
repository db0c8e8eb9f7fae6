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

# Tier 1 (round 9): the 6 NEW r9 queries first (their first shot at a
# driver row), then ALL 21 names the r8 _BACKFILL carried (last green
# row r04-r05 — the r8 verdict's item #2 rotation), then the oldest 23
# of the remaining r05 rows to fill the 50-slot window exactly. The 8
# r05 rows that didn't fit head the r10 _BACKFILL.
_VERIFY_FIRST = [
    # NEW r9: exact-substring REMOVAL rewrite (Lee et al. ExactSubstr —
    # emits the cleaned corpus, hash gate pins the rewritten text)
    "dedup_span_removal",
    # NEW r9: WordPiece likelihood-scored merge training
    "text_wordpiece_train",
    # NEW r9: greedy longest-match-first WordPiece encode (+[UNK])
    "text_wordpiece_encode",
    # NEW r9: live SemDeDup admission gate (19th streaming topology)
    "streaming_semdedup_gate",
    # NEW r9: LAION-style cross-modal (image, caption) pair filtering
    "multimodal_caption_alignment",
    # NEW r9: Gopher duplicate-ngram character coverage (position-union)
    "text_dup_ngram_coverage",
    # NEW r9 stretch: hierarchical (Annex J) lossless-pyramid JPEG decode
    "multimodal_hierarchical_pixel_stats",
    # NEW r9: cross-source span-overlap contamination matrix
    "dedup_cross_source_overlap",
    # NEW r9: live tokenizer-drift monitor (20th streaming topology)
    "streaming_wordpiece_drift",
    # NEW r9: temperature-0.5 mixture shares (exact integer sqrt)
    "mix_weights_temperature",
    # NEW r9: surgical decontamination (benchmark spans excised)
    "decontaminate_span_scrub",
    # NEW r9 stretch 2: differential sequential DCT pyramids (SOF5/13)
    "multimodal_hierarchical_dct_stats",
    # r8 _BACKFILL rotation: last green row r04
    "text_chunks",
    "join_asof_forward",
    "decontaminate_ngrams",
    "streaming_incremental_dedup",
    "mix_weights_equal_tokens",
    # r8 _BACKFILL rotation: last green row r05
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
    # longest-proven fill: the oldest 23 of the remaining r05 rows
    "dedup_minhash_md5",
    "dedup_embedding_cosine_rp",
    "dedup_embedding_cosine_lowsim",
    "dedup_cluster_survivors",
    "corpus_clean_filter",
    "knn_axis_lsh",
    "text_winnow_fingerprint",
    "multimodal_decode_headers",
    "multimodal_frame_sample",
    "search_tf_topk",
    "search_bm25_topk",
    "text_bigram_novelty",
    "mr_combiner",
    "case_when_bucketing",
    "sql_passthrough_topn_revenue",
    "streaming_tumbling_agg",
    "streaming_sliding_counts",
]

# next-oldest queries: first in line after the window above, and the
# head of the r10 rotation (last green row r05; everything else is
# r06+). Ledger note: the oldest driver row after the r9 window is r05
# for these 8 names — the ">= every query re-proven within the last 4
# windows" cadence a 211-query registry sustains with a 50-slot window.
_BACKFILL = [
    "streaming_session_window",
    "streaming_dedup_counts",
    "streaming_stateful_counts",
    "streaming_static_join",
    "streaming_interval_join",
    "streaming_search_score",
    "q11_important_balances",
    "q21_waiting_suppliers",
    "session_window_batch",
    "q8_market_share",
    "q9_product_profit",
    "q2_min_cost_supplier",
    "q20_potential_promotion",
    "q12_priority_lines",
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
