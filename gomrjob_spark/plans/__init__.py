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
    html,
    llm,
    mr,
    relational,
    sqlapi,
    streaming,
    subqueries,
    timeseries,
    tpch,
    web,
)

# Tier 1 (round 14, the r13 verdict's item #2): FIRST the three queries
# re-planned in r13 AFTER the window rotated — they have judge-sim
# green but no driver-verified row since the re-plan, and a query whose
# oracle text changed must never skip a driver round
# (dedup_embedding_cosine_rp: plan AND oracle changed, occupancy 64->8;
# graph_pagerank + url_domain_pagerank: the wave-3 persist/checkpoint
# fix). Then the 4 NEW r14 queries, then the 5 changed-this-round
# re-verifies (the A1 left-join fallback changed the semdedup oracles
# on both engines; knn_lsh was re-planned to house rules; the A2
# priority-regex tightening touched both sitemap parses), then the 24
# r08 rows that headed _BACKFILL (completing the r08 generation), then
# the 14 alphabetically-first r09 rows — exactly filling the 50-slot
# window. knn_axis_lsh (displaced late by the wave-4 probe-catch
# re-verify) plus the remaining 34 r09 rows head _BACKFILL for r15
# (OLDEST-ALWAYS-NEXT, SCALING.md ledger).
_VERIFY_FIRST = [
    # re-planned r13, not yet window-verified (r13 verdict item #2)
    "dedup_embedding_cosine_rp",
    "graph_pagerank",
    "url_domain_pagerank",
    # NEW r14: mixed plain/gz sitemap discovery (two-member gz decode)
    "sitemap_discovery_gz",
    # NEW r14: WARC revisit resolution (CC URL-dedup semantics)
    "warc_revisit_resolve",
    # NEW r14: SURT-ordered CDXJ rendering of the member CDX
    "warc_cdx_cdxj",
    # NEW r14: stss keyframe-only extraction
    "multimodal_mp4_keyframes",
    # NEW r14 (late): edts/elst presentation timing — displaces
    # join_band_time to the _BACKFILL head
    "multimodal_mp4_edit_timing",
    # changed r14: the A1 empty-coarse-cell fallback rewrote the fine
    # argmax join + oracle on both engines
    "dedup_semantic_diversity",
    "streaming_semdedup_gate",
    # (knn_lsh was also re-planned this round, but it is rows-only —
    # the window discipline keeps oracle-eligible rows first; its
    # re-plan is gated by the pytest recall test and the full-registry
    # sim's rows-check)
    # changed r14: priority regex tightened to the spec cap (A2)
    "sitemap_frontier",
    "sitemap_discovery",
    # changed r14 (late): the wave-4 probe catch — survivorship pair
    # stage re-planned with the stop-shingle cap, oracle mirrored
    # (dedup_cluster_survivors is already in the r09 block below);
    # the two exact-pair siblings took the same cap + mirror
    # preemptively (same sum(f^2) term), so they re-verify too
    "split_cluster_aware",
    "dedup_ngram_jaccard",
    "dedup_ngram_containment",
    # the 24 r08 rows the r13 window could not hold (last green r08)
    "scalar_string",
    "select_token_budget",
    "set_ops",
    "streaming_dsir_gate",
    "streaming_mr_sum",
    "streaming_paragraph_quarantine",
    "text_fingerprint",
    "text_gopher_ngram_fractions",
    "text_lang_id",
    "text_pii_scrub",
    "text_quality",
    "text_repetition_stats",
    "text_stopword_strip",
    "text_token_stats",
    "text_unigram_encode",
    "text_unigram_lm_train",
    "top_n_global",
    "udaf_weighted_avg",
    "udtf_sentences",
    "window_lag_lead",
    "window_range_frame",
    "window_rank_ntile",
    "window_running_total",
    "window_topk_per_group",
    # next-oldest (last green r09), alphabetical, first 14 (sans the
    # re-planned/changed rows already above)
    "case_when_bucketing",
    "corpus_clean_filter",
    "decontaminate_ngrams",
    "decontaminate_span_scrub",
    "dedup_cluster_survivors",
    "dedup_cross_source_overlap",
    "dedup_embedding_cosine",
    "dedup_embedding_cosine_lowsim",
    "dedup_minhash_md5",
    "dedup_span_removal",
    "join_asof",
]
# next-oldest queries: knn_axis_lsh + the 34 remaining r09 rows — they head the r15
# rotation (OLDEST-ALWAYS-NEXT, SCALING.md ledger), followed by the
# r10 generation as it ages out.
_BACKFILL = [
    # displaced from the r14 window late (the wave-4 probe-catch
    # re-verifies and the edts query) — they head the r15 rotation
    "join_asof_forward",
    "join_band_time",
    "knn_axis_lsh",
    "mix_weights_equal_tokens",
    "mix_weights_temperature",
    "mr_combiner",
    "multimodal_caption_alignment",
    "multimodal_decode_headers",
    "multimodal_frame_sample",
    "multimodal_hierarchical_dct_stats",
    "multimodal_hierarchical_pixel_stats",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_parts_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customer",
    "q19_discounted_revenue",
    "q22_global_sales_opportunity",
    "q4_order_priority",
    "q7_volume_shipping",
    "search_bm25_topk",
    "search_tf_topk",
    "sessionize_windows",
    "sql_passthrough_topn_revenue",
    "streaming_incremental_dedup",
    "streaming_sliding_counts",
    "streaming_tumbling_agg",
    "streaming_wordpiece_drift",
    "text_bigram_novelty",
    "text_chunks",
    "text_dup_ngram_coverage",
    "text_winnow_fingerprint",
    "text_wordpiece_encode",
    "text_wordpiece_train",
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
