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

# Tier 1 (round 6): queries whose PLAN changed this round go first so
# CORRECTNESS_r06 re-proves them, then the driver window (first 50
# registry entries) rotates to the LONGEST-UNVERIFIED queries — the 44
# oracle queries whose last green row is r01 plus the oldest r02 entry
# (the r5 verdict's #7: three rounds of plan drift since their proof).
_VERIFY_FIRST = [
    # NEW r6: exact Jaccard pairs via prefix filtering (ppjoin twin of LSH)
    "dedup_jaccard_prefix",
    # NEW r6: degree-oriented triangle counting
    "graph_triangles",
    # NEW r6: one-pass multi-column table profiling
    "profile_table_stats",
    # NEW r6: distributed BPE tokenizer training (iterative, hash-gated)
    "text_bpe_merges",
    # NEW r6: point-in-interval dim lookup without a nested-loop join
    "join_interval_lookup",
    # NEW r6: SymSpell deletion-neighborhood fuzzy join (token edit <= 1)
    "dedup_title_edit1",
    # NEW r6: deterministic weighted sampling
    "sample_weighted",
    # NEW r6: exact-integer z-score outlier audit
    "events_outlier_audit",
    # NEW r6: scalar-quantized search (hash-gated quantized metric)
    "knn_sq8",
    # NEW r6: distributed global ranking / decile binning
    "feature_decile_stats",
    # NEW r6: live outlier quarantine vs store-frozen moments
    "streaming_outlier_flags",
    # NEW r6: multi-channel entity-resolution composite (prefix-Jaccard
    # UNION title-edit1 -> connected components)
    "entity_resolution_pipeline",
    # NEW r6: time-weighted average (irregular-sampling TWAP)
    "timeseries_twap",
    # NEW r6: hypertable gap-fill + LOCF resampling (union + one window)
    "timeseries_gapfill_locf",
    # NEW r6: proximity (minimal-window) retrieval
    "search_proximity_topk",
    # NEW r6: nearest-centroid classifier + confusion matrix
    "embedding_centroid_confusion",
    # NEW r6: referential-integrity + functional-dependency audits
    "integrity_audit",
    "fd_audit",
    # NEW r6: market-basket association rules (fixed-point lift)
    "basket_rules",
    # NEW r6: robust MAD outlier audit
    "events_mad_audit",
    # NEW r6: sweep-line concurrency via distributed prefix sum
    "concurrency_profile",
    # NEW r6: SCD type-2 history build from a change log
    "scd2_build",
    # NEW r6: fixed-point PMI collocation mining
    "text_pmi_collocations",
    # NEW r6: directed n-gram containment (sub-document near-dup)
    "dedup_ngram_containment",
    # NEW r6: exact consecutive-run phrase retrieval
    "search_phrase_topk",
    # NEW r6: nearest-direction as-of join (two windows, one exchange)
    "join_asof_nearest",
    # NEW r6: streaming CDC apply (LWW merges into a plain-file dataset)
    "streaming_upsert_apply",
    # NEW r6: bloom runtime-prefiltered semi join (exact result)
    "join_semi_bloom",
    # NEW r6: linear quality-classifier gate (exact integer logit)
    "quality_model_gate",
    # NEW r6: perceptual-hash image dedup (real decode under the gate)
    "multimodal_phash_dedup",
    # NEW r6: live image-dedup admission (streaming decode + hash probe)
    "streaming_phash_admission",
    # NEW r6: audio contour-fingerprint dedup (real PCM decode)
    "multimodal_audio_fingerprint_dedup",
    # NEW r6: image near-dup pairs at Hamming <= 3 (generic banded join)
    "multimodal_phash_near_pairs",
    # NEW r6: video shot-boundary detection over decoded frame hashes
    "multimodal_scene_cuts",
    # NEW r6: fixed-point integer PageRank (iterative, hash-gated)
    "graph_pagerank",
    # plan changed r6: two-pass Misra-Gries (total fused into the MG
    # scan as per-partition marker rows)
    "heavy_hitter_tokens",
    # plan changed r6: persist-before-sampling-sort (+ spread for the
    # codec-heavy pair) — the r5 bench-drift fix
    "multimodal_pixel_stats",
    "multimodal_compressed_pixel_stats",
    "multimodal_progressive_pixel_stats",
    # topology changed r6: store derived offline, written, loaded back
    "streaming_near_dup_probe",
    # oldest proven (r01), verbatim re-proof rotation
    "agg_approx_distinct",
    "agg_conditional",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_rollup",
    "agg_stats",
    "dedup_exact",
    "distinct_pairs",
    "join_anti",
    "join_argmax",
    "join_full_outer",
    "join_left_outer",
    "join_range",
    "join_semi",
    "knn_bruteforce",
    "mr_field_count",
    "mr_multistep",
    "mr_python_reducer",
    "mr_sum_reducer",
    "multimodal_features",
    "multimodal_metadata",
    "pivot_event_types",
    "pivot_unpivot_roundtrip",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "q6_forecast_revenue",
    "scalar_array_map",
    "scalar_date",
    "scalar_json",
    "scalar_math",
    "scalar_string",
]

# next-oldest queries: first in line after the window above, and the
# head of the r07 rotation (the twelve r6-new entries displaced the
# last twelve r01/r02 rotation slots)
_BACKFILL = [
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
    "funnel_conversion",
    "multimodal_audio_headers",
    "multimodal_resize",
    "sample_hash_split",
    "text_stopword_strip",
    "udaf_weighted_avg",
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
