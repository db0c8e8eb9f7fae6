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
    web,
)

# Tier 1 (round 10): the 8 NEW r10 queries first (their first shot at
# a driver row), then ALL 14 names the r9 _BACKFILL carried (last
# green row r05 — the r9 verdict's item #2 rotation, each re-proven by
# the builder's own simulation in r9 AND r10), then the oldest 28 of
# the r06 rows (alphabetical — all 50 r06 rows are equally old under
# the OLDEST-ALWAYS-NEXT policy). The 22 r06 rows that didn't fit head
# the r11 _BACKFILL.
_VERIFY_FIRST = [
    # NEW r10: char-bigram NB language-ID training (dense model table)
    "text_langid_train",
    # NEW r10: language-ID admission gate (1-row broadcast scorer)
    "text_langid_gate",
    # NEW r10: Bloom dedup admission gate (21st streaming topology)
    "streaming_bloom_dedup_gate",
    # NEW r10: duplication-aware soft reweighting + weighted draw
    "sample_softdedup_weights",
    # NEW r10: differential progressive JPEG pyramids (SOF6/14)
    "multimodal_hierarchical_prog_stats",
    # NEW r10 stretch: multi-component (color) DCT pyramids
    "multimodal_hierarchical_color_stats",
    # NEW r10: live language-ID admission (22nd streaming topology)
    "streaming_langid_gate",
    # NEW r10 stretch 2: subsampled interleaved lossless JPEG scans
    "multimodal_lossless_subsampled_stats",
    # r9 _BACKFILL rotation: last green row r05
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
    # longest-proven fill: the oldest 28 of the r06 rows (alphabetical)
    "agg_approx_distinct",
    "agg_conditional",
    "agg_cube",
    "agg_grouping_sets",
    "agg_having",
    "agg_rollup",
    "agg_stats",
    "basket_rules",
    "concurrency_profile",
    "dedup_exact",
    "dedup_jaccard_prefix",
    "dedup_ngram_containment",
    "dedup_title_edit1",
    "distinct_pairs",
    "embedding_centroid_confusion",
    "entity_resolution_pipeline",
    "events_mad_audit",
    "events_outlier_audit",
    "fd_audit",
    "feature_decile_stats",
    "graph_pagerank",
    "graph_triangles",
    "heavy_hitter_tokens",
    "integrity_audit",
    "join_anti",
    "join_asof_nearest",
    "join_interval_lookup",
    "join_semi_bloom",
]

# next-oldest queries: first in line after the window above, and the
# head of the r11 rotation (last green row r06; everything else is
# r07+). Ledger note: after CORRECTNESS_r10 lands the oldest oracled
# driver row anywhere in the registry is r06 for exactly these 22
# names — the OLDEST-ALWAYS-NEXT cadence (SCALING.md round-9/10
# ledgers) at the current registry size.
_BACKFILL = [
    "knn_sq8",
    "multimodal_audio_fingerprint_dedup",
    "multimodal_compressed_pixel_stats",
    "multimodal_phash_dedup",
    "multimodal_phash_near_pairs",
    "multimodal_pixel_stats",
    "multimodal_progressive_pixel_stats",
    "multimodal_scene_cuts",
    "profile_table_stats",
    "quality_model_gate",
    "sample_weighted",
    "scd2_build",
    "search_phrase_topk",
    "search_proximity_topk",
    "streaming_near_dup_probe",
    "streaming_outlier_flags",
    "streaming_phash_admission",
    "streaming_upsert_apply",
    "text_bpe_merges",
    "text_pmi_collocations",
    "timeseries_gapfill_locf",
    "timeseries_twap",
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
