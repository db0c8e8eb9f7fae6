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

# Tier 1 (round 7): NEW r7 queries first (their first shot at a driver
# row), then the 18 late-r6 queries that were registered after the r6
# window filled and have NEVER had a driver CORRECTNESS row (r6 verdict
# item #1 — they pass the local parity suite, but the driver's hash row
# is the hard signal), then the LONGEST-UNVERIFIED backfill (last green
# row r01-r02).
_VERIFY_FIRST = [
    # NEW r7: BPE apply — corpus encoded with the trained merge table
    "text_bpe_encode",
    # NEW r7: token packing driven by REAL BPE counts (not regex proxy)
    "pack_bpe_batches",
    # NEW r7: mixture weights on REAL BPE token budgets
    "mixture_bpe_weights",
    # NEW r7: bigram LM perplexity gate (fixed-point log-prob)
    "text_ngram_perplexity",
    # NEW r7: trigram LM gate (3-level exact backoff ladder)
    "text_trigram_perplexity",
    # NEW r7: embedding-level decontamination (LSH bucket + cosine verify)
    "decontaminate_semantic",
    # NEW r7: arithmetic-coded JPEG (SOF9 QM coder) real decode
    "multimodal_arith_pixel_stats",
    # NEW r7: contrastive hard-negative mining (different-label top-k)
    "embedding_hard_negatives",
    # NEW r7: near-dup-leakage-proof train/val/test split
    "split_cluster_aware",
    # NEW r7: per-shard batch-utilization (padding waste) report
    "pack_efficiency_report",
    # NEW r7: exact fixed-point EWMA (recursive smoother under the gate)
    "timeseries_ewma",
    # late r6, never driver-proven (registered after the 50-slot window
    # filled; r6 verdict item #1 lists these 18 by name)
    "profile_key_skew",
    "graph_link_prediction",
    "embedding_dim_stats",
    "text_readability",
    "dedup_impact_report",
    "sample_weighted_per_source",
    "dedup_best_quality_survivors",
    "corpus_composition_report",
    "set_ops_all",
    "timeseries_mom_change",
    "revenue_share_hierarchy",
    "dataset_diff",
    "cohort_retention",
    "event_transitions",
    "timeseries_cusum_drift",
    "timeseries_autocorr",
    "burst_detection",
    "rolling_active_users",
    # longest-unverified backfill (last proven r01): the r6 rotation
    # re-proved agg_* .. join_anti; these are the next-oldest in line
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
    "set_ops",
    "text_fingerprint",
    "text_lang_id",
    "text_quality",
    "text_token_stats",
]

# next-oldest queries: first in line after the window above, and the
# head of the r08 rotation. Debt ledger (r6 verdict item #7): 40
# r01-r02 queries awaited re-proof entering r7; 28 rotate through the
# r7 window above, leaving these 12 for r8.
_BACKFILL = [
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
