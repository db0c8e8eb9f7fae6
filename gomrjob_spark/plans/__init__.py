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

# Tier 1 (round 5): every query whose plan changed this round goes
# first so CORRECTNESS_r05 re-proves it (driver checks the first 50
# registry entries each round); the rest of the window backfills with
# already-green queries (cheap re-confirmation).
_VERIFY_FIRST = [
    # REDEFINED r5: production threshold (0.95) over corpus + sign-flip
    # twins, (k, L) derived from count(*) via auto_lsh_params on BOTH
    # engines (the r4 verdict's #1) — bucket-array representation
    # replaced the packed 63-bit signature
    "dedup_embedding_cosine",
    # NEW r5: the r1-r4 0.4-threshold workload under its old
    # fixture-calibrated (3,16), renamed
    "dedup_embedding_cosine_lowsim",
    # plan changed r5: ids-only persisted store banding + second
    # candidate join for verification (r4 verdict #2)
    "streaming_near_dup_probe",
    # NEW r5: random-hyperplane LSH dedup (depth unbounded by dim),
    # integer-exact sign tests under the hash gate
    "dedup_embedding_cosine_rp",
    # NEW r5: progressive-JPEG (SOF2 scan scripts) + 16-bit/Adam7/
    # 4-bit-palette PNG decode, all bit-exact under one hash gate
    "multimodal_progressive_pixel_stats",
    # NEW r5: inverted-index retrieval — exact-integer TF and
    # fixed-point BM25 top-k (idf via bit-length, integer DIV parity)
    "search_tf_topk",
    "search_bm25_topk",
    # NEW r5: live retrieval tagging — stream docs scored row-locally
    # against the store-frozen BM25 index model, full topology gated
    "streaming_search_score",
    # NEW r5: corpus-novelty scoring — big-big bigram-keyed semi-join
    # vs a data-sized reference (exact counts + one IEEE division)
    "text_bigram_novelty",
    # NEW r5: exact bounded-memory heavy hitters (2-pass Misra-Gries);
    # oracle is a plain GROUP BY/HAVING — the sketch is execution only
    "heavy_hitter_tokens",
]

# r1/r2-era ordering, kept as the backfill sequence for the rest of the
# driver window (all of these already have a green row in r01 or r02).
_BACKFILL = [
    # TPC-H family missed by the r01 window
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
    # timeseries family missed by the r01 window
    "join_asof",
    "join_band_time",
    "sessionize_windows",
    "timeseries_rollup",
    "session_window_batch",
    # streaming family missed by the r01 window
    "streaming_tumbling_agg",
    "streaming_sliding_counts",
    "streaming_session_window",
    "streaming_dedup_counts",
    "streaming_stateful_counts",
    # relational stragglers missed by the r01 window
    "case_when_bucketing",
    # changed this round: now the LSH-bucketed scale-safe plan
    "dedup_embedding_cosine",
    # new this round
    "mr_combiner",
    "multimodal_decode_headers",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_balances",
    "q12_priority_lines",
    "q21_waiting_suppliers",
    "streaming_static_join",
    "streaming_interval_join",
    "multimodal_frame_sample",
    "knn_axis_lsh",
    "sql_passthrough_topn_revenue",
    "dedup_cluster_survivors",
    "corpus_clean_filter",
    "text_winnow_fingerprint",
    "dedup_minhash_md5",
    # new/changed this round (2, continued): the last two TPC-H shapes
    # and the de-vacuized q7/q22 predicates
    "q2_min_cost_supplier",
    "q20_potential_promotion",
    "window_range_frame",
    "text_chunks",
    "sample_hash_split",
    "text_stopword_strip",
    "udaf_weighted_avg",
    "join_asof_forward",
    "multimodal_resize",
    "multimodal_audio_headers",
    "funnel_conversion",
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
