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

# Tier 1 (round 13): the 4 NEW r13 queries, then the 4 re-verify-after-
# change rows (dedup_semantic_diversity and streaming_semdedup_gate were
# RE-PLANNED this round — the hierarchical two-level quantizer replaced
# the flat Lloyd assignment on both engines; sitemap_frontier's
# parse_entries grew full-range priority parsing; multimodal_mp3_metadata
# gained the mixed-rate raise), then the 15 remaining r07 rows
# (OLDEST-ALWAYS-NEXT, heading last round's _BACKFILL), then the first
# 25 of the 50 equally-oldest r08 rows (alphabetical;
# dedup_semantic_diversity is both re-planned AND r08-oldest, counted
# once) — exactly filling the 50-slot window. The remaining 22 r08 rows
# head _BACKFILL for r14.
_VERIFY_FIRST = [
    # NEW r13: MP4/ISO-BMFF box walk (stsz/stsc/stco table-driven)
    "multimodal_mp4_frames",
    # NEW r13: CC-faithful CDX (per-record gzip members, compressed offsets)
    "warc_cdx_member_index",
    # NEW r13: exact PSL registrable domains through the driver gate
    "url_registered_domain_psl",
    # NEW r13: robots Sitemap: -> sitemapindex -> children -> gated frontier
    "sitemap_discovery",
    # NEW r13 (late): member-compressed WARC ingestion as the 32nd live
    # topology — displaces select_token_budget to _BACKFILL head
    "streaming_warc_member_source",
    # NEW r13 (late): fragmented MP4 (moof/trun) walk — displaces
    # scalar_string to _BACKFILL head
    "multimodal_mp4_fragments",
    # RE-PLANNED r13: hierarchical two-level SemDeDup quantizer (the
    # r12 64x-probe remediation; oracle + operator changed together)
    "dedup_semantic_diversity",
    "streaming_semdedup_gate",
    # changed r13: full-spec-range priority parsing (r12 advisor #3)
    "sitemap_frontier",
    # changed r13: mixed-sample-rate raise (r12 advisor #2)
    "multimodal_mp3_metadata",
    # oldest rows (last green r07) — the 15 that r12's window could not
    # hold, completing the r07 generation
    "rolling_active_users",
    "sample_weighted_per_source",
    "scalar_array_map",
    "scalar_date",
    "scalar_json",
    "set_ops_all",
    "split_cluster_aware",
    "text_bpe_encode",
    "text_ngram_perplexity",
    "text_readability",
    "text_trigram_perplexity",
    "timeseries_autocorr",
    "timeseries_cusum_drift",
    "timeseries_ewma",
    "timeseries_mom_change",
    # next-oldest (last green r08), alphabetical, first 25 (sans the
    # re-planned dedup_semantic_diversity above)
    "agg_quantile_exact",
    "cap_per_source",
    "corpus_curation_pipeline",
    "corpus_triage_report",
    "corpus_vocab_topk",
    "curriculum_difficulty_buckets",
    "dedup_incremental",
    "dedup_ngram_jaccard",
    "dedup_paragraph_containment",
    "dedup_paragraph_minhash_rollup",
    "dedup_repeated_chunks",
    "dedup_repeated_ngram_spans",
    "embedding_centroids",
    "funnel_conversion",
    "multimodal_audio_headers",
    "multimodal_audio_samples",
    "multimodal_lossless_pixel_stats",
    "multimodal_resize",
    "pack_token_batches",
    "pack_unigram_batches",
    "quality_percentile_filter",
    "sample_dsir_importance",
    "sample_hash_split",
    "sample_stratified",
    "scalar_math",
]
# next-oldest queries: the 23 r08 rows (+select_token_budget) the 50-slot window could not
# hold this round — they head the r14 rotation (OLDEST-ALWAYS-NEXT,
# SCALING.md ledger), followed by the r09 rows as they age out.
_BACKFILL = [
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
