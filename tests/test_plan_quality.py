"""Physical-plan regression tests — the scale properties, pinned.

Correctness tests prove the answers match; these prove the *plans* stay
the ones that survive 100 TB: filters reach the parquet scan, projections
prune the read schema, dimension joins broadcast, band joins never fall
back to nested-loop, and aggregates keep map-side partial phases.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from gomrjob_spark import plans


def _plan(df) -> str:
    # the JVM explain string directly — NOT redirect_stdout around
    # df.explain(): stdout redirection is process-global, so the
    # threaded registry sweep below would cross-capture plans between
    # threads (observed: phantom BNLJ findings from a neighbor's plan)
    return df.sparkSession._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_q3_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(plans.QUERIES["q3_shipping_priority"](spark, sf_dir))
    # date + segment filters must reach the parquet scans
    assert "GreaterThan(l_shipdate" in plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan
    # lineitem scan must not read the full table width
    assert "l_returnflag" not in plan.split("ReadSchema")[1][:400]


def test_q3_no_cartesian_or_nested_loop(spark, sf_dir):
    plan = _plan(plans.QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q5_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(plans.QUERIES["q5_nation_revenue"](spark, sf_dir))
    # nation/region are always broadcast-sized
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_band_join_is_hash_join_not_bnlj(spark, sf_dir):
    plan = _plan(plans.QUERIES["join_band_time"](spark, sf_dir))
    # the whole point of the bucketed formulation
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q1_has_partial_aggregation(spark, sf_dir):
    plan = _plan(plans.QUERIES["q1_pricing_summary"](spark, sf_dir))
    # map-side partial agg (the reference's Combiner, automatic here):
    # two HashAggregate phases around one exchange
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_q1_whole_stage_codegen(spark, sf_dir):
    df = plans.QUERIES["q1_pricing_summary"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("codegen")
    # the scan->filter->project->partial-agg pipeline must be fused into
    # generated code, not interpreted row-at-a-time
    assert "WholeStageCodegen" in buf.getvalue()


def test_semi_join_for_exists(spark, sf_dir):
    plan = _plan(plans.QUERIES["q4_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_anti_join_for_not_in(spark, sf_dir):
    plan = _plan(plans.QUERIES["q16_parts_supplier"](spark, sf_dir))
    assert "LeftAnti" in plan


def test_minhash_shuffle_carries_hashes_not_text(spark, sf_dir):
    """The LSH candidate join's exchange must not carry document text."""
    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    plan = _plan(lsh_candidate_pairs(sigs, sig_len=64))
    # the join itself must be a hash/merge join on (band, bhash)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_embedding_dedup_bucketed_no_bnlj(spark, sf_dir):
    """The registered embedding-dedup path must be the bucketed one:
    candidates from an equi-join on (table_id, bucket), never an
    all-pairs nested-loop product (VERDICT r1 'What's wrong' #2)."""
    plan = _plan(plans.QUERIES["dedup_embedding_cosine"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q21_semi_anti_no_bnlj(spark, sf_dir):
    """The double-correlated EXISTS/NOT EXISTS must decorrelate to
    semi/anti hash or merge joins, never a nested-loop product."""
    plan = _plan(plans.QUERIES["q21_waiting_suppliers"](spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q8_q9_dims_broadcast(spark, sf_dir):
    """Every dimension side of the 8-table (q8) and 5-table (q9) stars
    broadcasts; the only shuffle joins are fact-fact."""
    for name in ("q8_market_share", "q9_product_profit"):
        plan = _plan(plans.QUERIES[name](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert "BroadcastHashJoin" in plan


def test_registry_wide_no_unapproved_nested_loop_joins(spark, sf_dir):
    """Sweep EVERY registered batch query's physical plan: a nested-loop
    or cartesian join may only appear where the build side is
    constant-sized by construction (global-scalar broadcasts in q11/q22,
    the 10-row query set in knn_bruteforce, the 16-row coarse quantizer
    in knn_ivf). Anything else is a data-sized product — the class of
    plan that dies at 100 TB — and fails this test."""
    ALLOWED_BNLJ = {
        "corpus_train_pipeline",    # the accounting join: a 1-row
                                    # counts frame x a 1-row packed-
                                    # batch-count frame; every doc-
                                    # sized join upstream is keyed and
                                    # the spine is checkpointed
        "url_registered_domain_psl",  # 1-row PSL rule-map broadcast
                                    # (3 lookup maps crossed onto the
                                    # scan; the decision is a row-local
                                    # suffix fold — zero shuffles)
        "q11_important_balances",   # 1-row global-total broadcast
        "q22_global_sales_opportunity",  # 1-row avg-balance broadcast
        "knn_bruteforce",           # |Q|=10 broadcast x corpus, by design
        "knn_ivf",                  # 16-row centroid quantizer broadcast
        "knn_ivf_kmeans",           # same quantizer broadcast, trained
        "knn_pq",                   # |Q|=10 ADC-table broadcast x codes scan
        "funnel_conversion",        # three 1-row stage-count broadcasts
        "search_bm25_topk",         # 1-row corpus-stats (N, avgdl) broadcast
        "join_semi_bloom",          # 1-row bloom bit-array broadcast (prefilter)
        "text_pmi_collocations",    # 1-row token-grand-total broadcast
        "join_interval_lookup",     # 1-row boundary-array broadcast; the
                                    # dim resolve itself is a hash join
                                    # (pinned in test_band_join)
        "text_bpe_merges",          # 1-row winning-pair broadcast per
                                    # BPE round (the merge fold reads it)
        "text_bpe_encode",          # same per-round winners + the 1-row
                                    # merge-TABLE broadcast bpe_apply
                                    # folds over (model-sized by def.)
        "text_byte_bpe_train",      # same 1-row winning-pair broadcast
                                    # per round (shared _bpe_round_loop)
        "text_byte_bpe_encode",     # same per-round winners + the
                                    # 1-row merge-table broadcast
                                    # byte_bpe_apply folds over
        "pack_bpe_batches",         # same (trains + applies, then the
                                    # pack's broadcast is an equi join)
        "mixture_bpe_weights",      # same
        "text_ngram_perplexity",    # 1-row token-grand-total broadcast
                                    # (the pmi_collocations class)
        "text_trigram_perplexity",  # same 1-row token-grand-total
                                    # broadcast (operators/text.py total
                                    # agg); identical class to the
                                    # bigram gate one entry up
        "text_unigram_lm_train",    # 1-row vocab-map broadcast per EM
                                    # round + the 1-row final-total
                                    # cost broadcast (model-sized by
                                    # definition — the bpe_encode class)
        "text_unigram_encode",      # same EM-round broadcasts + the
                                    # 1-row trained-vocab map the
                                    # encode fold reads
        "mix_weights_temperature",  # 1-row mixture-totals broadcast
                                    # (the q22 global-scalar class)
        "text_wordpiece_train",     # 1-row winning-pair broadcast per
                                    # WordPiece round (the
                                    # text_bpe_merges class)
        "text_wordpiece_encode",    # same per-round winners + the
                                    # 1-row vocab membership-map
                                    # broadcast the greedy fold reads
                                    # (model-sized by definition)
        "sample_dsir_importance",   # 1-row 0.8-percentile threshold
                                    # broadcast (the q22 class)
        "pack_unigram_batches",     # the unigram EM-round vocab-map
                                    # broadcasts + the pack's bucket-
                                    # offset broadcast (the
                                    # pack_bpe_batches class)
        "curriculum_difficulty_buckets",  # the perplexity gate's 1-row
                                    # token-grand-total broadcast + the
                                    # ranker's 1-row corpus-count
                                    # broadcast (both model-sized)
        "embedding_hard_negatives", # |Q|=10 broadcast x corpus scan —
                                    # the knn_bruteforce class, by design
        "feature_decile_stats",     # 1-row total-count broadcast
        "knn_sq8",                  # 1-row min/max model broadcast +
                                    # the |Q|=10 query broadcast (same
                                    # class as knn_bruteforce)
        "basket_rules",             # 1-row transaction-total broadcast
        "embedding_centroid_confusion",  # 1-row centroid-model broadcast
        "profile_key_skew",         # 1-row key-total broadcast onto the
                                    # post-limit 10-row frame
        "revenue_share_hierarchy",  # 1-row grand-total broadcast
        "corpus_composition_report",  # 1-row corpus-totals broadcast
        "text_langid_train",        # langs x vocab dense cross (model-
                                    # sized: L*V rows, charset-bounded)
                                    # + 1-row vocab-size broadcast
        "text_langid_gate",         # same training crosses + the 1-ROW
                                    # model broadcast (gram -> aligned
                                    # weight arrays) the row-local
                                    # scorer folds over
        "text_kn_perplexity",       # 1-row counts-of-counts discount
                                    # frames (3 levels) + the 1-row
                                    # level-1 globals crossed into the
                                    # model tables and the scored
                                    # stream (the q22 global-scalar
                                    # class; all plan-constant)
        "quality_perceptron_train", # 1-row weight vector crossed into
                                    # the cached feature frame per
                                    # round (the BPE winning-pair
                                    # device) + the 1-row delta fold
        "quality_perceptron_gate",  # same training crosses + the
                                    # final 1-row weight broadcast the
                                    # serving fold reads
    }
    STREAMING_OR_ITERATIVE = {
        "streaming_tumbling_agg", "streaming_sliding_counts",
        "streaming_session_window", "streaming_dedup_counts",
        "streaming_stateful_counts", "streaming_static_join",
        "streaming_interval_join",
        "streaming_replay_idempotent_sink",  # runs TWO full stream
                                    # cycles (kill + replay) at
                                    # construction; result plan is a
                                    # plain parquet read + one partial
                                    # agg
        "dedup_cluster_survivors",  # fixpoint loop runs at construction
        "entity_resolution_pipeline",  # same CC fixpoint at construction
        "dedup_best_quality_survivors",  # same CC fixpoint at construction
        "split_cluster_aware",      # same CC fixpoint at construction
    }
    # The sweep is py4j-BOUND (query construction is thousands of
    # driver round trips per builder-heavy family; plan generation is
    # JVM-side), so Python threads overlap it well — the sweep wall
    # clock dropped ~4x with 8 workers (r15, the driver-pytest-budget
    # item). Construction is plan-only for every non-iterative query
    # (the iterative ones are skipped above), and the offender check
    # is a pure string scan, so concurrency changes nothing observable.
    from concurrent.futures import ThreadPoolExecutor

    def check(item):
        name, fn = item
        plan = _plan(fn(spark, sf_dir))
        bad = []
        if "CartesianProduct" in plan:
            bad.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOWED_BNLJ:
            bad.append("BroadcastNestedLoopJoin")
        return name, bad

    items = [
        (n, f) for n, f in plans.QUERIES.items()
        if n not in STREAMING_OR_ITERATIVE
    ]
    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(check, items))
    offenders = {name: bad for name, bad in results if bad}
    assert not offenders, f"data-sized join products found: {offenders}"


def test_search_queries_broadcast_terms_two_phase_topk(spark, sf_dir):
    """Inverted-index retrieval at scale: the query-term set joins the
    token stream as a BROADCAST hash join (pruning before the posting
    agg shuffle), and the final ranking is cap_per_group's two-phase
    shape — a (query_id, partition-id) local window before the global
    per-query window, so a hot query never routes the whole scored
    frame through one task."""
    import re

    for name in ("search_tf_topk", "search_bm25_topk"):
        plan = _plan(plans.QUERIES[name](spark, sf_dir))
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
        # phase-1 local rank spec carries _pid next to query_id
        assert re.search(r"windowspecdefinition\(query_id#\d+, _pid#\d+", plan), name
        # the token stream must never sort-merge against the tiny
        # query set: every SortMergeJoin key should be doc_id-shaped
        for frag in plan.split("SortMergeJoin")[1:]:
            assert "term" not in frag[:80], (name, frag[:120])


def test_chunk_and_split_operators_shuffle_free(spark, sf_dir):
    """Chunking and hash-split are scan projections: their operator plans
    must contain NO exchange at all (the registered queries add one only
    for the oracle's deterministic ORDER BY)."""
    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators.sampling import hash_split
    from gomrjob_spark.operators.text import chunk_text

    docs = load_table(spark, sf_dir, "documents")
    assert "Exchange" not in _plan(chunk_text(docs))
    assert "Exchange" not in _plan(hash_split(docs))


def test_embedding_dedup_pair_dedup_is_shuffle_free(spark, sf_dir):
    """The packed-signature first-match dedup removed the distinct()
    exchange over the candidate stream: the whole plan must contain no
    aggregate at all (bucket join + filters + vector joins only)."""
    plan = _plan(plans.QUERIES["dedup_embedding_cosine"](spark, sf_dir))
    assert "HashAggregate" not in plan
    assert "ObjectHashAggregate" not in plan


def test_q2_q20_supply_rollup_partial_agg_and_broadcasts(spark, sf_dir):
    """The derived supply relation keeps map-side partial aggregation,
    and the dimension sides broadcast."""
    for name in ("q2_min_cost_supplier", "q20_potential_promotion"):
        plan = _plan(plans.QUERIES[name](spark, sf_dir))
        assert plan.count("HashAggregate") >= 2, name
        assert "BroadcastHashJoin" in plan, name


def test_window_range_frame_single_data_shuffle(spark, sf_dir):
    """One hash exchange on the partition key; the only other exchange
    is the final presentation sort."""
    plan = _plan(plans.QUERIES["window_range_frame"](spark, sf_dir))
    assert plan.count("hashpartitioning(") == 1
    assert plan.count("rangepartitioning(") == 1  # the output ORDER BY


def test_pack_no_single_task_window_over_full_shard(spark, sf_dir):
    """The r2 skew fix, pinned: the data-sized window cumsum must be
    partitioned by (shard, _pack_bucket) — a windowspec partitioned by
    the shard alone and ordered by doc_id would make the dominant shard
    one sequential task at 100 TB. The tiny bucket-offset frame joins
    back via broadcast, never a shuffle of the data side."""
    import re

    plan = _plan(plans.QUERIES["pack_token_batches"](spark, sf_dir))
    # the big cumsum: partition spec carries the hash bucket
    assert re.search(r"windowspecdefinition\(lang#\d+, _pack_bucket#\d+, doc_id#\d+L? ASC", plan)
    # the forbidden shape: full-shard history in one task
    assert not re.search(r"windowspecdefinition\(lang#\d+, doc_id#\d+L? ASC", plan)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_cap_per_source_two_phase_rank(spark, sf_dir):
    """The skew-safe cap, pinned: the first (data-sized) rank must be
    partitioned by (source, scan-partition-id) — a single windowspec
    over the source alone before the prune would rank the hottest
    domain in one task at 100 TB. The global rank then runs over the
    pruned <= k x partitions survivors."""
    import re

    plan = _plan(plans.QUERIES["cap_per_source"](spark, sf_dir))
    # phase 1 spec carries the partition id next to the group key
    assert re.search(r"windowspecdefinition\(source#\d+, _pid#\d+", plan)
    # and the final global rank exists (source-only spec, post-prune)
    assert re.search(r"windowspecdefinition\(source#\d+, n_chars#\d+", plan)
    assert "CartesianProduct" not in plan


def test_decontaminate_benchmark_side_broadcast(spark, sf_dir):
    """The corpus stream must be probed by a broadcast of the (tiny)
    benchmark shingle set, never shuffled against it with a sort-merge
    join — and never a nested loop."""
    plan = _plan(plans.QUERIES["decontaminate_ngrams"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pii_scrub_shuffle_free_scan_projection(spark, sf_dir):
    """Redaction is a scan-side projection: no exchange except the
    presentation ORDER BY."""
    plan = _plan(plans.QUERIES["text_pii_scrub"](spark, sf_dir))
    assert plan.count("hashpartitioning(") == 0
    assert plan.count("rangepartitioning(") == 1


def test_repetition_stats_single_scan_no_join(spark, sf_dir):
    """The bigram stats ride along through the token explode: one corpus
    scan, no join-of-two-branches (which would read and re-tokenize the
    text twice)."""
    plan = _plan(plans.QUERIES["text_repetition_stats"](spark, sf_dir))
    assert "Join" not in plan
    # formatted explain lists each node twice (tree + details)
    assert plan.count("Scan parquet") <= 2


def test_span_removal_ids_only_no_pairs(spark, sf_dir):
    """dedup_span_removal: winner selection is ONE partial aggregation
    over the window fingerprints (map-side partial + final around one
    exchange) and the splice path joins ids/positions only — no pair
    materialization, no nested-loop fallback, so no quadratic regime
    exists even on fully-replicated fixtures."""
    plan = _plan(plans.QUERIES["dedup_span_removal"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("HashAggregate") >= 2


def test_lsh_candidate_pair_dedup_is_shuffle_free(spark, sf_dir):
    """r3 fix, pinned: the candidate-pair stream out of the band join
    must NOT end in a distinct() — the first-shared-band filter dedups
    map-side. The only aggregate exchanges in the candidate plan are the
    signature groupBy itself; a Deduplicate/distinct over (id_a, id_b)
    would re-shuffle the quadratic hot-bucket blowup."""
    import re

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    plan = _plan(lsh_candidate_pairs(sigs, sig_len=64))
    # exactly the two signature-aggregate HashAggregates (partial+final),
    # none over the post-join pair stream
    assert re.search(r"HashAggregate.*id_a", plan) is None
    assert plan.count("hashpartitioning(") <= 2  # sig agg + band join keys


def test_minhash_md5_pair_dedup_is_shuffle_free(spark, sf_dir):
    """Same pin for the oracle-gated md5 twin: no distinct over the
    candidate pairs; pair dedup is the raw-slice first-match filter."""
    import re

    plan = _plan(plans.QUERIES["dedup_minhash_md5"](spark, sf_dir))
    assert re.search(r"HashAggregate[^\n]*\[id_a[^\n]*id_b[^\n]*\],\s*\[id_a", plan) is None


def test_simhash_pair_dedup_is_shuffle_free(spark, sf_dir):
    """r5: the last candidate-pair distinct() in the dedup family is
    gone — simhash_pairs dedups multi-band collisions with the
    first-shared-band XOR test map-side. The only aggregate in the plan
    is the signature groupBy (bit votes); nothing aggregates over
    (id_a, id_b)."""
    import re

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators.dedup import simhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    plan = _plan(simhash_pairs(docs, max_hamming=3))
    assert re.search(r"HashAggregate[^\n]*\[id_a[^\n]*id_b[^\n]*\],\s*\[id_a", plan) is None
    assert "Deduplicate" not in plan


def test_operator_scoped_caches_released_between_queries(spark, sf_dir):
    """Back-to-back persisted-operator queries + release_scoped leave no
    lingering cached relations (the r03 bench-drift leak, closed)."""
    from gomrjob_spark.cache import release_scoped

    # other test modules cache fixture tables in this shared session;
    # establish a clean baseline so the assertion measures OUR lifecycle
    release_scoped()
    spark.catalog.clearCache()
    for name in ("dedup_minhash_md5", "dedup_ngram_jaccard"):
        plans.QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        released = release_scoped()
        assert released >= 1, name
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pq_seed_rank_is_two_phase_bounded(spark, sf_dir):
    """r5 verdict #1, pinned: pq_train's seed pick must never funnel
    the full posexploded training frame into m sub-keyed sort tasks.
    Phase 1 ranks within (sub, scan-partition-id) — every sort task is
    bounded — and the sub-only global re-rank runs over the pruned
    <= n_centroids x partitions survivors (cap_per_group's shape, same
    pin as test_cap_per_source_two_phase_rank)."""
    import re

    from pyspark.sql import functions as F

    from gomrjob_spark.catalog import load_table
    from gomrjob_spark.operators.similarity import pq_seed_frame

    emb = load_table(spark, sf_dir, "embeddings")
    subs = F.array(*[F.slice(F.col("embedding"), s * 8 + 1, 8) for s in range(8)])
    frame = emb.select(F.col("vec_id"), F.posexplode(subs).alias("sub", "v"))
    plan = _plan(pq_seed_frame(frame, 16, "vec_id"))
    # phase 1 spec carries the scan partition id next to the sub key
    assert re.search(r"windowspecdefinition\(sub#\d+, _pid#\d+", plan)
    # exactly one sub-only spec remains: the post-prune global re-rank
    assert len(re.findall(r"windowspecdefinition\(sub#\d+, _h#\d+", plan)) == 1


def test_profile_stats_single_expand_single_pass(spark, sf_dir):
    """profile_table_stats' contract is ONE scan + ONE Expand-fed
    aggregation for all five exact distincts — five separate scans (the
    oracle's shape) or per-column jobs would break the 100 TB story."""
    import re

    plan = _plan(plans.QUERIES["profile_table_stats"](spark, sf_dir))
    # formatted plans print each node once in the tree and once in the
    # details — count distinct node ids, not text occurrences
    expands = set(re.findall(r"\(\d+\) Expand", plan))
    scans = set(re.findall(r"\(\d+\) Scan parquet", plan))
    assert len(expands) == 1, sorted(expands)
    assert len(scans) == 1, sorted(scans)


def test_distributed_rank_offset_window_is_bounded(spark, sf_dir):
    """The sweep-line/ranking family's only unpartitioned window runs
    over per-partition totals (#partitions rows), never the data: the
    frame feeding it must be an aggregate, pinned by checking the
    unpartitioned window sits above a HashAggregate, not a scan."""
    import re

    plan = _plan(plans.QUERIES["feature_decile_stats"](spark, sf_dir))
    # exactly one unpartitioned running-total window (the offsets step)
    # appears; the per-partition local window specifies _pid
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    unpartitioned = [s for s in specs if "_pid" not in s and "specifiedwindowframe" in s]
    partitioned = [s for s in specs if "_pid" in s]
    assert partitioned, "local per-partition window missing"
    assert len(unpartitioned) <= 1, unpartitioned


def test_decontaminate_semantic_corpus_never_shuffled(spark, sf_dir):
    """The r7 semantic decontamination contract: the corpus embedding
    stream is probed in place by a BROADCAST of the bucketed benchmark
    side and the only hash exchange in the whole plan is the flagged
    ids+scalars aggregate; survivors come from a broadcast anti-join.
    No sort-merge join, no nested loop, no corpus exchange."""
    plan = _plan(plans.QUERIES["decontaminate_semantic"](spark, sf_dir))
    assert plan.count("hashpartitioning(") == 1  # flagged partial agg only
    assert plan.count("rangepartitioning(") == 1  # presentation ORDER BY
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
