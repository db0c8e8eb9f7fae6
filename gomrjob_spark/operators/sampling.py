"""Deterministic hash-based sampling and dataset splitting.

A 100 TB training pipeline cannot use ``rand()`` for train/val/test
splits or downsampling: the assignment must be reproducible across
reruns, stable under repartitioning, and consistent between engines
(the label a row gets today is the label it has forever). The standard
answer is content-addressed bucketing — hash a stable id into B buckets
and split on bucket ranges.

The hash is the md5 hex prefix (same cross-engine-reproducible idiom as
dedup.minhash_md5_dedup_pairs): any SQL engine computes the identical
bucket, so the split itself sits under the full DuckDB oracle gate
(``sample_hash_split``). Salting the id decorrelates independent splits
drawn from the same keys.

Scale: one md5 + modulo per row, embedded in the scan projection — no
shuffle, no state, trivially parallel.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets) from the 60-bit md5-hex
    prefix of ``salt || str(col)`` — reproducible by any SQL engine
    (DuckDB mirror: ``('0x' || substr(md5(...), 1, 15))::BIGINT % B``)."""
    key = F.concat(F.lit(salt), col.cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    return (h % buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    buckets: int = 100,
    salt: str = "split",
) -> DataFrame:
    """Add ``bucket`` and ``split`` ('train'/'val'/'test') columns keyed
    on a stable id. Percentages are bucket counts out of ``buckets``."""
    if train_pct + val_pct >= buckets:
        raise ValueError("train_pct + val_pct must leave room for test")
    b = hash_bucket(F.col(id_col), buckets, salt)
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, "train")
        .when(F.col("bucket") < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    buckets: int = 10_000,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic ~``fraction`` downsample: keep rows whose bucket
    falls below ``fraction * buckets``. Unlike ``DataFrame.sample`` the
    kept set is a pure function of the ids — rerun-stable and
    join-consistent across datasets sharing the key."""
    # floor(x + 0.5), not round(): Python round() is half-to-even, so a
    # fraction*buckets landing exactly on .5 (0.00005 * 10_000) would keep
    # ZERO buckets; half-up keeps one. Adding 0.5 also absorbs the float
    # representation error that makes 0.29 * 10_000 come out as 2899.99…
    return df.filter(
        hash_bucket(F.col(id_col), buckets, salt) < math.floor(fraction * buckets + 0.5)
    )


def stratified_hash_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    buckets: int = 10_000,
    salt: str = "strat",
) -> DataFrame:
    """Per-stratum deterministic downsample — the class-rebalancing
    primitive of corpus curation (cap the dominant language, keep all of
    a rare one). Each stratum gets its own keep-threshold over the same
    content-addressed buckets, so within every stratum the kept set is
    the hash_sample set for that fraction (nested: lowering a stratum's
    fraction keeps a subset of what the higher fraction kept).

    Scale: identical shape to hash_sample — one md5 + modulo per row and
    a CASE over a handful of literals, all in the scan projection; no
    join against a fractions table, no shuffle."""
    for k, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} must be in [0, 1], got {f}")

    def thr(f: float) -> int:
        return math.floor(f * buckets + 0.5)

    case = None
    for k in sorted(fractions):
        cond = F.col(strata_col) == k
        case = (F.when if case is None else case.when)(cond, F.lit(thr(fractions[k])))
    threshold = (
        case.otherwise(F.lit(thr(default_fraction)))
        if case is not None
        else F.lit(thr(default_fraction))
    )
    return df.filter(hash_bucket(F.col(id_col), buckets, salt) < threshold)


def select_within_budget(
    df: DataFrame,
    order_col: str,
    budget: int,
    token_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
    partitions: int | None = None,
) -> DataFrame:
    """Greedy global selection under a budget: order rows by
    (order_col, id) and keep the prefix whose running ``token_col``
    total stays within ``budget`` — "take the highest-quality documents
    until the token budget is spent", the corpus-selection step of
    training-data curation. Adds ``cum_tokens`` (the running total
    including the row).

    A naive global window cumsum is one task sorting the world. This is
    the distributed shape: range-repartition on the selection order
    (distributed sort), cumsum WITHIN each range partition, then a
    driver-side exclusive prefix over the per-partition totals
    (|partitions| rows) folded back in. The result is identical for any
    partition count or boundary placement — range partitions are
    globally ordered, so boundaries only move work, never totals. The
    partitioned frame is checkpointed so the totals pass and the final
    filter see the SAME sampled boundaries."""
    from pyspark.sql import Window

    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(id_col).asc(),
    ]
    n_parts = (
        partitions
        or int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    )
    ranged = (
        df.repartitionByRange(n_parts, *order)
        .withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_local_cum",
            F.sum(F.col(token_col)).over(
                Window.partitionBy("_pid")
                .orderBy(*order)
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .localCheckpoint(eager=False)
    )
    totals = sorted(
        (r["_pid"], r["t"])
        for r in ranged.groupBy("_pid").agg(F.sum(token_col).alias("t")).collect()
    )
    offsets, running = {}, 0
    for pid, t in totals:
        offsets[pid] = running
        running += t
    if offsets:
        offset_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        offset_expr = F.coalesce(offset_map[F.col("_pid")], F.lit(0))
    else:
        offset_expr = F.lit(0)
    return (
        ranged.withColumn("cum_tokens", (F.col("_local_cum") + offset_expr).cast("bigint"))
        .filter(F.col("cum_tokens") <= budget)
        .drop("_pid", "_local_cum")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    k: int,
    order_col: str,
    id_col: str = "doc_id",
    descending: bool = True,
) -> DataFrame:
    """Keep at most ``k`` rows per group, best-first — the per-domain /
    per-source cap of corpus curation (a handful of hosts contribute half
    the crawl; capping them is the standard anti-domination step). The
    order is the total order (order_col, id), so the kept set is
    deterministic and rerun-stable. Adds ``rank`` (1-based within group).

    Scale: a single ``Window.partitionBy(group)`` ranks each group in one
    task — for the hottest domain at 100 TB that task sorts billions of
    rows. So phase 1 pre-prunes with a window over (group,
    input-partition-id): the hot group's rows are spread across however
    many scan partitions hold them, each bounded task keeps its local
    top-k, and only <= k * num_partitions survivors per group reach the
    phase-2 global rank. Keeping local top-k first provably preserves the
    global top-k (any global winner is a local winner of its slice)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = [
        F.col(order_col).desc() if descending else F.col(order_col).asc(),
        F.col(id_col).asc(),
    ]
    from pyspark.sql import Window

    local = (
        df.withColumn("_pid", F.spark_partition_id())
        .withColumn(
            "_lrank",
            F.row_number().over(Window.partitionBy(group_col, "_pid").orderBy(*order)),
        )
        .filter(F.col("_lrank") <= k)
        .drop("_lrank", "_pid")
    )
    return local.withColumn(
        "rank", F.row_number().over(Window.partitionBy(group_col).orderBy(*order))
    ).filter(F.col("rank") <= k)


def mixture_weights(
    df: DataFrame,
    token_col: str,
    group_col: str = "lang",
    target_per_group: int = 50_000,
) -> DataFrame:
    """Data-mixing plan: per-group sampling weights that would equalize
    the corpus at ``target_per_group`` tokens per group — the mixture
    step before training (upweight rare languages/domains to their cap,
    downsample dominant ones). Returns (group, n_docs, n_tokens, weight)
    with weight = min(1, target/n_tokens): a group's weight feeds
    straight into stratified_hash_sample as its keep fraction, making
    plan + application both deterministic.

    Scale: one partial-aggregated shuffle keyed by the group — the
    exchange carries one partial per task regardless of corpus size; the
    weights table is |groups| rows (driver/broadcast sized)."""
    totals = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col(token_col).cast("bigint")).cast("bigint").alias("n_tokens"),
    )
    # zero/NULL token totals get weight 0.0 explicitly: without the
    # guard, 0 tokens yields target/0 = Infinity which least() silently
    # maps to weight 1.0 ("keep everything" for a group with no
    # countable tokens), and an all-NULL column propagates NULL weight
    # into the sampling plan. Either would be a quiet mixture bug.
    return totals.withColumn(
        "weight",
        F.when(
            F.col("n_tokens").isNull() | (F.col("n_tokens") <= 0), F.lit(0.0)
        ).otherwise(
            F.least(
                F.lit(1.0),
                F.lit(float(target_per_group)) / F.col("n_tokens").cast("double"),
            )
        ),
    )


def temperature_mixture_weights(
    df: DataFrame,
    token_col: str,
    group_col: str = "lang",
    scale: int = 1000,
) -> DataFrame:
    """Temperature-scaled mixture weights — the multilingual sampling
    rule published with mBERT/XLM (Conneau & Lample 2019, exponent
    smoothing): sample each group proportionally to ``n_tokens^0.5``
    instead of ``n_tokens``, flattening the head so dominant languages
    stop drowning rare ones without equalizing outright. Returns
    (group, n_docs, n_tokens, raw_ppm, temp_ppm): each group's share
    of the mixture in ppm under raw-proportional and under
    temperature-0.5 sampling.

    Exactness: the weight is the EXACT integer square root of
    ``x = n_tokens * scale^2`` (floor(sqrt) as a double, then a +-1
    integer-square comparison correction). The sqrt CORRECTION is
    exact at any magnitude of ``x`` — immune to the double's rounding
    boundary past 2^52 — but the staged product itself is bigint, so
    the op as a whole requires ``n_tokens < 2^63 / scale^2`` per
    group: at the default scale=1000 that is ~9.2e12 tokens/group
    (~37 TB of 4-byte-avg text IN ONE GROUP). Past that the product
    wraps silently; for corpora near the bound, lower ``scale`` (the
    ppm share loses sub-ppm resolution only when scale^2 < ~tot/1e6)
    or pre-divide n_tokens by a power of 4 and halve the scale —
    isqrt(x/4) = isqrt(x)/2 exactly for even exponents. Other
    temperatures alpha = k/2^m compose from iterated isqrt; a general
    float pow is NOT cross-engine bit-stable, which is why 0.5 — the
    published default — is the exact dial here.

    Scale: one partial-agg shuffle keyed by the group; the totals
    cross as a 1-ROW broadcast (the q22 global-scalar class — BNLJ
    allowlist)."""
    totals = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col(token_col).cast("bigint")).cast("bigint").alias("n_tokens"),
    )
    x = (F.col("n_tokens") * (scale * scale)).cast("bigint")
    w0 = F.floor(F.sqrt(x.cast("double"))).cast("bigint")
    staged = totals.select(
        group_col, "n_docs", "n_tokens", x.alias("_x"), w0.alias("_w0")
    )
    w_fp = (
        F.when((F.col("_w0") + 1) * (F.col("_w0") + 1) <= F.col("_x"),
               F.col("_w0") + 1)
        .when(F.col("_w0") * F.col("_w0") > F.col("_x"), F.col("_w0") - 1)
        .otherwise(F.col("_w0"))
    ).cast("bigint")
    weighted = staged.select(
        group_col, "n_docs", "n_tokens", w_fp.alias("_w")
    )
    tot = weighted.agg(
        F.sum("_w").cast("bigint").alias("_tw"),
        F.sum("n_tokens").cast("bigint").alias("_tn"),
    )
    return weighted.join(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_tokens",
        F.expr("(1000000 * n_tokens) DIV _tn").cast("bigint").alias("raw_ppm"),
        F.expr("(1000000 * _w) DIV _tw").cast("bigint").alias("temp_ppm"),
    )


def weighted_priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sample of ``k`` rows: each row draws the
    uniform 60-bit md5 key of its id (the module's cross-engine hash
    idiom) and ranks by ``key DIV weight`` — heavier rows get
    proportionally smaller priorities, so the k smallest form a
    weight-biased sample that is a pure function of (ids, weights,
    salt): rerun-, engine-, and partitioning-reproducible, which is
    what lets a curation pipeline audit WHY a row was sampled. (The
    integer scheme approximates A-ES exponential jittering without
    transcendental floats — the documented trade for bit-exactness.)
    Rows with non-positive weight are excluded by contract.

    Scale: the priority is one md5 + one DIV in the scan projection;
    the k smallest resolve via TakeOrdered (per-partition top-k, then
    a k×partitions driver merge) — no global sort, no shuffle of the
    data side."""
    key = F.concat(F.lit(salt), F.col(id_col).cast("string"))
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
    staged = df.filter(F.col(weight_col) > 0).withColumns(
        {"_h": h, "_w": F.col(weight_col).cast("bigint")}
    )
    return (
        staged.withColumn("priority", F.expr("_h DIV _w"))
        .drop("_h", "_w")
        .orderBy("priority", id_col)
        .limit(k)
    )


def zscore_outlier_counts(
    df: DataFrame,
    group_col: str,
    cents_col: str,
    z_num: int = 3,
) -> DataFrame:
    """Per-group outlier audit with EXACT integer arithmetic: counts
    rows whose value lies more than ``z_num`` population standard
    deviations from their group mean, without ever computing a float
    mean or stddev — the data-cleaning gate of a curation pipeline,
    hash-reproducible across engines.

    The z-test |c - S/n| > z*sigma squares to the pure-integer form

        (n*c - S)^2 > z^2 * (n*Q - S^2)

    with S = sum(c), Q = sum(c^2) (population variance sigma^2 =
    (n*Q - S^2)/n^2). Products evaluate in DECIMAL(38,0) — bigint
    overflows at (n*c)^2 for group sizes past ~1e5 at cent scale, the
    exact trap the 8x sweep hits (DuckDB mirror: HUGEINT).

    Scale: one partial-agg shuffle for the (n, S, Q) moments, a
    group-count-sized broadcast back onto the scan, one row-local
    integer test. Returns (group, n, n_outliers)."""
    g = F.col(group_col)
    c = F.col(cents_col).cast("bigint")
    stats = (
        df.select(g.alias("_g"), c.alias("_c"))
        .groupBy("_g")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum("_c").alias("_s"),
            F.sum(F.col("_c") * F.col("_c")).alias("_q"),
        )
    )
    d = "decimal(38,0)"
    joined = df.select(g.alias("_g"), c.alias("_c")).join(
        F.broadcast(stats), "_g"
    )
    lhs_root = F.col("_n").cast(d) * F.col("_c").cast(d) - F.col("_s").cast(d)
    rhs = F.lit(z_num * z_num).cast(d) * (
        F.col("_n").cast(d) * F.col("_q").cast(d)
        - F.col("_s").cast(d) * F.col("_s").cast(d)
    )
    flagged = joined.withColumn(
        "_out", F.when(lhs_root * lhs_root > rhs, F.lit(1)).otherwise(F.lit(0))
    )
    return (
        flagged.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("_out").cast("bigint").alias("n_outliers"),
        )
    )


def dsir_importance(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling", arXiv:2302.03169):
    score every RAW document by how target-like its hashed n-gram
    profile is under bag-of-ngrams models of the target vs the raw
    corpus — the published method for tilting a crawl toward a quality
    domain without training a classifier. Returns (id, n_feats,
    imp_mbits): feature count and fixed-point importance in
    milli-bits/feature.

    Exact-integer formulation (the hash-gate discipline): features are
    unigrams plus adjacent bigrams, hashed into ``n_buckets`` via the
    engine-portable md5-prefix bucket (:func:`hash_bucket`); each
    bucket's weight is the quantized log-ratio

        w(b) = bitlen( ((ct(b)+1) * 2^20) DIV (cr(b)+1) )

    (add-one smoothing on both sides; ~20 bits = neutral, higher =
    target-enriched), and a document's importance is the mean weight
    of its feature OCCURRENCES in milli-bits. bitlen of an exact
    integer ratio is the same trick the BM25/perplexity gates use, so
    the classically-float log-importance is bit-identical on any
    engine.

    Scale shape: two feature-stream partial aggs (target + raw) land
    on ``n_buckets`` rows — the weight table is a MODEL (a fixed dial,
    4096 rows regardless of corpus size), so it broadcasts; the raw
    feature stream then pays ZERO extra shuffles (broadcast join +
    the per-doc aggregate). The hashing trick is the paper's own
    scale device."""
    from gomrjob_spark.operators.text import normalized, spread, tokens

    def feats(df):
        staged = spread(df).select(
            F.col(id_col),
            F.filter(tokens(normalized(text_col)), lambda x: x != "").alias(
                "_toks"
            ),
        )
        uni = staged.select(
            F.col(id_col), F.explode("_toks").alias("_f")
        )
        idx = F.when(
            F.size("_toks") >= 2, F.sequence(F.lit(1), F.size("_toks") - 1)
        ).otherwise(F.array().cast("array<int>"))
        bi = staged.select(
            F.col(id_col), F.explode(idx).alias("_i"), "_toks"
        ).select(
            F.col(id_col),
            F.concat(
                F.element_at("_toks", F.col("_i")),
                F.lit(" "),
                F.element_at("_toks", F.col("_i") + 1),
            ).alias("_f"),
        )
        return uni.unionByName(bi).select(
            F.col(id_col), hash_bucket(F.col("_f"), n_buckets, salt).alias("_b")
        )

    ct = feats(target).groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    cr_stream = feats(raw)
    cr = cr_stream.groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    weights = _dsir_weight_table(ct, cr)
    return (
        cr_stream.join(F.broadcast(weights), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("_w").cast("bigint").alias("_tw"),
        )
        .select(
            F.col(id_col),
            "n_feats",
            F.expr("(1000 * _tw) DIV n_feats").cast("bigint").alias("imp_mbits"),
        )
    )


def _dsir_weight_table(ct: DataFrame, cr: DataFrame) -> DataFrame:
    """(_b, _w) bucket-weight MODEL from target/raw bucket counts:
    w = bitlen(((ct+1) * 2^20) DIV (cr+1)) — add-one smoothing both
    sides, exact integers. Shared by the batch scorer and the
    streaming gate (dsir_weights is the public trainer)."""
    return ct.join(cr, "_b", "full_outer").select(
        "_b",
        F.length(
            F.conv(
                F.expr(
                    "((coalesce(_ct, 0) + 1) * 1048576) "
                    "DIV (coalesce(_cr, 0) + 1)"
                ).cast("string"),
                10,
                2,
            )
        ).cast("bigint").alias("_w"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Train ONLY the DSIR bucket-weight table (_b, _w) — the offline
    half a live ingest deploys: two feature-stream partial aggs onto
    the fixed n_buckets-row model (see :func:`dsir_importance` for the
    scoring math), handed to streaming.ops.dsir_gate_stream as a
    per-batch broadcast."""
    from gomrjob_spark.operators.text import normalized, spread, tokens

    def feats(df):
        staged = spread(df).select(
            F.col(id_col),
            F.filter(tokens(normalized(text_col)), lambda x: x != "").alias(
                "_toks"
            ),
        )
        uni = staged.select(F.col(id_col), F.explode("_toks").alias("_f"))
        idx = F.when(
            F.size("_toks") >= 2, F.sequence(F.lit(1), F.size("_toks") - 1)
        ).otherwise(F.array().cast("array<int>"))
        bi = staged.select(
            F.col(id_col), F.explode(idx).alias("_i"), "_toks"
        ).select(
            F.col(id_col),
            F.concat(
                F.element_at("_toks", F.col("_i")),
                F.lit(" "),
                F.element_at("_toks", F.col("_i") + 1),
            ).alias("_f"),
        )
        return uni.unionByName(bi).select(
            F.col(id_col), hash_bucket(F.col("_f"), n_buckets, salt).alias("_b")
        )

    ct = feats(target).groupBy("_b").agg(F.count(F.lit(1)).alias("_ct"))
    cr = feats(raw).groupBy("_b").agg(F.count(F.lit(1)).alias("_cr"))
    return _dsir_weight_table(ct, cr)


def softdedup_weights(
    docs: DataFrame,
    n: int = 6,
    floor_ppm: int = 31_250,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplication-aware SOFT reweighting (the SoftDeDup idea — He et
    al. 2024, arXiv:2407.06654: down-weight commonly-duplicated text
    in the sampling distribution instead of deleting it): every
    document keeps a sampling weight proportional to its UNIQUE
    fraction,

        weight_ppm = max(1_000_000 - coverage_ppm, floor_ppm)

    where coverage_ppm is the exact position-union duplicated-n-gram
    character coverage (:func:`gomrjob_spark.operators.text
    .dup_ngram_char_coverage` — the Gopher interval-union machinery,
    reused verbatim). Returns (id, n_tokens, coverage_ppm, weight_ppm)
    for EVERY document — docs below the coverage op's min_tokens carry
    coverage 0 (no duplication evidence -> full weight).

    Contrast with dedup_span_removal (the remove/rewrite/reweight
    triad): span REMOVAL excises every repeated window's loser
    occurrences from the text itself — destructive, exact, and right
    when duplicates are crawl artifacts; span-scrub REWRITES only
    benchmark-contaminated spans; soft reweighting keeps every
    document bit-identical and instead shrinks how often heavily
    duplicated ones are SAMPLED into a training mix — the right dial
    when duplication correlates with quality signal you don't want to
    destroy (boilerplate-heavy but useful pages). The floor keeps even
    fully-duplicated docs sampleable at floor_ppm/1e6 of full rate
    (and satisfies the weighted sampler's positive-weight contract).

    Scale: the coverage op's (id, gram) partial-agg + bounded per-doc
    windows, one |docs|-row left join, then pure scan arithmetic —
    nothing here grows past the coverage op's documented shape."""
    from gomrjob_spark.operators.text import (
        dup_ngram_char_coverage,
        normalized,
        tokens,
    )

    cov = dup_ngram_char_coverage(
        docs, n=n, text_col=text_col, id_col=id_col
    ).select(id_col, "coverage_ppm")
    base = docs.select(
        F.col(id_col),
        F.size(
            F.filter(tokens(normalized(text_col)), lambda x: x != "")
        ).cast("bigint").alias("n_tokens"),
    )
    # shuffle_hash hint: the coverage frame is CORPUS-sized (one row
    # per doc), so it must never be the broadcast build side — at
    # 100 TB it cannot be, and even at bench scale Spark's
    # auto-broadcast of it re-executes the window subplan inside the
    # exchange build (measured 9.75 s broadcast vs 0.95 s shuffled
    # hash join, isolated best-of-3 at the 8x sweep point, SCALING.md
    # round-10); hash beats merge here because neither side needs the
    # sort an SMJ would add
    return base.join(cov.hint("shuffle_hash"), id_col, "left").select(
        F.col(id_col),
        "n_tokens",
        F.coalesce("coverage_ppm", F.lit(0)).cast("bigint").alias("coverage_ppm"),
        F.greatest(
            F.lit(1_000_000).cast("bigint")
            - F.coalesce("coverage_ppm", F.lit(0)).cast("bigint"),
            F.lit(floor_ppm).cast("bigint"),
        ).alias("weight_ppm"),
    )
