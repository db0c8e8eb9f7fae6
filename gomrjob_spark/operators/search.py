"""Inverted-index text retrieval: TF and fixed-point-BM25 top-k search.

The retrieval side of a training-data pipeline: given a small query set
(each query a bag of terms), return the best-matching documents. At
100 TB the plan shape matters more than the scoring formula:

- **Prune before aggregating.** Tokens are joined against the
  (broadcast) query-term set BEFORE the term-frequency aggregation, so
  the one real shuffle — partial-agg on (doc_id, term) — carries only
  matching terms, not the whole corpus's token stream.
- **Document length without an explode.** ``dl`` is ``size(split(...))``
  — a scan-side column expression, no token explode, no shuffle.
- **Global stats via broadcast.** N/avgdl are a one-row aggregate
  cross-joined (broadcast) onto the scored frame; per-term document
  frequencies are a tiny aggregate of the pruned posting frame,
  broadcast back into the scoring join.
- **Two-phase top-k.** Final per-query ranking reuses
  :func:`gomrjob_spark.operators.sampling.cap_per_group` (local top-k
  per partition, then global), so one hot query never funnels the whole
  scored frame through a single window task.

Scoring is EXACT integer arithmetic end to end, so the DuckDB oracle
hash-matches bit-for-bit:

- TF score: plain summed term frequency.
- BM25: the classic shape ``idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``
  with k1=1.2, b=0.75, quantized to fixed point — x100 length norm, x10
  inner denominator, x1000 contribution — and ``idf`` as the integer
  bit-length of N/df (an exact, monotone stand-in for log2(N/df); both
  engines compute it from binary string length, no libm anywhere).
  Every division is integer DIV on positive operands, which Spark and
  DuckDB floor identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


def tokenize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term) token stream: whitespace split, empties dropped.

    spread() first: the tokenize+explode map side is the module's
    CPU-dense stage, and the small-SF documents table is ONE parquet
    split — without the fan-out the whole token stream serializes into
    a single task (no-op on a real cluster)."""
    from gomrjob_spark.operators.text import spread

    return (
        spread(docs).select(
            "doc_id", F.explode(F.split(F.col(text_col), " ")).alias("term")
        ).filter(F.col("term") != "")
    )


def pruned_term_frequencies(
    docs: DataFrame, queries: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, tf) for query terms only — one row per (doc,
    term) regardless of how many queries share the term. The broadcast
    join against the tiny query set prunes the token stream before the
    (doc_id, term) partial-agg shuffle."""
    return (
        tokenize(docs, text_col)
        .join(F.broadcast(queries.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def search_tf_topk(
    docs: DataFrame, queries: DataFrame, k: int = 10, text_col: str = "text"
) -> DataFrame:
    """Top-k docs per query by summed term frequency (exact integers).

    Returns (query_id, doc_id, score, rank), rank 1-based by
    (score desc, doc_id asc)."""
    from gomrjob_spark.operators.sampling import cap_per_group

    scored = (
        F.broadcast(queries)
        .join(pruned_term_frequencies(docs, queries, text_col), "term")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tf").cast("long").alias("score"))
    )
    return cap_per_group(scored, "query_id", k, "score").select(
        "query_id", "doc_id", "score", "rank"
    )


def search_bm25_topk(
    docs: DataFrame, queries: DataFrame, k: int = 10, text_col: str = "text"
) -> DataFrame:
    """Top-k docs per query under fixed-point BM25 (k1=1.2, b=0.75).

    score = sum over matched terms of
      bitlength(N DIV df) * ((22000 * tf) DIV (10*tf + (12 * norm_x100) DIV 10))
    with norm_x100 = 25 + (7500 * dl) DIV avgdl_x100 and
    avgdl_x100 = (100 * total_tokens) DIV N — all integer DIV on
    positive values, bit-identical across engines. Returns
    (query_id, doc_id, score, rank)."""
    from gomrjob_spark.operators.sampling import cap_per_group
    from gomrjob_spark.operators.text import spread

    # spread() both corpus scans: full-text tokenization is the
    # CPU-dense map side and the small-SF table is one parquet split
    # (stage profile: one 2.3 cpu-s single-task stage = half the query)
    dl = F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
    stats = spread(docs).select(dl.alias("dl")).agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tokens")
    ).withColumn("avgdl_x100", F.expr("100 * total_tokens DIV n_docs"))

    # dl rides the token stream (constant per doc, F.first under the
    # (doc_id, term) agg) so scoring needs no extra corpus-wide join
    toks = spread(docs).select(
        "doc_id", dl.alias("dl"), F.explode(F.split(F.col(text_col), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = (
        toks.join(F.broadcast(queries.select("term").distinct()), "term")
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        F.broadcast(queries)
        .join(tf, "term")
        .join(F.broadcast(df_), "term")
        .join(F.broadcast(stats))
        .withColumn(
            "idf_bits",
            F.length(F.conv(F.expr("n_docs DIV df").cast("string"), 10, 2)),
        )
        .withColumn("norm_x100", F.expr("25 + (7500 * dl) DIV avgdl_x100"))
        .withColumn(
            "contrib",
            F.expr("idf_bits * ((22000 * tf) DIV (10 * tf + (12 * norm_x100) DIV 10))"),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("contrib").cast("long").alias("score"))
    )
    return cap_per_group(scored, "query_id", k, "score").select(
        "query_id", "doc_id", "score", "rank"
    )


def search_phrase_topk(
    docs: DataFrame,
    phrases: list[tuple[int, str]],
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Top-k docs per phrase by EXACT phrase-occurrence count — the
    consecutive-run signal bag-of-terms TF/BM25 cannot express
    ("new york" must not match "york ... new"). Returns
    (phrase_id, doc_id, score, rank), score = number of (possibly
    overlapping) occurrences, rank by (score desc, doc_id asc), only
    docs with score > 0.

    Plan: the token array stages ONCE per row; each phrase's count is a
    pure codegen'd expression — size(filter(sequence(1, n-L+1),
    i -> toks[i]=p1 AND ... AND toks[i+L-1]=pL)) — so one corpus scan
    evaluates the whole phrase set with no explode, no join, and no
    positional-index shuffle; only (phrase_id, doc_id, score>0) rows
    leave the scan, and ranking is the two-phase cap_per_group top-k.
    This is the right shape while the phrase set is a plan-time literal
    (the retrieval-query regime, like search_tf_topk's broadcast
    prune); a phrase CORPUS would instead build a positional inverted
    index keyed on each phrase's rarest term."""
    from gomrjob_spark.operators.sampling import cap_per_group
    from gomrjob_spark.operators.text import spread

    staged = spread(docs).select(
        "doc_id",
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("_toks"),
    )
    pids = sorted({pid for pid, _ in phrases})
    by_pid = {pid: [p for q, p in phrases if q == pid] for pid in pids}

    def esc(t: str) -> str:
        return t.replace("\\", "\\\\").replace("'", "\\'")

    cols = []
    for pid in pids:
        counts = []
        for phrase in by_pid[pid]:
            terms = [t for t in phrase.split(" ") if t]
            L = len(terms)
            conds = " AND ".join(
                f"element_at(_toks, i + {j}) = '{esc(t)}'"
                for j, t in enumerate(terms)
            )
            counts.append(
                f"(CASE WHEN size(_toks) >= {L} THEN "
                f"size(filter(sequence(1, size(_toks) - {L - 1}), i -> {conds})) "
                "ELSE 0 END)"
            )
        cols.append(F.expr(" + ".join(counts)).cast("long").alias(f"_s{pid}"))
    out = staged.select("doc_id", *cols)
    stack = ", ".join(f"{pid}, _s{pid}" for pid in pids)
    scored = (
        out.selectExpr("doc_id", f"stack({len(pids)}, {stack}) as (phrase_id, score)")
        .select(F.col("phrase_id").cast("int").alias("phrase_id"), "doc_id", "score")
        .filter(F.col("score") > 0)
    )
    return cap_per_group(scored, "phrase_id", k, "score", id_col="doc_id").select(
        "phrase_id", "doc_id", "score", "rank"
    )


def search_proximity_topk(
    docs: DataFrame,
    pair_queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
) -> DataFrame:
    """Proximity search for term PAIRS: per (query, doc), the minimal
    token distance between an occurrence of ``term_a`` and one of
    ``term_b`` — the "terms near each other" retrieval mode TF/BM25's
    bag scoring can't express and exact-phrase matching is too strict
    for. Exact integers under the hash gate.

    The naive score is min over the cross product of the two position
    lists; the plan instead uses the classic merged-stream argument —
    the optimal pair is always CONSECUTIVE in the position-sorted
    union of both terms' occurrences (anything between them would be a
    closer opposite-role match) — so one lag() window over the tagged
    position stream computes it in linear work. Positions join the
    broadcast query-term set BEFORE the (query, doc) exchange (the
    module's prune-early discipline), and the final ranking is the
    two-phase cap_per_group (ascending: smaller gap = better).
    ``term_a != term_b`` per query by contract. Returns
    (query_id, doc_id, min_gap, rank)."""
    from pyspark.sql import Window

    from gomrjob_spark.operators.sampling import cap_per_group

    terms = pair_queries.select(
        F.col("term_a").alias("term"), "query_id", F.lit(0).alias("role")
    ).unionByName(
        pair_queries.select(
            F.col("term_b").alias("term"), "query_id", F.lit(1).alias("role")
        )
    )
    from gomrjob_spark.operators.text import spread

    toks = spread(docs).select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "term"),
    ).filter(F.col("term") != "")
    tagged = toks.join(F.broadcast(terms), "term")
    w = Window.partitionBy("query_id", "doc_id").orderBy("pos")
    gap = F.when(
        F.lag("role").over(w) != F.col("role"),
        F.col("pos") - F.lag("pos").over(w),
    )
    scored = (
        tagged.withColumn("_gap", gap)
        .groupBy("query_id", "doc_id")
        .agg(F.min("_gap").cast("long").alias("min_gap"))
        .filter(F.col("min_gap").isNotNull())
    )
    return cap_per_group(
        scored, "query_id", k, "min_gap", descending=False
    ).select("query_id", "doc_id", "min_gap", "rank")
