"""Grouping-sets and UDTF coverage (SURVEY.md §2F aggregation + UDF rows).

GROUPING SETS completes the multi-dimensional aggregate family next to
``agg_cube``/``agg_rollup`` — one shuffle produces all groupings via
Spark's Expand operator, not one job per grouping (which is what a gomrjob
user had to run). The UDTF query exercises Spark 4's Python user-defined
table function — the one UDF shape (one row -> many rows with its own
schema) that mapInPandas doesn't model directly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gomrjob_spark.catalog import load_table
from gomrjob_spark.functions import dsum
from gomrjob_spark.plans.registry import query


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — the general form of cube/rollup. Spark
    plans one Expand + one aggregate: every grouping computed in a single
    shuffle (contrast: one MapReduce job per grouping under the
    reference's model)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@query(
    "udtf_sentences",
    oracle="""
    SELECT doc_id, trim(s.sent) AS sentence
    FROM documents, unnest(string_split(text, '.')) AS s(sent)
    WHERE length(trim(s.sent)) > 0
    ORDER BY doc_id, sentence
    """,
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4): explode each document into sentences —
    one input row, many output rows, UDTF-declared schema.

    Scale note: UDTFs are a Python-side path; this one is Arrow-batched
    (useArrow) and stateless, so it parallelizes per-partition like any
    map. For a pure split like this a built-in explode(split()) is the
    faster plan — the query exists to pin the UDTF contract for the
    operators that genuinely need imperative row-expansion logic."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, sentence string", useArrow=True)
    class SplitSentences:
        def eval(self, doc_id: int, text: str):
            if text is None:
                return
            for part in text.split("."):
                part = part.strip()
                if part:
                    yield doc_id, part

    spark.udtf.register("split_sentences", SplitSentences)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT s.doc_id, s.sentence
        FROM udtf_docs, LATERAL split_sentences(doc_id, text) s
        ORDER BY doc_id, sentence
        """
    )


@query(
    "scalar_array_map",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INT)                               AS n_toks,
           CAST(len(list_filter(toks, t -> length(t) > 4)) AS INT) AS n_long,
           CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS total_chars,
           -- coalesce: DuckDB's array_to_string of an empty list is NULL
           -- where Spark's array_join is ''
           coalesce(array_to_string(list_sort(list_distinct(
             list_transform(list_filter(toks, t -> length(t) = 3), t -> lower(t))
           )), ','), '')                                        AS three_letter_words
    FROM t
    ORDER BY doc_id
    """,
)
def scalar_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (transform/filter/aggregate/sort/
    distinct) — all JVM lambda expressions on the scan, the §2F scalar-fn
    family's array/map row. (The token array is projected into a column
    first; see dedup.word_shingles for why that matters.)"""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    toks = F.col("toks")
    return toked.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
        F.array_join(
            F.array_sort(
                F.array_distinct(
                    F.transform(
                        F.filter(toks, lambda t: F.length(t) == 3), lambda t: F.lower(t)
                    )
                )
            ),
            ",",
        ).alias("three_letter_words"),
    ).orderBy("doc_id")


@query(
    "pivot_unpivot_roundtrip",
    oracle="""
    WITH p AS (
      -- nullif: Spark's pivot cell is NULL (not 0) when a combo has no
      -- rows; mirror that so both sides drop the same rows below
      SELECT user_id,
             nullif(CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT), 0) AS click,
             nullif(CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT), 0) AS view
      FROM events GROUP BY user_id
    )
    SELECT user_id, event_type, n FROM (
      SELECT user_id, 'click' AS event_type, click AS n FROM p
      UNION ALL
      SELECT user_id, 'view' AS event_type, view AS n FROM p
    )
    WHERE n IS NOT NULL
    ORDER BY user_id, event_type
    """,
)
def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot -> unpivot (melt) roundtrip: wide-to-long is the inverse of
    the pivot aggregation; exercises F.unpivot/melt (SURVEY.md §2F set-op
    row's reshaping cousin)."""
    events = load_table(spark, sf_dir, "events")
    wide = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "view"])
        .agg(F.count(F.lit(1)))
    )
    return (
        wide.unpivot("user_id", ["click", "view"], "event_type", "n")
        .filter(F.col("n").isNotNull())
        .orderBy("user_id", "event_type")
    )


@query(
    "udaf_weighted_avg",
    oracle="""
    SELECT l_suppkey,
           CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    * CAST(l_quantity AS BIGINT)) AS DOUBLE)
             / (100.0 * sum(CAST(l_quantity AS BIGINT))) AS wavg_price
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-aggregate UDF (a true UDAF): quantity-weighted
    average price per supplier. The accumulation happens on exact int64
    cents inside the UDF (pandas int sums are order-independent), with
    ONE double division per group — which is what lets a Python
    aggregate sit under a bit-exact SQL oracle at all.

    Scale note: a grouped-agg pandas UDF materializes each group's
    columns in one Arrow batch on an executor — right for
    many-small-groups keys like suppkey, wrong for a 3-value key whose
    groups are the table. (This aggregation is also expressible natively
    — the query pins the UDAF contract for aggregates that genuinely
    need imperative Python.)"""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def wavg(ep: pd.Series, qty: pd.Series) -> float:  # grouped-agg by hints
        cents = (ep * 100).round().astype("int64")
        q = qty.astype("int64")
        return float(float((cents * q).sum()) / (100.0 * float(q.sum())))

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(wavg("l_extendedprice", "l_quantity").alias("wavg_price"))
        .orderBy("l_suppkey")
    )


@query("agg_approx_quantile")  # approximate: no SQL oracle; tolerance-gated in pytest
def agg_approx_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch) of extended
    price per return flag — the quantile member of the approximate-agg
    family next to approx_count_distinct's HLL++. At 100 TB a sketch
    with bounded accuracy (here 1e-4 relative rank error) is the only
    sane way to get tail percentiles: one pass, mergeable partials, no
    global sort. Accuracy is pytest-gated against DuckDB's exact
    quantiles (tests/test_robustness.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx(
                "l_extendedprice", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), 10000
            ).alias("pcts")
        )
        .select(
            "l_returnflag",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_quantile_exact",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS p50,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.9) AS p90,
           quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99) AS p99
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_quantile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles per return flag — the oracle-gated twin of
    ``agg_approx_quantile`` (VERDICT r2 next-round #1): Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` both implement type-7
    linear interpolation at rank p*(n-1) over doubles, and the
    interpolation arithmetic is bit-identical between the engines (no
    rounding anywhere in this query — verified raw). The approximate
    GK-sketch variant stays registered alongside, tolerance-gated in
    pytest, because at 100 TB the sketch's one-pass mergeable partials
    are the production path; this twin proves the quantile SEMANTICS
    against a second engine exactly.

    Scale: exact percentile sorts each group's values on the executors
    (single shuffle on l_returnflag); right for a 3-group key only
    because groups are large-but-bounded here — the sketch variant is
    the default recommendation."""
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile(
        F.col("l_extendedprice").cast("double"),
        F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)),
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pcts.alias("pcts"))
        .select(
            "l_returnflag",
            F.col("pcts")[0].alias("p50"),
            F.col("pcts")[1].alias("p90"),
            F.col("pcts")[2].alias("p99"),
        )
        .orderBy("l_returnflag")
    )


def _profile_oracle_col(c: str) -> str:
    return f"""
      SELECT '{c}' AS "column",
             CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(*) FILTER ({c} IS NULL) AS BIGINT) AS n_nulls,
             CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
             min(CAST({c} AS VARCHAR)) AS min_value,
             max(CAST({c} AS VARCHAR)) AS max_value
      FROM documents"""


@query(
    "profile_table_stats",
    oracle=" UNION ALL ".join(
        _profile_oracle_col(c)
        for c in ("doc_id", "lang", "n_chars", "source", "text")
    )
    + ' ORDER BY "column"',
)
def profile_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE in one pass (operators.profile.profile_columns):
    per-column nulls, EXACT distinct counts, and min/max for every
    profiled column of ``documents`` from ONE scan and ONE shuffle —
    Spark plans the multi-column exact COUNT(DISTINCT) set through a
    single Expand into a partial/final aggregate, vs the oracle's five
    separate full-table aggregates. The Expand multiplies scan rows by
    the column count: the documented price of exactness (the sketch
    alternative is agg_approx_distinct). Doubles are refused by
    contract — float string-rendering is engine-specific."""
    from gomrjob_spark.operators.profile import profile_columns

    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(
        docs, ["doc_id", "lang", "n_chars", "source", "text"]
    ).orderBy("column")


@query(
    "events_mad_audit",
    oracle="""
    WITH c AS (
      SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(v, 0.5) AS m FROM c GROUP BY 1
    ),
    dev AS (
      SELECT c.event_type, c.v, abs(c.v - med.m) AS d
      FROM c JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN d.d > 3 * mad.mad THEN 1 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad USING (event_type)
    GROUP BY d.event_type ORDER BY d.event_type
    """,
)
def events_mad_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier audit: per-type counts beyond 3 median absolute
    deviations — the robust-statistics companion to the moment-based
    events_outlier_audit (a mean/stddev gate is itself dragged by the
    outliers it hunts; median/MAD are not). Exactness rides the
    engines' bit-identical type-7 percentile interpolation (the
    agg_quantile_exact precedent): median and MAD are exact selections/
    interpolations over doubles, |v - m| and the 3*mad comparison are
    row-local IEEE — no accumulated float anywhere, hash-exact raw.

    Scale: two grouped exact percentiles (per-group executor sorts on
    a bounded group key) + a group-count-sized broadcast back per
    stage; the GK-sketch variant is the recommended path when groups
    stop being bounded."""
    events = load_table(spark, sf_dir, "events")
    c = events.select("event_type", F.col("value").cast("double").alias("v"))
    med = c.groupBy("event_type").agg(
        F.percentile(F.col("v"), F.lit(0.5)).alias("m")
    )
    dev = c.join(F.broadcast(med), "event_type").withColumn(
        "d", F.abs(F.col("v") - F.col("m"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("d"), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("d") > 3 * F.col("mad"), F.lit(1))).alias(
                "n_outliers"
            ),
        )
        .orderBy("event_type")
    )


@query(
    "integrity_audit",
    oracle="""
    SELECT 'customer_no_nation' AS relation, CAST(count(*) AS BIGINT) AS n_orphans
    FROM customer c WHERE NOT EXISTS (
      SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    UNION ALL
    SELECT 'lineitem_no_order', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem_no_part', CAST(count(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS (
      SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    UNION ALL
    SELECT 'orders_no_customer', CAST(count(*) AS BIGINT)
    FROM orders o WHERE NOT EXISTS (
      SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    ORDER BY relation
    """,
)
def integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan-row
    counts for every fact->dim edge (lineitem->orders, lineitem->part,
    orders->customer, customer->nation) in ONE result — the data-
    quality gate a pipeline runs after every load. Each edge is a LEFT
    ANTI join: key-only shuffles (or broadcast for dim-sized sides),
    counts partial-aggregated; no fact row ever carries payload
    columns through the join."""
    t = {n: load_table(spark, sf_dir, n) for n in
         ("customer", "nation", "lineitem", "orders", "part")}

    def orphans(name, fact, fk, dim, pk):
        n = (
            fact.select(F.col(fk).alias("_k"))
            .join(dim.select(F.col(pk).alias("_k")), "_k", "left_anti")
            .agg(F.count(F.lit(1)).alias("n_orphans"))
        )
        return n.select(F.lit(name).alias("relation"), "n_orphans")

    parts = [
        orphans("customer_no_nation", t["customer"], "c_nationkey", t["nation"], "n_nationkey"),
        orphans("lineitem_no_order", t["lineitem"], "l_orderkey", t["orders"], "o_orderkey"),
        orphans("lineitem_no_part", t["lineitem"], "l_partkey", t["part"], "p_partkey"),
        orphans("orders_no_customer", t["orders"], "o_custkey", t["customer"], "c_custkey"),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("relation")


@query(
    "fd_audit",
    oracle="""
    WITH pairs(lhs, rhs) AS (
      VALUES ('event_id', 'user_id'), ('event_id', 'event_type'),
             ('user_id', 'event_type'), ('event_type', 'user_id')
    ),
    stats AS (
      SELECT 'event_id' AS lhs, 'user_id' AS rhs,
             count(DISTINCT event_id) AS n_lhs,
             count(DISTINCT (event_id, user_id)) AS n_pairs FROM events
      UNION ALL
      SELECT 'event_id', 'event_type',
             count(DISTINCT event_id),
             count(DISTINCT (event_id, event_type)) FROM events
      UNION ALL
      SELECT 'user_id', 'event_type',
             count(DISTINCT user_id),
             count(DISTINCT (user_id, event_type)) FROM events
      UNION ALL
      SELECT 'event_type', 'user_id',
             count(DISTINCT event_type),
             count(DISTINCT (event_type, user_id)) FROM events
    )
    SELECT lhs, rhs, CAST(n_lhs AS BIGINT) AS n_lhs,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           n_lhs = n_pairs AS fd_holds
    FROM stats ORDER BY lhs, rhs
    """,
)
def fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (profiling family): does column
    A determine column B? FD holds iff ``count(distinct A) ==
    count(distinct (A, B))`` — exact distincts, one aggregation per
    candidate pair over the pruned two-column scan (the profiling
    follow-up to profile_table_stats: that one measures columns in
    isolation, this one their determinism relations — key discovery,
    denormalization checks). event_id is expected to determine
    everything; event_type to determine nothing."""
    events = load_table(spark, sf_dir, "events")
    cand = [
        ("event_id", "user_id"), ("event_id", "event_type"),
        ("user_id", "event_type"), ("event_type", "user_id"),
    ]
    out = None
    for lhs, rhs in cand:
        one = events.agg(
            F.count_distinct(F.col(lhs)).alias("n_lhs"),
            F.count_distinct(F.col(lhs), F.col(rhs)).alias("n_pairs"),
        ).select(
            F.lit(lhs).alias("lhs"), F.lit(rhs).alias("rhs"),
            "n_lhs", "n_pairs",
            (F.col("n_lhs") == F.col("n_pairs")).alias("fd_holds"),
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("lhs", "rhs")


@query(
    "profile_key_skew",
    oracle="""
    WITH c AS (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total, count(*) AS n_keys FROM c),
    top AS (
      SELECT k, n, row_number() OVER (ORDER BY n DESC, k) AS rnk FROM c
    )
    SELECT CAST(rnk AS INT) AS rank, k AS key, CAST(n AS BIGINT) AS n,
           CAST((1000000 * n) // tot.total AS BIGINT) AS share_ppm,
           CAST(tot.n_keys AS BIGINT) AS n_keys
    FROM top, tot WHERE rnk <= 10 ORDER BY rank
    """,
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew report for a prospective shuffle key (user_id): the
    top-10 hottest keys with exact ppm shares of all rows plus the
    total key count — the diagnostic that decides whether a join/agg
    on this key needs salting or AQE skew handling BEFORE the job
    runs at 100 TB (operators/skew.py is the remedy; this is the
    thermometer). One partial-agg shuffle on the key; the top-10
    resolves via TakeOrdered over the key-count-sized aggregate; the
    totals are a 1-row broadcast."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy(F.col("user_id").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = c.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    from pyspark.sql import Window as _W

    # rank rides a window over the POST-limit 10-row frame (TakeOrdered
    # resolves the limit; the unpartitioned window is bounded)
    top = (
        c.orderBy(F.desc("n"), "key")
        .limit(10)
        .withColumn(
            "rank", F.row_number().over(_W.orderBy(F.desc("n"), "key")).cast("int")
        )
    )
    return (
        top.join(F.broadcast(tot))
        .select(
            "rank", "key", F.col("n").cast("bigint").alias("n"),
            F.expr("(1000000 * n) DIV total").cast("bigint").alias("share_ppm"),
            "n_keys",
        )
        .orderBy("rank")
    )
