"""Relational operator surface (SURVEY.md §2F) as oracle-verified queries.

The reference has *no* relational operators — every join/agg/window at Bitly
was hand-written Mapper/Reducer code atop gomrjob (SURVEY.md §2F, verified
absent across all 19 files). This module is the capability contract: each
query exercises one operator family through the DataFrame API so Catalyst
owns the physical plan (broadcast vs shuffle join, partial aggregation,
pushdown), which is the whole point of the Spark-first rebuild.

Float determinism: every aggregated double goes through the exact-decimal
helpers in ``gomrjob_spark.functions`` (see that module's docstring) so the
result is bit-identical to the DuckDB oracle. Row-level double arithmetic
(products, differences, ratios of ints) is IEEE-deterministic and stays raw.

Scale notes are in each docstring: these run at sf0.01 for the oracle gate
but are written for 100 TB — filters first (pushdown), dimension joins
broadcast, fact-fact joins shuffle on their keys, no driver-side collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from gomrjob_spark.catalog import load_table
from gomrjob_spark.functions import davg, dmedian_money, dstddev_samp, dsum, money
from gomrjob_spark.plans.registry import query

# Exact decimal views of the revenue expressions (see functions docstring).
_RATE = "decimal(4,2)"


def _disc_price() -> F.Column:
    return money("l_extendedprice") * (F.lit(1).cast(_RATE) - F.col("l_discount").cast(_RATE))


def _charge() -> F.Column:
    return _disc_price() * (F.lit(1).cast(_RATE) + F.col("l_tax").cast(_RATE))


_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)
_SQL_CHARGE = f"({_SQL_DISC_PRICE}) * (1 + CAST(l_tax AS DECIMAL(4,2)))"

# --------------------------------------------------------------------------
# Aggregation family
# --------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)      AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum({_SQL_DISC_PRICE}) AS DOUBLE)                      AS sum_disc_price,
      CAST(sum({_SQL_CHARGE}) AS DOUBLE)                          AS sum_charge,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity)
                                                                  AS avg_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice)
                                                                  AS avg_price,
      CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount)
                                                                  AS avg_disc,
      count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-aggregate, 8 aggregates over 2 group keys.

    Scale: the canonical partial-agg query — map-side HashAggregate shrinks
    the input to (#groups x #partitions) rows before the exchange; the
    shipdate filter and 7-column projection push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(_disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(_charge()).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: highly selective conjunctive filter + scalar agg.

    Scale: every predicate is pushdown-eligible; the scan reads 4 columns.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(money("l_extendedprice") * F.col("l_discount").cast(_RATE))
        .cast("double")
        .alias("revenue")
    )


@query(
    "agg_stats",
    oracle="""
    SELECT
      c_mktsegment,
      count(*)                    AS n_customers,
      count(DISTINCT c_nationkey) AS n_nations,
      CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal) AS avg_bal,
      min(c_acctbal)              AS min_bal,
      max(c_acctbal)              AS max_bal,
      sqrt((CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
            - CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
              * CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
              / CAST(count(c_acctbal) AS DOUBLE))
           / (CAST(count(c_acctbal) AS DOUBLE) - 1.0)) AS std_bal,
      quantile_cont(CAST(round(c_acctbal * 100, 0) AS BIGINT), 0.5) / 100.0 AS median_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate library breadth: distinct, moments, exact median.

    stddev/median are derived from exact decimal moments / integer cents so
    both engines evaluate the identical double expression (bit-equal output);
    see gomrjob_spark.functions.
    """
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            davg("c_acctbal").alias("avg_bal"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            dstddev_samp("c_acctbal").alias("std_bal"),
            dmedian_money("c_acctbal").alias("median_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_conditional",
    oracle="""
    SELECT
      o_orderpriority,
      count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      CAST(sum(CAST(CASE WHEN o_totalprice > 200000 THEN o_totalprice ELSE 0 END
               AS DECIMAL(18,2))) AS DOUBLE)      AS big_total,
      CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS DECIMAL(18,2))) AS DOUBLE)
        / count(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END)
                                                  AS avg_finished_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (FILTER / CASE) — one pass, no self-joins."""
    orders = load_table(spark, sf_dir, "orders")
    finished_price = F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
    return (
        orders.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            dsum(
                F.when(F.col("o_totalprice") > 200000, F.col("o_totalprice")).otherwise(0.0)
            ).alias("big_total"),
            davg(finished_price).alias("avg_finished_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      count(*)                                               AS n,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (reference had only flat Sum; SURVEY §2F)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "agg_cube",
    oracle="""
    SELECT
      o_orderstatus,
      o_orderpriority,
      count(*)                                                  AS n,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)  AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT
      count(DISTINCT l_partkey)  AS exact_parts,
      count(DISTINCT l_suppkey)  AS exact_supps,
      count(DISTINCT l_orderkey) AS exact_orders
    FROM lineitem
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (HLL++ ``approx_count_distinct`` is the 100 TB
    path — exercised in tests with a tolerance bound; the oracle gate needs
    the exact variant since HLL estimates are engine-specific)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query(
    "agg_having",
    oracle="""
    SELECT c_nationkey, count(*) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
    FROM customer
    GROUP BY c_nationkey
    HAVING count(*) >= 5 AND sum(CAST(c_acctbal AS DECIMAL(18,2))) > 0
    ORDER BY c_nationkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-aggregation filter (HAVING)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(money("c_acctbal")).alias("raw_bal"))
        .filter((F.col("n") >= 5) & (F.col("raw_bal") > 0))
        .select("c_nationkey", "n", F.col("raw_bal").cast("double").alias("bal"))
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Join family
# --------------------------------------------------------------------------


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT
      l_orderkey,
      CAST(sum({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
      o_orderdate,
      o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join + agg + top-N.

    Scale: customer (filtered to one segment) broadcasts; orders-lineitem is
    the fact-fact shuffle join on orderkey. Top-10 is a TakeOrdered, not a
    global sort. Unique tiebreaker (l_orderkey) keeps the limit deterministic.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_nation_revenue",
    oracle=f"""
    SELECT
      n_name,
      CAST(sum({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a multi-key dim condition.

    Scale: region/nation/supplier/customer broadcast (dimension tables); the
    only shuffle is orders-lineitem on orderkey — facts join first, dims
    late, and Catalyst is free to reorder further.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT
      c_custkey,
      c_name,
      count(o_orderkey) AS n_orders,
      coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus = 'F'
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with a join-side predicate (kept in the ON clause —
    moving it to WHERE would silently turn the join inner)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderstatus == "F"),
            "left",
        )
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): no row multiplication, right side only probed."""
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_semi_bloom",
    oracle="""
    SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM lineitem
    WHERE EXISTS (
      SELECT 1 FROM part WHERE p_partkey = l_partkey AND p_size = 1
    )
    GROUP BY l_partkey
    ORDER BY l_partkey
    """,
)
def join_semi_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join with a Bloom runtime pre-filter
    (operators.bloomfilter.bloom_semi_join): the selective dimension's
    key set compresses into a broadcast bit array; the fact scan drops
    non-members row-locally BEFORE the exact semi join, so the join
    shuffle carries only probable matches. The result is EXACTLY the
    plain semi join (no false negatives; the exact join removes false
    positives) — the oracle is the plain EXISTS — which is what lets a
    probabilistic structure sit under the hash gate. The 100 TB case is
    a dimension too big to broadcast whole but whose key SET fits in
    bits: the fact table is never shuffled unfiltered."""
    from gomrjob_spark.operators.bloomfilter import bloom_semi_join

    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 1).select(
        F.col("p_partkey").alias("l_partkey")
    )
    matched = bloom_semi_join(lineitem, dim, on="l_partkey")
    return (
        matched.groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum("l_quantity").cast("bigint").alias("sum_qty"),
        )
        .orderBy("l_partkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 420000
    )
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers who never placed a big order
    (every customer has *some* order in the testdata, so the predicate keeps
    the result non-trivial)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 420000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH ec AS (
      SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    ), oc AS (
      SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
    )
    SELECT
      coalesce(ec.user_id, oc.o_custkey) AS entity_id,
      coalesce(ec.n_events, 0)           AS n_events,
      coalesce(oc.n_orders, 0)           AS n_orders
    FROM ec FULL OUTER JOIN oc ON ec.user_id = oc.o_custkey
    ORDER BY entity_id
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join between two aggregated sides (event users vs order
    customers — the key ranges only partially overlap by construction)."""
    ec = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    oc = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return (
        ec.join(oc, ec.user_id == oc.o_custkey, "full_outer")
        .select(
            F.coalesce(ec.user_id, oc.o_custkey).alias("entity_id"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        )
        .orderBy("entity_id")
    )


@query(
    "join_range",
    oracle="""
    SELECT
      o_orderkey,
      count(*)                                               AS n_shipped_late,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_late
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate >= o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderkey
    ORDER BY o_orderkey
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a range predicate (shipments >= 90 days after order).

    Scale: the equi key carries the shuffle; the range condition evaluates
    post-match, so this stays a hash/sort-merge join, not a nested loop.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")),
        )
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_shipped_late"), dsum("l_quantity").alias("qty_late"))
        .orderBy("o_orderkey")
    )


@query(
    "join_argmax",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal AS acctbal
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
      ) AS rn
      FROM customer
    )
    WHERE rn = 1
    ORDER BY c_nationkey
    """,
)
def join_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-per-group (richest customer per nation) via window row_number —
    the scalable pattern for 'join back to the max row' (single shuffle,
    no self-join)."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", "c_name", F.col("c_acctbal").alias("acctbal"))
        .orderBy("c_nationkey")
    )


# --------------------------------------------------------------------------
# Window family
# --------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, revenue, rn
    FROM (
      SELECT
        l_suppkey, l_orderkey, l_linenumber,
        l_extendedprice * (1 - l_discount) AS revenue,
        row_number() OVER (
          PARTITION BY l_suppkey
          ORDER BY l_extendedprice * (1 - l_discount) DESC, l_orderkey, l_linenumber
        ) AS rn
      FROM lineitem
    )
    WHERE rn <= 3
    ORDER BY l_suppkey, rn
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: window row_number + filter — one shuffle on the
    partition key; at scale AQE handles skewed suppliers. Row-level double
    arithmetic is IEEE-deterministic (bit-equal across engines), tiebroken
    by the unique (orderkey, linenumber)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    w = W.partitionBy("l_suppkey").orderBy(rev.desc(), F.col("l_orderkey"), F.col("l_linenumber"))
    return (
        li.select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            rev.alias("revenue"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .orderBy("l_suppkey", "rn")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_orderdate,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
      ) AS DOUBLE) AS running_total,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
      ) AS DOUBLE) / count(*) OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
      ) AS moving_avg3
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total + 3-row moving average (ROWS frames). Decimal window
    sums keep the result order-independent and bit-equal cross-engine
    (DuckDB evaluates large frames via segment trees — a different addition
    order than Spark's running accumulator)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    frame3 = w.rowsBetween(-2, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(money("o_totalprice"))
        .over(w.rowsBetween(W.unboundedPreceding, 0))
        .cast("double")
        .alias("running_total"),
        (F.sum(money("o_totalprice")).over(frame3).cast("double") / F.count(F.lit(1)).over(frame3)).alias(
            "moving_avg3"
        ),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_range_frame",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_orderdate,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
        AS spend_30d,
      CAST(count(*) OVER w AS BIGINT) AS orders_30d
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW
    )
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, peers included) — 30-day trailing
    spend per customer, ordered by days-since-epoch so the frame bound is
    integer arithmetic on both engines. Unlike the ROWS frames above, a
    RANGE frame's extent depends on the ORDER BY value, and same-day
    orders are frame peers. Decimal window sum keeps the result
    order-independent; one shuffle on the partition key."""
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
    w = W.partitionBy("o_custkey").orderBy(days).rangeBetween(-30, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(money("o_totalprice")).over(w).cast("double").alias("spend_30d"),
        F.count(F.lit(1)).over(w).alias("orders_30d"),
    ).orderBy("o_custkey", "o_orderkey")


@query(
    "window_lag_lead",
    oracle="""
    SELECT
      o_custkey, o_orderkey, o_orderdate,
      o_totalprice                            AS totalprice,
      o_totalprice - lag(o_totalprice) OVER w AS delta_prev,
      lead(o_totalprice) OVER w               AS next_price,
      CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS INT)
                                              AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation + inter-row date arithmetic (row-level double
    subtraction is bit-deterministic — no canonicalization needed)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").alias("totalprice"),
        (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).alias("delta_prev"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.datediff(F.col("o_orderdate"), F.lag("o_orderdate").over(w)).alias("days_since_prev"),
    ).orderBy("o_custkey", "o_orderdate", "o_orderkey")


@query(
    "window_rank_ntile",
    oracle="""
    SELECT
      c_nationkey, c_custkey,
      rank()       OVER w AS rnk,
      dense_rank() OVER w AS drnk,
      ntile(4)     OVER w AS quartile,
      percent_rank() OVER w AS pct_rank,
      cume_dist() OVER w    AS cdist
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    ORDER BY c_nationkey, rnk, c_custkey
    """,
)
def window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: rank, dense_rank, ntile, percent_rank, cume_dist
    (the ratios are int/int divisions — bit-deterministic, left raw)."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return cust.select(
        "c_nationkey",
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cdist"),
    ).orderBy("c_nationkey", "rnk", "c_custkey")


# --------------------------------------------------------------------------
# Sort / limit / set ops / distinct
# --------------------------------------------------------------------------


@query(
    "top_n_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice AS totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 15
    """,
)
def top_n_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject (per-partition heap +
    driver merge of N, not a full sort) — the scalable top-N."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", F.col("o_totalprice").alias("totalprice"), "o_orderdate"
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey"))
        .limit(15)
    )


@query(
    "set_ops",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'),
         y97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT 'both' AS op, count(*) AS n FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
    UNION ALL
    SELECT 'only_96' AS op, count(*) AS n FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    UNION ALL
    SELECT 'either' AS op, count(*) AS n FROM (SELECT * FROM y96 UNION SELECT * FROM y97)
    ORDER BY op
    """,
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT / UNION-distinct over customer cohorts."""
    orders = load_table(spark, sf_dir, "orders")

    def cohort(y0: str, y1: str) -> DataFrame:
        return (
            orders.filter(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            )
            .select("o_custkey")
            .distinct()
        )

    y96 = cohort("1996-01-01", "1997-01-01")
    y97 = cohort("1997-01-01", "1998-01-01")
    both = y96.intersect(y97).agg(F.count(F.lit(1)).alias("n")).select(F.lit("both").alias("op"), "n")
    only96 = (
        y96.exceptAll(y97)
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("only_96").alias("op"), "n")
    )
    either = (
        y96.union(y97).distinct().agg(F.count(F.lit(1)).alias("n")).select(F.lit("either").alias("op"), "n")
    )
    return both.unionByName(only96).unionByName(either).orderBy("op")


@query(
    "distinct_pairs",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT (dropDuplicates) over a column pair."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_mktsegment", "c_nationkey").distinct().orderBy("c_mktsegment", "c_nationkey")


# --------------------------------------------------------------------------
# Scalar function families
# --------------------------------------------------------------------------


@query(
    "scalar_string",
    oracle="""
    SELECT
      p_partkey,
      upper(p_brand)                                   AS brand_upper,
      lower(p_type)                                    AS type_lower,
      CAST(length(p_name) AS INT)                      AS name_len,
      substr(p_name, 1, 8)                             AS name_prefix,
      concat_ws('|', p_brand, p_type)                  AS brand_type,
      replace(p_type, ' ', '_')                        AS type_snake,
      trim(p_name)                                     AS name_trim,
      lpad(CAST(p_size AS VARCHAR), 4, '0')            AS size_padded,
      CAST(len(string_split(p_name, ' ')) AS INT)      AS n_words,
      CAST(contains(p_type, 'BRASS') AS BOOLEAN)       AS has_brass,
      CAST(position('o' IN p_name) AS INT)             AS first_o
    FROM part
    ORDER BY p_partkey
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (upper/lower/length/substr/concat/replace/
    trim/pad/split/contains/position)."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim("p_name").alias("name_trim"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.col("p_type").contains("BRASS").alias("has_brass"),
        F.instr("p_name", "o").alias("first_o"),
    ).orderBy("p_partkey")


@query(
    "scalar_date",
    oracle="""
    SELECT
      o_orderkey,
      CAST(year(o_orderdate) AS INT)                    AS yr,
      CAST(month(o_orderdate) AS INT)                   AS mon,
      CAST(day(o_orderdate) AS INT)                     AS dom,
      CAST(quarter(o_orderdate) AS INT)                 AS qtr,
      date_trunc('month', o_orderdate)                  AS month_start,
      CAST(o_orderdate + INTERVAL 30 DAY AS TIMESTAMP)  AS due_date,
      CAST(date_diff('day', o_orderdate, TIMESTAMP '2000-01-01') AS INT)
                                                        AS days_to_y2k,
      CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
      CAST(dayofweek(o_orderdate) + 1 AS INT)           AS dow
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family. DuckDB's dayofweek is 0=Sunday, Spark's is
    1=Sunday — the oracle shifts to Spark's convention; DATE-typed results
    are pinned to TIMESTAMP on both sides."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mon"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate")).alias("days_to_y2k"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
    ).orderBy("o_orderkey")


@query(
    "scalar_math",
    oracle="""
    SELECT
      p_partkey,
      abs(p_retailprice - 1000)                    AS abs_diff,
      CAST(ceil(p_retailprice) AS BIGINT)          AS price_ceil,
      CAST(floor(p_retailprice) AS BIGINT)         AS price_floor,
      sqrt(p_retailprice)                          AS price_sqrt,
      round(ln(p_retailprice), 6)                  AS price_ln,
      round(log10(p_retailprice), 6)               AS price_log10,
      CAST(p_size AS DOUBLE) * CAST(p_size AS DOUBLE) AS size_sq,
      CAST(p_size % 7 AS INT)                      AS size_mod7,
      CAST(sign(p_retailprice - 1000) AS DOUBLE)   AS price_sign,
      greatest(p_retailprice, 500.0)               AS at_least_500,
      least(p_retailprice, 1500.0)                 AS at_most_1500
    FROM part
    ORDER BY p_partkey
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family. sqrt/abs/floor/ceil are IEEE-exact (raw);
    ln/log10 go through libm (JVM vs C differ by ulps) so those are rounded
    to 6 places on both sides; casts pin cross-engine result types."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.abs(F.col("p_retailprice") - 1000).alias("abs_diff"),
        F.ceil("p_retailprice").cast("bigint").alias("price_ceil"),
        F.floor("p_retailprice").cast("bigint").alias("price_floor"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        F.round(F.log("p_retailprice"), 6).alias("price_ln"),
        F.round(F.log10("p_retailprice"), 6).alias("price_log10"),
        (F.col("p_size").cast("double") * F.col("p_size").cast("double")).alias("size_sq"),
        (F.col("p_size") % 7).alias("size_mod7"),
        F.signum(F.col("p_retailprice") - 1000).alias("price_sign"),
        F.greatest("p_retailprice", F.lit(500.0)).alias("at_least_500"),
        F.least("p_retailprice", F.lit(1500.0)).alias("at_most_1500"),
    ).orderBy("p_partkey")


@query(
    "scalar_json",
    oracle="""
    SELECT
      event_id,
      json_extract_string(props, '$.k')            AS k_str,
      CAST(json_extract(props, '$.k') AS BIGINT)   AS k_int,
      CAST(len(json_keys(props)) AS INT)           AS n_keys
    FROM events
    WHERE event_id < 1000
    ORDER BY event_id
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path access over the schema-less ``props`` payload — the engine
    replacement for the reference's simplejson ``.Get()`` chains
    (/root/reference/mrproto/protocol.go:17-42)."""
    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        F.size(F.json_object_keys("props")).alias("n_keys"),
    ).orderBy("event_id")


@query(
    "pivot_event_types",
    oracle="""
    SELECT
      user_id,
      coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'click') AS DOUBLE), 0.0)    AS click,
      coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'view') AS DOUBLE), 0.0)     AS view,
      coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'purchase') AS DOUBLE), 0.0) AS purchase,
      coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'signup') AS DOUBLE), 0.0)   AS signup,
      coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) FILTER (WHERE event_type = 'error') AS DOUBLE), 0.0)    AS error
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (explicit value list — at scale an implicit pivot triggers a
    distinct-scan planning job; always enumerate)."""
    events = load_table(spark, sf_dir, "events")
    kinds = ["click", "view", "purchase", "signup", "error"]
    piv = (
        events.withColumn("value_dec", money("value"))
        .groupBy("user_id")
        .pivot("event_type", kinds)
        .sum("value_dec")
    )
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(k).cast("double"), F.lit(0.0)).alias(k) for k in kinds],
    ).orderBy("user_id")


@query(
    "case_when_bucketing",
    oracle="""
    SELECT
      CASE
        WHEN o_totalprice < 100000 THEN 'small'
        WHEN o_totalprice < 300000 THEN 'medium'
        ELSE 'large'
      END      AS bucket,
      count(*) AS n,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_price
    FROM orders
    GROUP BY 1
    ORDER BY bucket
    """,
)
def case_when_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN bucketing + group-by over the derived column."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "small")
        .when(F.col("o_totalprice") < 300000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), davg("o_totalprice").alias("avg_price"))
        .orderBy("bucket")
    )


@query(
    "set_ops_all",
    oracle="""
    WITH y96 AS (SELECT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01'),
         y97 AS (SELECT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                   AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT 'except_all' AS op, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM y96 EXCEPT ALL SELECT * FROM y97)
    UNION ALL
    SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM y96 INTERSECT ALL SELECT * FROM y97)
    UNION ALL
    SELECT 'union_all' AS op, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM y96 UNION ALL SELECT * FROM y97)
    ORDER BY op
    """,
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations (the ALL variants `set_ops`' distinct
    forms don't cover): EXCEPT ALL keeps max(c1-c2, 0) copies per key,
    INTERSECT ALL keeps min(c1, c2) — bag semantics Spark implements
    with a count-difference aggregate (one shuffle per side, no
    row-by-row matching). Counts per op, exact bigints."""
    orders = load_table(spark, sf_dir, "orders")

    def cohort(y0: str, y1: str) -> DataFrame:
        return orders.filter(
            (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
        ).select("o_custkey")

    y96 = cohort("1996-01-01", "1997-01-01")
    y97 = cohort("1997-01-01", "1998-01-01")
    rows = [
        ("except_all", y96.exceptAll(y97)),
        ("intersect_all", y96.intersectAll(y97)),
        ("union_all", y96.unionAll(y97)),
    ]
    out = None
    for op, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "n"
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("op")


@query(
    "timeseries_mom_change",
    oracle="""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate) AS month,
             CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
               AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT month, rev_cents,
           lag(rev_cents) OVER (ORDER BY month) AS prev_cents,
           CAST(rev_cents - lag(rev_cents) OVER (ORDER BY month) AS DOUBLE)
             / lag(rev_cents) OVER (ORDER BY month) AS mom_change
    FROM m ORDER BY month
    """,
)
def timeseries_mom_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue change — the period-over-period KPI
    shape: one monthly partial-agg shuffle, then lag over the
    MONTH-COUNT-sized aggregate (the unpartitioned window runs over
    ~tens of rows post-aggregation — bounded, the same class as the
    per-partition offset windows — never over the raw fact stream).
    Exact cents; the change ratio is one IEEE division."""
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "rev_cents"
        )
    )
    w = W.orderBy("month")
    return (
        m.withColumn("prev_cents", F.lag("rev_cents").over(w))
        .withColumn(
            "mom_change",
            (F.col("rev_cents") - F.col("prev_cents")).cast("double")
            / F.col("prev_cents"),
        )
        .orderBy("month")
    )


@query(
    "revenue_share_hierarchy",
    oracle="""
    WITH base AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(round(o.o_totalprice * 100, 0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY 1, 2
    ),
    reg AS (SELECT region, CAST(sum(cents) AS BIGINT) AS region_cents
            FROM base GROUP BY 1),
    tot AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM base)
    SELECT b.region, b.nation, b.cents,
           CAST((1000000 * b.cents) // r.region_cents AS BIGINT)
             AS share_of_region_ppm,
           CAST((1000000 * r.region_cents) // t.total_cents AS BIGINT)
             AS region_share_ppm
    FROM base b JOIN reg r USING (region), tot t
    ORDER BY region, nation
    """,
)
def revenue_share_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent rollup (the ratio-to-report BI shape): nation
    revenue as an exact ppm share of its region, and each region as a
    share of the grand total — one star-join aggregate, then parent
    totals join back (region-count-sized broadcast; grand total a
    1-row broadcast). Exact cents + integer ppm DIVs throughout."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (
        orders.join(customer, orders["o_custkey"] == customer["c_custkey"])
        .join(F.broadcast(nation), customer["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "cents"
            )
        )
    )
    reg = base.groupBy("region").agg(
        F.sum("cents").cast("bigint").alias("region_cents")
    )
    tot = base.agg(F.sum("cents").cast("bigint").alias("total_cents"))
    return (
        base.join(F.broadcast(reg), "region")
        .join(F.broadcast(tot))
        .select(
            "region", "nation", "cents",
            F.expr("(1000000 * cents) DIV region_cents").cast("bigint").alias(
                "share_of_region_ppm"
            ),
            F.expr("(1000000 * region_cents) DIV total_cents").cast("bigint").alias(
                "region_share_ppm"
            ),
        )
        .orderBy("region", "nation")
    )


@query(
    "dataset_diff",
    oracle="""
    WITH old AS (
      SELECT o_orderkey AS k, o_orderstatus AS v FROM orders
      WHERE o_orderdate < TIMESTAMP '1999-01-01'
    ),
    new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 7 = 0 THEN 'UPDATED'
                  ELSE o_orderstatus END AS v
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    ),
    j AS (
      SELECT coalesce(old.k, new.k) AS k, old.v AS ov, new.v AS nv,
             old.k IS NULL AS only_new, new.k IS NULL AS only_old
      FROM old FULL OUTER JOIN new ON old.k = new.k
    )
    SELECT CASE WHEN only_new THEN 'added'
                WHEN only_old THEN 'removed'
                WHEN ov = nv THEN 'unchanged'
                ELSE 'changed' END AS status,
           CAST(count(*) AS BIGINT) AS n
    FROM j GROUP BY 1 ORDER BY status
    """,
)
def dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed snapshot reconciliation — the diff report between two
    dataset versions (here: order cohorts with an overlapping date
    window standing in for old/new loads): added / removed / changed /
    unchanged counts from ONE full-outer key join with row-local
    classification — the audit a pipeline runs after every merge_upsert
    / CDC apply to prove the delta did what it claimed. Key-only
    shuffles; payload restricted to the compared column."""
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    ).select(F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("ov"))
    new = orders.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp")
    ).select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("UPDATED"))
        .otherwise(F.col("o_orderstatus"))
        .alias("nv"),
    )
    j = old.join(new, "k", "full_outer")
    status = (
        F.when(F.col("ov").isNull(), F.lit("added"))
        .when(F.col("nv").isNull(), F.lit("removed"))
        .when(F.col("ov") == F.col("nv"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.groupBy(status.alias("status"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("status")
    )
