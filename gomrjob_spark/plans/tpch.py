"""Further TPC-H-shaped analytics over the fixture schemas (q7, q10,
q14, q15, q19 adapted — SURVEY.md §2F "TPC-H-shaped analytics" row).

Each exercises a distinct plan shape the earlier queries don't: a
self-aliased dimension joined twice (q7), a high-cardinality group with
revenue ordering (q10), conditional-aggregate ratio (q14), scalar-max
against a derived view (q15), and disjunctive multi-column predicates
that must still push down (q19).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from gomrjob_spark.catalog import load_table
from gomrjob_spark.functions import money
from gomrjob_spark.plans.registry import query

_RATE = "decimal(4,2)"
_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


def _disc_price() -> F.Column:
    return money("l_extendedprice") * (F.lit(1).cast(_RATE) - F.col("l_discount").cast(_RATE))


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year,
             {_SQL_DISC_PRICE} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
          OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nation dimension joined twice under different roles (supplier's
    vs customer's nation) with a symmetric pair predicate. Both nation
    sides broadcast; the fact joins shuffle on their keys."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    pair = (F.col("supp_nation") == "NATION_20") & (F.col("cust_nation") == "NATION_11") | (
        F.col("supp_nation") == "NATION_11"
    ) & (F.col("cust_nation") == "NATION_20")
    return (
        lineitem.join(supplier, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(sum({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(c_acctbal AS DOUBLE) AS acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= DATE '1995-10-01'
      AND o_orderdate <  DATE '1996-01-01'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item revenue per customer, top 20 — high-cardinality
    group + global top-k (orderBy.limit compiles to TakeOrderedAndProject,
    no full sort materialization)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT CAST(100.00 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                         THEN {_SQL_DISC_PRICE} ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
                / CAST(sum({_SQL_DISC_PRICE}) AS DOUBLE) AS DOUBLE) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= DATE '1995-09-01' AND l_shipdate < DATE '1995-10-01'
    """,
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-aggregate ratio (promo revenue share). Part is the
    broadcast side; both sums come out of one aggregate pass."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dp = _disc_price()
    promo = F.when(F.col("p_type").like("PROMO%"), dp).otherwise(
        F.lit(0).cast("decimal(24,4)")
    )
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (F.lit(100.00) * F.sum(promo).cast("double") / F.sum(dp).cast("double"))
            .cast("double")
            .alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(sum({_SQL_DISC_PRICE}) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-04-01'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT max(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-max against a derived view (the CREATE VIEW of TPC-H q15).
    The revenue aggregate runs once (cached via a local checkpointless
    reuse — Spark recomputes the tiny aggregate, acceptable; at scale
    persist it); the max is a 1-row broadcast, equality join filters.

    Exact-decimal note: total_revenue is compared for equality against
    the max — both sides are the same exact-decimal double, so equality
    is well-defined."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_disc_price()).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("_max"))
        .join(supplier, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q19_discounted_revenue",
    oracle=f"""
    SELECT CAST(sum({_SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
            AND l_quantity >= 1 AND l_quantity <= 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
            AND l_quantity >= 10 AND l_quantity <= 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 20 AND l_quantity <= 30))
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive predicates across both join sides (TPC-H q19 shape,
    container/shipmode clauses adapted to fixture columns). The equi key
    still drives a hash join; the OR-of-ANDs evaluates as the join
    residual."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
        | (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
        | (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_7' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year,
             {_SQL_DISC_PRICE} AS volume,
             n2.n_name AS supp_nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND s_nationkey = n2.n_nationkey
        AND r_name = 'EUROPE' AND p_type = 'ECONOMY'
        AND o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
    ) all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market per year —
    a conditional-sum ratio over an 8-table star (nation joined twice
    under different roles). Exact-decimal numerator/denominator, divided
    once in double.

    Scale: part/customer/supplier/nation/region all broadcast; the only
    shuffle is lineitem-orders on orderkey. The p_type and date filters
    push into the scans."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,2)")
    volume = _disc_price()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_7", volume).otherwise(zero))
                .cast("double")
                / F.sum(volume).cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS o_year,
             {_SQL_DISC_PRICE}
               - CAST(p_retailprice AS DECIMAL(18,2))
                 * CAST(0.8 AS DECIMAL(3,2))
                 * CAST(l_quantity AS DECIMAL(12,2)) AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: per-nation, per-year profit on a part-name family.
    The fixture has no partsupp, so supply cost is modeled as 80% of
    p_retailprice — the plan shape (5-table join, substring filter on a
    dimension, two-level group) is the point. All arithmetic stays in
    exact decimals until the final cast.

    Scale: part (filtered by LIKE) broadcasts, as do supplier/nation;
    lineitem-orders shuffle on orderkey only."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    amount = _disc_price() - (
        money("p_retailprice")
        * F.lit("0.8").cast("decimal(3,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("amount").cast("double").alias("sum_profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey,
             min(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY 1, 2)
    SELECT CAST(s_acctbal AS DOUBLE) AS acctbal, s_name, n_name,
           p_partkey, p_name, supplycost
    FROM part, supply, supplier, nation, region
    WHERE p_partkey = supply.l_partkey AND s_suppkey = supply.l_suppkey
      AND p_size <= 15 AND p_type = 'STANDARD'
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'EUROPE'
      AND supplycost = (
        SELECT min(s2.supplycost)
        FROM supply s2, supplier sp2, nation n2, region r2
        WHERE s2.l_partkey = p_partkey AND sp2.s_suppkey = s2.l_suppkey
          AND sp2.s_nationkey = n2.n_nationkey
          AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
    ORDER BY acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: minimum-cost supplier per part in a region, via a
    correlated-min subquery. The fixture has no partsupp, so the supply
    relation is derived: distinct (l_partkey, l_suppkey) pairs from
    lineitem with supplycost = min unit price ever charged. The correlated
    min decorrelates to a window min over p_partkey after the region
    filter — exactly what Catalyst would produce for the subquery form.

    supplycost is a row-level double division then MIN — both
    order-independent and IEEE-identical across engines, so the equality
    against the per-part min is exact.

    Scale: the supply aggregation shuffles lineitem once on the composite
    key (map-side partial min); part (filtered), nation and region
    broadcast; the supplier side joins via shuffle (post-broadcast-join
    size estimates keep it out of auto-broadcast — correct at scale,
    where the region-filtered supplier dimension outgrows a broadcast);
    the window min adds one shuffle on p_partkey."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supply = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    parts = part.filter((F.col("p_size") <= 15) & (F.col("p_type") == "STANDARD"))
    eu_supp = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = supply.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")).join(
        eu_supp, F.col("l_suppkey") == F.col("s_suppkey")
    )
    w = W.partitionBy("p_partkey")
    return (
        cand.withColumn("_min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("_min_cost"))
        .select(
            F.col("s_acctbal").cast("double").alias("acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            "supplycost",
        )
        .orderBy(F.desc("acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q20_potential_promotion",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey,
             sum(CAST(l_quantity AS DECIMAL(12,2))) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
      GROUP BY 1, 2)
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM shipped
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        AND qty > CAST(0.5 AS DECIMAL(3,2)) * (
          SELECT sum(s2.qty) FROM shipped s2
          WHERE s2.l_partkey = shipped.l_partkey))
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate a promo part's annual
    volume — nested IN subqueries with a correlated aggregate. Without
    partsupp, "availqty > half the year's shipments" becomes "shipped
    more than half of the part's total 1995 volume" over the derived
    supply relation. (The q20 nation filter is dropped: the smoke SF has
    10 suppliers total, so any per-nation cut is vacuous.)

    Quantities are summed as exact decimals so the >50% comparison is
    bit-identical across engines.

    Scale: one lineitem shuffle for the (partkey, suppkey) rollup (date
    filter pushed to the scan), the promo part list is a broadcast semi
    join, the per-part total is a window sum on partkey, and the final
    supplier filter is a broadcast semi join on the small qualifying-id
    set."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    shipped = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty"))
    )
    promo = part.filter(F.col("p_type") == "PROMO").select("p_partkey")
    w = W.partitionBy("l_partkey")
    qualifying = (
        shipped.join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .withColumn("_total", F.sum("qty").over(w))
        .filter(F.col("qty") > F.lit("0.5").cast("decimal(3,2)") * F.col("_total"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(qualifying), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("acctbal"))
        .orderBy("s_name")
    )


@query(
    "q12_priority_lines",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts of high/low-priority orders per
    line category (the fixture has no l_shipmode, so lines group by
    l_returnflag). One fact-fact shuffle; the date filter pushes to the
    lineitem scan; both counts come from the same pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )
