"""Subquery-shaped relational queries (TPC-H q4/q13/q16/q17/q18/q22 shapes).

Under gomrjob every one of these was a hand-written multi-step MapReduce
chain (tagged-union reduce-side joins; SURVEY.md §2F "joins: absent").
Here each is declared once: the oracle states the textbook subquery form,
the Spark side states the decorrelated join form Catalyst would produce —
semi/anti joins for EXISTS/NOT EXISTS, aggregate-then-join for correlated
scalar subqueries. Dimension-sized sides are broadcast; fact-fact joins
shuffle on their keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gomrjob_spark.catalog import load_table
from gomrjob_spark.functions import dsum
from gomrjob_spark.plans.registry import query

_SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"
)


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS correlated subquery == left-semi join on the fact table
    (TPC-H q4 shape; the fixture lineitem has no commit/receipt dates, so
    "order with a returned item" is the EXISTS predicate).

    Scale: the lineitem side is filtered before the semi join (pushdown),
    and a semi join shuffles only the join key + no payload; the orders
    date filter prunes partitions when orderdate is the partition key."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    returned = lineitem.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1995-04-01")
        )
        .join(returned, orders["o_orderkey"] == returned["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority NOT LIKE '3-%'
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join with a join-side predicate, then a two-level aggregate
    (orders-per-customer histogram; TPC-H q13 shape with the NOT LIKE on
    o_orderpriority — the fixture has no o_comment). count(col)
    null-skipping semantics on the outer side is the point exercised."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        ~F.col("o_orderpriority").like("3-%")
    )
    per_cust = (
        customer.join(orders, customer["c_custkey"] == orders["o_custkey"], "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q16_parts_supplier",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#45'
      AND p_type NOT LIKE 'MEDIUM POLISHED%'
      AND p_size IN (49, 14, 23, 45, 19, 3, 36, 9)
      AND l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000.0
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN subquery == broadcast anti join (the excluded-supplier list
    is tiny); distinct-count of suppliers per part group. (TPC-H q16 reads
    partsupp and excludes by s_comment; the fixture has neither, so
    lineitem provides the part-supplier association and a low-balance
    predicate the exclusion list — same operator shape.)"""
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    complainers = supplier.filter(F.col("s_acctbal") < 2000.0).select("s_suppkey")
    pt = part.filter(
        (F.col("p_brand") != "Brand#45")
        & ~F.col("p_type").like("MEDIUM POLISHED%")
        & F.col("p_size").isin(49, 14, 23, 45, 19, 3, 36, 9)
    )
    return (
        lineitem.join(
            F.broadcast(complainers),
            lineitem["l_suppkey"] == complainers["s_suppkey"],
            "left_anti",
        )
        .join(F.broadcast(pt), lineitem["l_partkey"] == pt["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS DOUBLE)
             AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#23' AND p_size < 25
      AND l_quantity < (
        SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = part.p_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-part avg quantity) decorrelated to
    aggregate-then-join (TPC-H q17 shape; p_size stands in for the missing
    p_container). The per-part aggregate shrinks lineitem to one row per
    part key before the join, so the second pass joins fact x tiny."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    target_parts = part.filter(
        (F.col("p_brand") == "Brand#23") & (F.col("p_size") < 25)
    ).select("p_partkey")
    li = lineitem.join(F.broadcast(target_parts), lineitem["l_partkey"] == F.col("p_partkey"))
    thresholds = li.groupBy("p_partkey").agg((F.avg("l_quantity") * 0.2).alias("qty_limit"))
    small = li.join(F.broadcast(thresholds), "p_partkey").filter(
        F.col("l_quantity") < F.col("qty_limit")
    )
    return small.agg((dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN (aggregating subquery) == semi join against a groupBy-having
    frame. The heavy lineitem aggregate runs once; its survivors (few) are
    broadcast into the semi join."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_q"))
        .filter(F.col("_q") > 250)
        .select("l_orderkey")
    )
    return (
        orders.join(
            F.broadcast(big), orders["o_orderkey"] == big["l_orderkey"], "left_semi"
        )
        .join(customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("o_orderkey") == lineitem["l_orderkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
      FROM customer
      WHERE substring(c_name, 17, 2) IN ('13', '31', '23', '29', '30', '18', '17')
        AND c_acctbal > (
          SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(c_acctbal)
          FROM customer
          WHERE c_acctbal > 0.00
            AND substring(c_name, 17, 2) IN ('13', '31', '23', '29', '30', '18', '17')
        )
    ) cust
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = cust.c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery (global avg via cross-broadcast of a
    1-row frame) + NOT EXISTS (anti join). The avg is computed exactly in
    decimal then compared in double — both engines see the identical value.
    (TPC-H q22 shape; the customer-name digit suffix stands in for the
    missing c_phone country code; "has never placed an order" narrows to
    "has never placed an URGENT order" because the fixture's uniform
    o_custkey leaves no order-less customers at any SF — the unrestricted
    form is vacuously empty, which would match any oracle.)"""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    codes = ("13", "31", "23", "29", "30", "18", "17")
    in_codes = customer.withColumn("cntrycode", F.substring("c_name", 17, 2)).filter(
        F.col("cntrycode").isin(*codes)
    )
    # exact average: decimal sum / count, evaluated once, broadcast to all rows
    avg_bal = in_codes.filter(F.col("c_acctbal") > 0.00).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")) / F.count("c_acctbal"))
        .cast("double")
        .alias("_avg")
    )
    rich = in_codes.join(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("_avg"))
    no_orders = rich.join(
        orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey"),
        rich["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return (
        no_orders.groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@query(
    "q11_important_balances",
    oracle="""
    SELECT n_name,
           CAST(sum(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS value
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name
    HAVING sum(CAST(s_acctbal AS DECIMAL(18,2))) >
           (SELECT sum(CAST(s_acctbal AS DECIMAL(18,2))) * CAST(0.05 AS DECIMAL(3,2))
            FROM supplier)
    ORDER BY value DESC, n_name
    """,
)
def q11_important_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: groups filtered by a HAVING clause against a
    global scalar subquery (the fixture has no partsupp, so the "value"
    is supplier account balance by nation at a 5% threshold). The global
    total is one aggregated row cross-joined (broadcast) onto the
    per-group aggregate — the decorrelation Catalyst produces for an
    uncorrelated scalar subquery. The resulting plan contains a
    BroadcastNestedLoopJoin whose build side is ONE aggregated row —
    O(n) work, the intended shape for a global-scalar comparison (unlike
    a data-sized BNLJ, which plan tests ban elsewhere). Comparison
    happens in exact decimals; only the output casts to double."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    bal = F.col("s_acctbal").cast("decimal(18,2)")
    per_nation = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(bal).alias("_total"))
    )
    threshold = supp.agg(
        (F.sum(bal) * F.lit("0.05").cast("decimal(3,2)")).alias("_cutoff")
    )
    return (
        per_nation.join(F.broadcast(threshold))
        .filter(F.col("_total") > F.col("_cutoff"))
        .select("n_name", F.col("_total").cast("double").alias("value"))
        .orderBy(F.col("value").desc(), F.col("n_name"))
    )


@query(
    "q21_waiting_suppliers",
    oracle="""
    SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY
      )
      AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3'
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the hardest subquery form: EXISTS plus NOT
    EXISTS, both correlated on the outer row's order AND anti-correlated
    on its supplier (a different supplier in the same order). "Kept
    waiting" adapts to shipped >90 days after the order date (the
    fixture has no commit/receipt dates).

    Decorrelation: EXISTS == left-semi join on (orderkey, suppkey !=);
    NOT EXISTS == left-anti join against the late-line set with the same
    key pair. Both shuffles carry only orderkey/suppkey; the supplier
    nation filter broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")

    late1 = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey", "o_orderdate")
    )
    # EXISTS: some other supplier has ANY line in the same order
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    with_other = late1.join(
        l2,
        (late1.l_orderkey == l2.l2_orderkey) & (late1.l_suppkey != l2.l2_suppkey),
        "left_semi",
    )
    # NOT EXISTS: no other supplier was ALSO late in that order
    late3 = late1.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    sole_late = with_other.join(
        late3,
        (with_other.l_orderkey == late3.l3_orderkey)
        & (with_other.l_suppkey != late3.l3_suppkey),
        "left_anti",
    )
    return (
        sole_late.join(F.broadcast(supp), sole_late.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
    )
