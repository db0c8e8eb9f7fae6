"""Raw-SQL surface: the engine's tables as ANSI SQL, no DataFrame code.

A gomrjob user migrating here doesn't have to adopt the DataFrame API:
``catalog.register_views`` exposes every table as a temp view and
``spark.sql`` runs the query. The registered query below makes that
claim falsifiable — ONE dialect-shared SQL string (CTE + 4-way join +
correlated EXISTS + window + outer filter) is executed verbatim by BOTH
engines: Spark runs it via ``spark.sql``, the DuckDB oracle runs the
identical text. Any divergence in semantics between the engine's SQL
surface and ANSI breaks the hash."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from gomrjob_spark.catalog import register_views
from gomrjob_spark.plans.registry import query

#: one SQL text, two engines (restricted to the dialect intersection:
#: explicit CASTs where the engines' natural return types differ —
#: year() and row_number() are BIGINT in DuckDB, INT in Spark)
_TOPN_REVENUE_SQL = """
SELECT o_year, n_name, revenue, rnk FROM (
  SELECT o_year, n_name, revenue,
         CAST(row_number() OVER (
           PARTITION BY o_year ORDER BY revenue DESC, n_name) AS INT) AS rnk
  FROM (
    SELECT n_name,
           CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE EXISTS (SELECT 1 FROM supplier WHERE s_nationkey = n_nationkey)
    GROUP BY n_name, year(o_orderdate)
  ) rev
) ranked
WHERE rnk <= 3
ORDER BY o_year, rnk
"""


@query("sql_passthrough_topn_revenue", oracle=_TOPN_REVENUE_SQL)
def sql_passthrough_topn_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 nations by customer revenue per year, written ONCE in ANSI
    SQL and executed verbatim by both engines (see module docstring).
    Catalyst still plans it: dimension joins broadcast, the EXISTS
    decorrelates to a semi join, the window runs after the aggregate."""
    register_views(spark, sf_dir)
    return spark.sql(_TOPN_REVENUE_SQL)
