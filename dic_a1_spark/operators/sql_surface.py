"""SQL passthrough surface: ANSI SQL executed verbatim by ``spark.sql``.

The reference has no query language — "queries" are mrjob classes launched
from bash (SURVEY.md §3). The Spark-native engine gets a full SQL front end
for free; this module proves it by running ONE dialect-neutral SQL text per
query on BOTH engines: Spark executes it via ``spark.sql`` over registered
temp views, and the driver's DuckDB oracle executes the *identical string*.
Any divergence between Catalyst's and DuckDB's interpretation of the same
ANSI text fails the gate.

Coverage targeted here (shapes the DataFrame surface in
operators/relational.py doesn't already exercise):
  - correlated EXISTS / NOT EXISTS subqueries (rewritten by Catalyst to
    semi/anti joins — verify with .explain)
  - IN (aggregated subquery) with HAVING
  - scalar subqueries in WHERE
  - deterministic ORDER BY ... LIMIT top-k (TakeOrderedAndProject — no
    global sort materialization)
  - multi-alias self-referencing dimension joins (nation x2)

Scale notes: every subquery here decorrelates to a join — Catalyst plans
EXISTS as broadcast/shuffled left-semi, NOT EXISTS as left-anti, and the
scalar subquery as a one-row broadcast cross join. Nothing executes
per-row. Filters written inside the SQL still reach the parquet scans
(PushedFilters), identical to the DataFrame API path.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dic_a1_spark.sources.readers import load_tables

# --- dialect-neutral SQL texts (run verbatim on Spark AND DuckDB) ---------

SQL_TEXTS: dict[str, str] = {
    # Q4 shape: correlated EXISTS -> left semi join on l_orderkey.
    "sql_exists_heavy_orders": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= DATE '1997-01-01'
          AND o_orderdate < DATE '1998-01-01'
          AND EXISTS (
              SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45
          )
        GROUP BY o_orderpriority
    """,
    # Anti-join via NOT EXISTS: customers with no open orders.
    "sql_not_exists_customers": """
        SELECT c_mktsegment, count(*) AS n_customers
        FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
        )
        GROUP BY c_mktsegment
    """,
    # Q18 shape: IN over an aggregated-HAVING subquery.
    "sql_in_large_volume_orders": """
        SELECT c_name, o_orderkey, round(o_totalprice, 2) AS total_price
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        )
    """,
    # Scalar subquery in WHERE: parts pricier than 1.5x the average.
    "sql_scalar_subquery_parts": """
        SELECT p_brand, count(*) AS n_parts,
               round(sum(p_retailprice), 2) AS sum_price
        FROM part
        WHERE p_retailprice > 1.5 * (SELECT avg(p_retailprice) FROM part)
        GROUP BY p_brand
    """,
    # Q10 shape: returned-item revenue, deterministic top 20.
    "sql_top_returned_customers": """
        SELECT c_custkey, c_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    # Q7 shape: nation x2 aliases, trade volume between nation pairs.
    "sql_nation_trade_pairs": """
        SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
               count(*) AS n_items,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS volume
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE cn.n_name < sn.n_name
        GROUP BY sn.n_name, cn.n_name
    """,
}


def _passthrough(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        load_tables(spark, sf_dir)  # registers temp views
        return spark.sql(sql)

    return run


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    name: _passthrough(sql) for name, sql in SQL_TEXTS.items()
}

ORACLES: dict[str, str] = dict(SQL_TEXTS)
