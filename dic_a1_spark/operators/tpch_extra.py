"""Second tranche of TPC-H-shaped relational queries (Q4/Q13/Q14/Q19/Q22).

The reference has exactly one join — a hand-rolled 22-row map-side
broadcast (src/chiSquaredJob.py:37-57,87-88) — so these queries exist to
round out the join/subquery surface the reference never needed:
correlated EXISTS with a non-equi component, outer join with a join-side
(not WHERE-side) predicate, conditional-aggregate ratios, disjunctive
bracket predicates, and scalar-subquery + anti-join composition. The
driver's tables lack partsupp and ship-mode columns, so each query keeps
the canonical TPC-H *shape* on the columns that exist.

Scale notes:
  - q4: the EXISTS decorrelates to a LEFT SEMI join on l_orderkey with
    the l_shipdate > o_orderdate residual evaluated during the merge —
    one shuffle each side, no per-row subquery. The date filter on
    orders reaches the parquet scan.
  - q13: LEFT OUTER keeps every customer; the priority predicate lives
    in the JOIN clause so unmatched customers count as 0 orders (the
    classic Q13 trap — a WHERE would silently drop them). The second
    aggregate has a tiny key domain but its partial phase collapses
    |customers| rows map-side before the shuffle.
  - q14: ratio of two conditional sums in one pass — no second scan, no
    self-join; part side broadcasts at dimension scale.
  - q19: the OR-of-ANDs predicate is accompanied by its implied
    single-side envelopes (brand IN, size/quantity ranges) written
    explicitly so they push into BOTH parquet scans — Catalyst does not
    factor disjunctions across a join on its own, and at 100 TB the
    difference is scanning 3 brands vs all of lineitem.
  - q22: the scalar average broadcasts (1 row), the NOT EXISTS becomes a
    LEFT ANTI join on o_custkey; both inputs are column-pruned.

Float determinism vs DuckDB follows the house rule (operators/
relational.py module docstring): every double SUM is rounded at its
true decimal resolution, averages are written round(sum)/count, and
ratio expressions use identical association on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders in one quarter having at least one line item
    shipped after the order date, counted per priority."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = o.where(
        (F.col("o_orderdate") >= _ts("1997-01-01"))
        & (F.col("o_orderdate") < _ts("1997-04-01"))
    ).join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts, with the
    priority predicate in the JOIN clause so customers with zero qualifying
    orders still appear (n_orders = 0)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != F.lit("1-URGENT")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").alias("n_customers"))


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of 1997-H1 revenue from PROMO-type parts —
    two conditional sums in a single aggregate over the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    j = (
        li.where(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1997-07-01"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    promo = F.round(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))), 4
    )
    total = F.round(F.sum(rev), 4)
    return j.agg(
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
        (F.lit(100.0) * (promo / total)).alias("promo_pct"),
    )


# Q19 bracket envelopes, shared between the Spark plan and the tests: the
# OR-of-ANDs implies brand IN {12,23,3}, p_size <= 35, l_quantity 1..50.
_Q19_BRANDS = ("Brand#12", "Brand#23", "Brand#3")


def q19_bracketed_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (brand, size, quantity) brackets. The
    implied per-side envelopes are applied explicitly pre-join so both
    parquet scans prune; the exact OR predicate then filters the join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    li_f = li.where(
        (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50)
    )
    p_f = p.where(
        F.col("p_brand").isin(*_Q19_BRANDS) & (F.col("p_size") >= 1) & (F.col("p_size") <= 35)
    )
    bracket = (
        (
            (F.col("p_brand") == "Brand#12")
            & (F.col("p_size") <= 15)
            & (F.col("l_quantity") <= 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & (F.col("p_size") <= 25)
            & (F.col("l_quantity") >= 10)
            & (F.col("l_quantity") <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("l_quantity") >= 20)
        )
    )
    return (
        li_f.join(F.broadcast(p_f), F.col("l_partkey") == F.col("p_partkey"))
        .where(bracket)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance and
    no orders at all, profiled per nation. Scalar subquery -> 1-row
    broadcast; NOT EXISTS -> LEFT ANTI join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thresh = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg((F.round(F.sum("c_acctbal"), 2) / F.count("*")).alias("avg_bal"))
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q4_late_shipment_priority": q4_late_shipment_priority,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q14_promo_revenue": q14_promo_revenue,
    "q19_bracketed_revenue": q19_bracketed_revenue,
    "q22_idle_rich_customers": q22_idle_rich_customers,
}

ORACLES: dict[str, str] = {
    "q4_late_shipment_priority": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-04-01'
          AND EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
          )
        GROUP BY o_orderpriority
    """,
    "q13_order_count_distribution": """
        SELECT n_orders, count(*) AS n_customers
        FROM (
            SELECT c_custkey, count(o_orderkey) AS n_orders
            FROM customer
            LEFT JOIN orders
              ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY n_orders
    """,
    "q14_promo_revenue": """
        SELECT
            round(sum(CASE WHEN p_type = 'PROMO'
                           THEN l_extendedprice * (1.0 - l_discount)
                           ELSE 0.0 END), 4) AS promo_revenue,
            round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue,
            100.0 * (round(sum(CASE WHEN p_type = 'PROMO'
                                    THEN l_extendedprice * (1.0 - l_discount)
                                    ELSE 0.0 END), 4)
                     / round(sum(l_extendedprice * (1.0 - l_discount)), 4))
                AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-07-01'
    """,
    "q19_bracketed_revenue": """
        SELECT
            round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
            count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE
            (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 1 AND 21)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
             AND l_quantity BETWEEN 10 AND 30)
         OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
             AND l_quantity BETWEEN 20 AND 50)
    """,
    "q22_idle_rich_customers": """
        SELECT c_nationkey, count(*) AS n_customers,
               round(sum(c_acctbal), 2) AS sum_bal
        FROM customer
        WHERE c_acctbal > (
            SELECT round(sum(c_acctbal), 2) / count(*)
            FROM customer WHERE c_acctbal > 0.0
        )
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_nationkey
    """,
}
