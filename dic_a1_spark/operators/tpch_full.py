"""Third tranche of TPC-H-shaped queries (Q2/Q7/Q8/Q9/Q10/Q12/Q15/Q16/
Q17/Q18/Q20/Q21 shapes), completing the canonical 22-query join/subquery
vocabulary over the driver's tables.

The reference needs exactly one join (src/chiSquaredJob.py:37-57) — this
tranche exists because "same capabilities, idiomatic Spark" includes the
query shapes any relational user of the engine reaches for next:
min-per-group correlated subqueries (Q2), bidirectional disjunctive join
predicates (Q7), market-share ratios over two-level dimension chains
(Q8), derived-measure profit rollups (Q9), top-k revenue rankings (Q10),
conditional counts (Q12), scalar-max view joins (Q15), distinct-count
profiles with NOT-IN exclusion (Q16), correlated-average filters (Q17),
HAVING-IN semi joins (Q18), nested-IN promotion screens (Q20), and the
sole-failing-member EXISTS/NOT-EXISTS pattern (Q21).

Column adaptations (driver tables lack partsupp, l_shipmode,
l_commitdate/l_receiptdate, p_container, ps_supplycost):
  - the partsupp relation is surrogated by DISTINCT (l_partkey,
    l_suppkey) pairs observed in lineitem;
  - Q9's supply cost is surrogated by p_retailprice;
  - Q12's ship modes become l_linestatus; Q21's receipt-vs-commit
    lateness becomes l_shipdate > o_orderdate + 60 days.
Each query keeps the canonical *shape* — the join topology, subquery
structure, and aggregate pattern are the TPC-H ones.

Scale notes (the 100 TB plan, per query):
  - q2a: the per-part MIN is a window over p_partkey (high-cardinality
    partition key — no few-key funnel); the dimension chain
    supplier→nation→region broadcasts. The partsupp surrogate is one
    distinct over a two-column projection of lineitem.
  - q7: both nation dims broadcast; the disjunctive nation-pair filter
    implies per-side IN envelopes that are applied on the dims BEFORE
    the join, so at scale the fact shuffle carries only the two nations'
    rows.
  - q8: one pass, no self-join — the share is a conditional-sum ratio;
    part and the nation/region chain broadcast; the only
    data-proportional shuffle is lineitem⋈orders.
  - q9a: LIKE filter prunes part before broadcast; profit is computed
    per-row then aggregated partial-then-final; one fact-fact shuffle.
  - q10: group-then-rank, TakeOrderedAndProject keeps the top 20 on the
    driver without a global sort.
  - q12a: single scan, conditional aggregates, no join beyond
    orders⋈lineitem on the join key.
  - q15: the revenue view aggregates once; the scalar max is an
    empty-frame window over its |suppliers|-row output — one lineitem
    scan total (a scalar-subquery join would recompute the view).
  - q16a: the negative-balance exclusion is a broadcast anti-join
    (6 rows at sf; bounded by |supplier| always); count(DISTINCT
    l_suppkey) is a two-phase hash aggregate.
  - q17a: the correlated per-part average decorrelates to a window over
    p_partkey on the (brand-filtered, broadcast-joined) lineitem slice.
  - q18: the HAVING>threshold subquery IS the outer query's per-order
    aggregate — computed once, filtered, joined; lineitem is scanned
    and shuffled exactly once.
  - q20a: two nested INs become two broadcast semi joins (per-supplier
    quantity rollup, then nation list).
  - q21a: the classic four-way self-join collapses to ONE pass over
    lineitem⋈orders: per-(order, supplier) lateness flags, then a
    window over l_orderkey counting suppliers and late suppliers —
    EXISTS (another supplier) and NOT EXISTS (another late supplier)
    become column predicates on the window counts.

Float determinism vs DuckDB follows the house rule (operators/
relational.py docstring): 2dp×2dp products round at 4dp, price sums at
2dp, averages are written sum/count with exact integral numerators.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

_D = "yyyy-MM-dd"


def _ts(s: str):
    return F.lit(s).cast("timestamp")


def _rev():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate partsupp: the distinct (part, supplier) pairs that ever
    shipped together. One distinct over a 2-column pruned scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_partkey", "l_suppkey").distinct()


def q2a_min_balance_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: for each STANDARD size-15 part shipped from EUROPE, the
    supplier(s) with the minimum account balance among its shippers."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    ps = _partsupp(spark, sf_dir)
    dim = s.join(
        F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
        s.s_nationkey == F.col("n_nationkey"),
    )
    joined = (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(F.broadcast(dim), ps.l_suppkey == F.col("s_suppkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_name", "s_name", "s_acctbal", "n_name")
    )


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: shipping volume between NATION_1 and NATION_2 in either
    direction, by supplier nation / customer nation / year."""
    pair = ("NATION_1", "NATION_2")
    n_s = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    )
    n_c = (
        load_table(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(*pair))
        .select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    )
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    return (
        li.join(F.broadcast(s.join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key"))),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.join(F.broadcast(n_c), c.c_nationkey == F.col("cn_key")),
              F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"), F.count("*").alias("n_lines"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: NATION_3's supplier share of PROMO-part revenue sold to
    ASIA customers, per year. Conditional-sum ratio — one pass."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    n_s = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n_c = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    target_rev = F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(F.lit(0.0)))
    total_rev = F.sum(_rev())
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s.join(F.broadcast(n_s), s.s_nationkey == F.col("sn_key"))),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            c.join(
                F.broadcast(
                    n_c.join(F.broadcast(r), n_c.n_regionkey == r.r_regionkey)
                ),
                c.c_nationkey == F.col("n_nationkey"),
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(target_rev, 4).alias("target_revenue"),
            F.round(total_rev, 4).alias("total_revenue"),
            (F.round(target_rev, 4) / F.round(total_rev, 4)).alias("mkt_share"),
        )
    )


def q9a_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit on red parts by supplier nation and order year,
    with p_retailprice standing in for ps_supplycost."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    profit = _rev() - F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit), 4).alias("sum_profit"), F.count("*").alias("n_lines"))
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top 20 customers by revenue lost to returns in 1997-Q4."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= _ts("1997-10-01"))
        & (F.col("o_orderdate") < _ts("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(_rev()), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q12a_late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: for lines shipped >30 days after ordering in 1997,
    counts of critical- vs normal-priority orders per line status
    (l_linestatus standing in for l_shipmode)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"),
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue.
    The scalar max is an empty-frame window over the ALREADY-AGGREGATED
    revenue view (|suppliers| rows), not a second pass — a scalar-subquery
    crossJoin would recompute the view, scanning lineitem twice (Spark
    has no automatic CTE/subquery reuse across join branches)."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1997-04-01"))
    )
    revenue = li.groupBy("l_suppkey").agg(F.round(F.sum(_rev()), 4).alias("total_revenue"))
    w = Window.partitionBy()  # dimension-sized input: one task, transiently
    return (
        revenue.withColumn("max_revenue", F.max("total_revenue").over(w))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# Q11 keeps parts above this multiple of the MEAN part value. TPC-H
# parameterizes its fixed fraction by 1/SF precisely because a constant
# cannot track a part count that scales with the data (a fixed 1e-3 was
# vacuously empty at sf0.01's 2000 uniform parts: 2x the mean share is
# ~5.5 sigma out); deriving the threshold from the same aggregated view
# keeps the query's shape AND non-vacuous at every SF (~29% of parts
# pass on the driver's uniform data).
Q11_MEAN_MULT = 1.1


def q11a_important_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: parts whose aggregate value exceeds a data-derived
    fraction of the GLOBAL total (Q11_MEAN_MULT x the mean part value) —
    the partsupp value-share query (reference has no TPC-H at all;
    lineitem extended value stands in for partsupp value as in the other
    adapted shapes). The global scalars are empty-frame windows over the
    ALREADY-AGGREGATED per-part view (|parts| rows), not scalar-subquery
    crossJoins — one lineitem scan total, the same single-pass trick as
    Q15."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.round(F.sum(_rev()), 4).alias("part_value")
    )
    w = Window.partitionBy()  # dimension-sized input: one task, transiently
    return (
        per_part.withColumn("total_value", F.sum("part_value").over(w))
        .withColumn("n_parts", F.count("*").over(w))
        .where(
            F.col("part_value")
            > F.lit(Q11_MEAN_MULT) * F.col("total_value") / F.col("n_parts")
        )
        .select("l_partkey", "part_value")
    )


def q16a_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct shipper count per (brand, type, size) for
    selected sizes, excluding Brand#1 and negative-balance suppliers
    (the NOT-IN complaint filter) via broadcast anti-join."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(5, 10, 15, 20, 25, 30)
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    ps = _partsupp(spark, sf_dir)
    return (
        ps.join(F.broadcast(bad), ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), ps.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q17a_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from Brand#23 lines whose quantity is below 20%
    of that part's average quantity. The correlated average decorrelates
    to a window over p_partkey (exact: integral quantity sums)."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    w = Window.partitionBy("p_partkey")
    avg_qty = F.sum("l_quantity").over(w) / F.count("*").over(w)
    return (
        j.withColumn("avg_qty", avg_qty)
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("small_qty_revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 250, with customer
    detail. The canonical HAVING-IN subquery is the SAME per-order
    aggregate the outer query re-derives, so it is computed once and
    filtered — lineitem is scanned and shuffled exactly once (the
    semi-join form scans it twice and re-aggregates the survivors)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 250)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", _D).alias("orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


def q20a_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: suppliers in three nations who shipped more than 400
    units of small-parts in 1997 — two nested INs as two semi joins."""
    nations = ("NATION_5", "NATION_6", "NATION_7")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*nations))
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= _ts("1997-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    heavy = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 400)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(heavy), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n.select("n_nationkey")), s.s_nationkey == F.col("n_nationkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


def q21a_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who were the ONLY late shipper on a finished
    multi-supplier order (late = shipped >60 days after ordering). The
    EXISTS / NOT-EXISTS pair becomes two window counts over l_orderkey on
    a per-(order, supplier) lateness rollup — one pass, no self-joins."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    late = (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).cast("int")
    per_supp = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late).alias("late"))
    )
    w = Window.partitionBy("l_orderkey")
    flagged = (
        per_supp.withColumn("n_supp", F.count("*").over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .where((F.col("late") == 1) & (F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        flagged.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "q2_min_balance_supplier": q2a_min_balance_supplier,
    "q7_volume_shipping": q7_volume_shipping,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9a_product_profit,
    "q10_returned_items": q10_returned_items,
    "q11_important_shares": q11a_important_shares,
    "q12_late_lines_by_status": q12a_late_lines_by_status,
    "q15_top_supplier": q15_top_supplier,
    "q16_supplier_count": q16a_supplier_count,
    "q17_small_quantity_revenue": q17a_small_quantity_revenue,
    "q18_large_volume_customers": q18_large_volume_customers,
    "q20_promotion_suppliers": q20a_promotion_suppliers,
    "q21_sole_late_supplier": q21a_sole_late_supplier,
}

ORACLES: dict[str, str] = {
    "q2_min_balance_supplier": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_partkey, p_name, s_name, s_acctbal, n_name
        FROM part, ps, supplier, nation, region
        WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'EUROPE' AND p_size = 15 AND p_type = 'STANDARD'
          AND s_acctbal = (
            SELECT min(s2.s_acctbal)
            FROM ps ps2, supplier s2, nation n2, region r2
            WHERE ps2.l_partkey = p_partkey AND s2.s_suppkey = ps2.l_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE'
          )
    """,
    "q7_volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
               count(*) AS n_lines
        FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
    """,
    "q8_market_share": """
        SELECT year(o_orderdate) AS o_year,
               round(sum(CASE WHEN n1.n_name = 'NATION_3'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END), 4) AS target_revenue,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue,
               round(sum(CASE WHEN n1.n_name = 'NATION_3'
                              THEN l_extendedprice * (1.0 - l_discount)
                              ELSE 0.0 END), 4)
               / round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS mkt_share
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        JOIN region ON n2.n_regionkey = r_regionkey
        WHERE r_name = 'ASIA' AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY year(o_orderdate)
    """,
    "q9_product_profit": """
        SELECT n_name AS nation, year(o_orderdate) AS o_year,
               round(sum(l_extendedprice * (1.0 - l_discount)
                         - p_retailprice * l_quantity), 4) AS sum_profit,
               count(*) AS n_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
    """,
    "q10_returned_items": """
        SELECT c_custkey, c_name, c_acctbal, n_name,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-10-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
    """,
    "q12_late_lines_by_status": """
        SELECT l_linestatus,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_shipdate > o_orderdate + INTERVAL 30 DAY
        GROUP BY l_linestatus
    """,
    "q11_important_shares": f"""
        WITH per_part AS (
            SELECT l_partkey,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4)
                       AS part_value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, part_value
        FROM per_part
        WHERE part_value > {Q11_MEAN_MULT} * (SELECT sum(part_value) FROM per_part)
                                           / (SELECT count(*) FROM per_part)
    """,
    "q15_top_supplier": """
        WITH revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    "q16_supplier_count": """
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#1'
          AND p_size IN (5, 10, 15, 20, 25, 30)
          AND l_suppkey NOT IN (
            SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
    "q17_small_quantity_revenue": """
        SELECT round(sum(l_extendedprice), 2) AS small_qty_revenue,
               count(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand = 'Brand#23'
          AND l_quantity < 0.2 * (
            SELECT sum(l2.l_quantity) / count(*)
            FROM lineitem l2 WHERE l2.l_partkey = p_partkey
          )
    """,
    "q18_large_volume_customers": """
        SELECT c_name, c_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice, sum(l_quantity) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (
            SELECT l_orderkey FROM lineitem
            GROUP BY l_orderkey HAVING sum(l_quantity) > 250
        )
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
    """,
    "q20_promotion_suppliers": """
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE 'small%'
              AND l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY l_suppkey
            HAVING sum(l_quantity) > 400
        )
        AND s_nationkey IN (
            SELECT n_nationkey FROM nation
            WHERE n_name IN ('NATION_5', 'NATION_6', 'NATION_7')
        )
    """,
    "q21_sole_late_supplier": """
        WITH lo AS (
            SELECT l_orderkey, l_suppkey,
                   max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                            THEN 1 ELSE 0 END) AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
            GROUP BY l_orderkey, l_suppkey
        )
        SELECT s_name, count(*) AS numwait
        FROM lo l1 JOIN supplier ON s_suppkey = l1.l_suppkey
        WHERE l1.late = 1
          AND EXISTS (
            SELECT 1 FROM lo l2
            WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
            SELECT 1 FROM lo l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1
          )
        GROUP BY s_name
        ORDER BY numwait DESC, s_name ASC
        LIMIT 100
    """,
}
