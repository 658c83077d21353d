"""General relational surface over the driver's TPC-H-ish tables.

The reference's only join is a hand-rolled map-side broadcast of a 22-row
dimension (src/chiSquaredJob.py:37-57,87-88) and its only aggregates are
summed counters (SURVEY.md §2.3-2.4). "Same capabilities, idiomatic Spark"
means exposing the natural superset Spark gives for free: broadcast +
sort-merge equi joins, semi/anti joins, multi-way joins, rollup/cube/
grouping sets, distinct aggregates, window functions, top-k per group, set
operations, and the scalar function surface (string/date/math/json).

Scale notes baked into each query:
  - Small dimensions (region/nation/customer at dim scale) are broadcast
    explicitly — at 100 TB the fact side never shuffles for those joins.
  - Fact-fact joins (orders x lineitem) shuffle on the join key; AQE
    handles skew splitting. Filters are applied BEFORE joins so Catalyst
    pushes them into the parquet scan (verify: PushedFilters in .explain).
  - Window queries partition on high-cardinality keys (custkey/user_id),
    never on a handful of values, so no single-task funnel at scale.

Float determinism vs the DuckDB oracle: double sums are order-dependent,
so every SUM over doubles is rounded to the decimal resolution its true
value is known to have (prices: 2dp; price*(1-disc) products: 4dp) —
rounding there is an identity on the true value and absorbs last-ulp
accumulation differences. Averages are written as round(sum)/count, never
AVG, so both engines evaluate the identical expression tree.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

_D = "yyyy-MM-dd"  # Spark date_format pattern; oracle uses strftime %Y-%m-%d


def _date(col):  # timestamp -> 'YYYY-MM-DD' string (engine-neutral output)
    return F.date_format(col, _D)


# --------------------------------------------------------------------------
# Aggregations
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan + grouped partial/final hash aggregate.
    The filter reaches the parquet scan as PushedFilters; partial agg cuts
    the shuffle to |groups| x |partitions| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            (F.round(F.sum("l_quantity"), 2) / F.count("*")).alias("avg_qty"),
            (F.round(F.sum("l_extendedprice"), 2) / F.count("*")).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate with a tight selective predicate — the whole WHERE
    clause pushes into the scan; no shuffle at all (partial aggs coalesce)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase aggregate; at scale prefer
    approx_count_distinct (exposed separately, rows-only) when exactness
    isn't required."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
    )


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


def agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-style conditional aggregation (sum(CASE WHEN ...)) — stays a
    single hash aggregate, no transpose operator needed."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_partial"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice")).otherwise(0.0)),
            2,
        ).alias("finished_total"),
    )


def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count("*").alias("n_lines"), F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .where(F.col("n_lines") >= 5)
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join of fact-side customers through two tiny dims — both sides
    explicitly broadcast; zero fact shuffles before the final aggregate."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count("*").alias("n_customers"),
            (F.round(F.sum("c_acctbal"), 2) / F.count("*")).alias("avg_acctbal"),
        )
    )


def join_sort_merge_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact equi join (orders x lineitem) — shuffles both sides on the
    key; AQE picks sort-merge vs shuffled-hash and splits skewed keys."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_lines"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select(
            "o_orderkey",
            _date(F.col("o_orderdate")).alias("orderdate"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join; dims broadcast, facts shuffle. The c_nationkey =
    s_nationkey condition makes it a genuine multi-predicate join."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == n.n_nationkey)
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI — the idiomatic form of the reference's 'is key present in
    side set' probe; never duplicates and never carries right columns."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI — the stopword-filter pattern (SURVEY.md P6) over keys."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


def join_outer_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with null-aware aggregation: order counts per customer
    including zero-order customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
    )


# --------------------------------------------------------------------------
# Windows / top-k
# --------------------------------------------------------------------------

def window_rank_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank per nation by balance — tie-stable by construction
    (equal inputs get equal ranks), so no tiebreak column is needed."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("bal_rank"),
        F.dense_rank().over(w).alias("bal_dense_rank"),
    )


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend per customer over order date — partitioned on the
    high-cardinality custkey so state stays bounded per task."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        _date(F.col("o_orderdate")).alias("orderdate"),
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-to-event value delta via lag()."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("value_delta"),
    )


def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user, written as sum/count so the oracle
    evaluates the identical expression."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        (F.round(F.sum("value").over(w), 2) / F.count("*").over(w)).alias("moving_avg"),
    )


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by price per brand — the W1 pattern (reference top-75,
    src/chiSquaredJob.py:105) generalized; deterministic tiebreak on key."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        p.withColumn("price_rank", F.row_number().over(w))
        .where(F.col("price_rank") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice", "price_rank")
    )


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------

def _urgent_custkeys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )


def _bigspender_custkeys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.where(F.col("o_totalprice") > 40000).select(
        F.col("o_custkey").alias("custkey")
    )


def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent_custkeys(spark, sf_dir).union(
        _bigspender_custkeys(spark, sf_dir)
    ).distinct()


def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _urgent_custkeys(spark, sf_dir).intersect(
        _bigspender_custkeys(spark, sf_dir)
    )


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract() is distinct-EXCEPT (SQL EXCEPT): a key present on both sides
    # is removed regardless of multiplicities. exceptAll().distinct() would
    # instead keep keys whose left multiplicity exceeds the right's.
    return _urgent_custkeys(spark, sf_dir).subtract(
        _bigspender_custkeys(spark, sf_dir)
    )


# --------------------------------------------------------------------------
# Scalar function surface
# --------------------------------------------------------------------------

def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper(F.col("p_name")).alias("name_upper"),
        F.lower(F.col("p_brand")).alias("brand_lower"),
        F.length(F.col("p_name")).alias("name_len"),
        F.substring(F.col("p_type"), 1, 3).alias("type_prefix"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_replace(F.col("p_brand"), "[0-9]+", "#").alias("brand_nodigit"),
    )


def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .groupBy("order_year", "order_month")
        .agg(F.count("*").alias("n_orders"))
    )


def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sqrt(F.col("l_quantity")), 6).alias("qty_sqrt"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(F.col("l_extendedprice")).alias("price_ceil"),
        F.floor(F.col("l_extendedprice")).alias("price_floor"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        (F.col("l_extendedprice") % F.lit(100.0)).alias("price_mod"),
    )


def scalar_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props string column — F1 (json.loads
    per record in the reference) as a codegen'd path expression."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
    )


def scalar_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 10000, "small")
        .when(F.col("o_totalprice") < 40000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("price_bucket")).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_total"),
    )


def window_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: quartile bucket, percent_rank, and
    cume_dist over customer balances per market segment. All three are
    exact rationals of rank/count — identical division both engines."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("balance_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics EXCEPT ALL: multiplicities subtract instead of the
    distinct EXCEPT — order lines per partkey minus one occurrence per
    order in 'F' status. Exercises the multiset path Spark implements via
    a count-and-replicate aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    all_parts = li.select("l_partkey")
    f_parts = (
        li.join(o.where(F.col("o_orderstatus") == "F"),
                li.l_orderkey == o.o_orderkey)
        .select("l_partkey")
    )
    return all_parts.exceptAll(f_parts).groupBy("l_partkey").agg(
        F.count("*").alias("n_remaining")
    )


def agg_pivot_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DataFrame pivot API (groupBy().pivot() with an explicit value
    list — never the implicit distinct-scan form at scale): order counts
    per priority x status."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): rows with a
    NULL key match each other instead of vanishing — the semantics
    difference every SQL engine must get right. Keys are made partially
    NULL via nullif to exercise both paths."""
    c = load_table(spark, sf_dir, "customer")
    left = c.select(
        "c_custkey", F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg")
    ).alias("l")
    seg_stats = (
        left.groupBy("seg").agg(F.count("*").alias("n_in_seg")).alias("s")
    )
    joined = left.join(
        seg_stats, F.col("l.seg").eqNullSafe(F.col("s.seg"))
    )
    return joined.select("c_custkey", F.col("l.seg").alias("seg"), "n_in_seg")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "window_ntile_cume": window_ntile_cume,
    "set_except_all": set_except_all,
    "agg_pivot_api": agg_pivot_api,
    "join_null_safe": join_null_safe,
    "q1_pricing_summary": q1_pricing_summary,
    "q6_forecast_revenue": q6_forecast_revenue,
    "agg_distinct": agg_distinct,
    "agg_rollup": agg_rollup,
    "agg_cube": agg_cube,
    "agg_grouping_sets": agg_grouping_sets,
    "agg_conditional_pivot": agg_conditional_pivot,
    "agg_having": agg_having,
    "join_broadcast_dims": join_broadcast_dims,
    "join_sort_merge_facts": join_sort_merge_facts,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "join_semi": join_semi,
    "join_anti": join_anti,
    "join_outer_coalesce": join_outer_coalesce,
    "window_rank_customers": window_rank_customers,
    "window_running_total": window_running_total,
    "window_lag_delta": window_lag_delta,
    "window_moving_avg": window_moving_avg,
    "topk_per_group": topk_per_group,
    "set_union_distinct": set_union_distinct,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "scalar_string_funcs": scalar_string_funcs,
    "scalar_date_funcs": scalar_date_funcs,
    "scalar_math_funcs": scalar_math_funcs,
    "scalar_json_funcs": scalar_json_funcs,
    "scalar_case_when": scalar_case_when,
}

ORACLES: dict[str, str] = {
    "window_ntile_cume": """
        SELECT c_custkey, c_mktsegment,
               CAST(ntile(4) OVER w AS INTEGER) AS balance_quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    "set_except_all": """
        WITH all_parts AS (SELECT l_partkey FROM lineitem),
        f_parts AS (
            SELECT l_partkey FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
        ),
        remaining AS (SELECT l_partkey FROM all_parts EXCEPT ALL
                      SELECT l_partkey FROM f_parts)
        SELECT l_partkey, count(*) AS n_remaining FROM remaining GROUP BY l_partkey
    """,
    "agg_pivot_api": """
        SELECT o_orderpriority,
               count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
               count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
               count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        FROM orders GROUP BY o_orderpriority
    """,
    "join_null_safe": """
        WITH lhs AS (
            SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
            FROM customer
        ),
        stats AS (SELECT seg, count(*) AS n_in_seg FROM lhs GROUP BY seg)
        SELECT l.c_custkey, l.seg, s.n_in_seg
        FROM lhs l JOIN stats s ON l.seg IS NOT DISTINCT FROM s.seg
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price,
               round(sum(l_quantity), 2) / count(*) AS avg_qty,
               round(sum(l_extendedprice), 2) / count(*) AS avg_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        GROUP BY l_returnflag, l_linestatus
    """,
    "q6_forecast_revenue": """
        SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
          AND l_discount >= 0.03 AND l_discount <= 0.07
          AND l_quantity < 24
    """,
    "agg_distinct": """
        SELECT l_returnflag,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
               CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_part,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
    """,
    # HAVING count(*) > 0 on the three grouping-set oracles mirrors a
    # documented cross-engine fork (r10 empty-TPC-H probe): over an
    # EMPTY table Spark's ROLLUP/CUBE/GROUPING SETS emit NOTHING, while
    # DuckDB follows the SQL standard and fabricates the grand-total ()
    # row (count 0, NULL sums). The registered contract is Spark's
    # behavior; the filter only ever drops that fabricated row — every
    # real group has count(*) >= 1 — so it is value-identical on all
    # non-empty inputs.
    "agg_rollup": """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        HAVING count(*) > 0
    """,
    "agg_cube": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_total
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        HAVING count(*) > 0
    """,
    "agg_grouping_sets": """
        SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
               round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        HAVING count(*) > 0
    """,
    "agg_conditional_pivot": """
        SELECT o_orderpriority,
               count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished,
               count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
               count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_partial,
               round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2)
                   AS finished_total
        FROM orders GROUP BY o_orderpriority
    """,
    "agg_having": """
        SELECT l_partkey, count(*) AS n_lines, round(sum(l_quantity), 2) AS sum_qty
        FROM lineitem GROUP BY l_partkey HAVING count(*) >= 5
    """,
    "join_broadcast_dims": """
        SELECT r_name AS region, count(*) AS n_customers,
               round(sum(c_acctbal), 2) / count(*) AS avg_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
    """,
    "join_sort_merge_facts": """
        SELECT o_orderstatus, count(*) AS n_lines,
               round(sum(l_extendedprice), 2) AS sum_price
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderstatus
    """,
    "q3_shipping_priority": """
        SELECT o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1997-03-15'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey ASC
        LIMIT 10
    """,
    "q5_local_supplier_volume": """
        SELECT n_name AS nation,
               round(sum(l_extendedprice * (1.0 - l_discount)), 4) AS revenue,
               count(*) AS n_lines
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name
    """,
    "join_semi": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    """,
    "join_anti": """
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    "join_outer_coalesce": """
        SELECT c_custkey, count(o_orderkey) AS n_orders,
               round(coalesce(sum(o_totalprice), 0.0), 2) AS total_spent
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    """,
    "window_rank_customers": """
        SELECT c_custkey, c_nationkey, c_acctbal,
               CAST(rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INTEGER) AS bal_rank,
               CAST(dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS INTEGER) AS bal_dense_rank
        FROM customer
    """,
    "window_running_total": """
        SELECT o_custkey, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               round(sum(o_totalprice) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
        FROM orders
    """,
    "window_lag_delta": """
        SELECT user_id, event_id,
               round(value - lag(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id), 2) AS value_delta
        FROM events
    """,
    "window_moving_avg": """
        SELECT user_id, event_id,
               round(sum(value) OVER w, 2) / count(*) OVER w AS moving_avg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "topk_per_group": """
        SELECT p_brand, p_partkey, p_retailprice, price_rank FROM (
            SELECT p_brand, p_partkey, p_retailprice,
                   CAST(row_number() OVER (
                       PARTITION BY p_brand
                       ORDER BY p_retailprice DESC, p_partkey ASC) AS INTEGER) AS price_rank
            FROM part)
        WHERE price_rank <= 3
    """,
    "set_union_distinct": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        UNION
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 40000
    """,
    "set_intersect": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 40000
    """,
    "set_except": """
        SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        EXCEPT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 40000
    """,
    "scalar_string_funcs": """
        SELECT p_partkey,
               upper(p_name) AS name_upper,
               lower(p_brand) AS brand_lower,
               CAST(length(p_name) AS INTEGER) AS name_len,
               substring(p_type, 1, 3) AS type_prefix,
               concat_ws('|', p_brand, p_type) AS brand_type,
               reverse(p_brand) AS brand_rev,
               trim(p_name) AS name_trim,
               regexp_replace(p_brand, '[0-9]+', '#', 'g') AS brand_nodigit
        FROM part
    """,
    "scalar_date_funcs": """
        SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               count(*) AS n_orders
        FROM orders GROUP BY 1, 2
    """,
    "scalar_math_funcs": """
        SELECT l_orderkey, l_linenumber,
               round(sqrt(l_quantity), 6) AS qty_sqrt,
               abs(l_discount - 0.05) AS disc_dev,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               l_quantity * l_quantity AS qty_sq,
               fmod(l_extendedprice, 100.0) AS price_mod
        FROM lineitem
    """,
    "scalar_json_funcs": """
        SELECT event_type, count(*) AS n_events,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        FROM events GROUP BY event_type
    """,
    "scalar_case_when": """
        SELECT CASE WHEN o_totalprice < 10000 THEN 'small'
                    WHEN o_totalprice < 40000 THEN 'medium'
                    ELSE 'large' END AS price_bucket,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_total
        FROM orders GROUP BY 1
    """,
}
