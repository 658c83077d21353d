"""Scale-mechanics tests: partition pruning on partitioned writes,
shuffle-free joins on co-bucketed tables, and exactness of skew salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from dic_a1_spark.operators.scale import salted_groupby
from dic_a1_spark.plans.explain import count_exchanges, formatted_plan
from dic_a1_spark.sources.readers import load_table
from dic_a1_spark.sources.sinks import write_bucketed_table, write_partitioned_parquet
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    out = str(tmp_path / "orders_by_status")
    orders = load_table(spark, SF_SMOKE, "orders")
    write_partitioned_parquet(orders, out, ["o_orderstatus"])

    back = spark.read.parquet(out).where(F.col("o_orderstatus") == "F")
    plan = formatted_plan(back)
    assert "PartitionFilters" in plan and "o_orderstatus" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], "status filter must prune directories, not scan rows"
    # value parity with the unpartitioned scan
    expected = orders.where(F.col("o_orderstatus") == "F").count()
    assert back.count() == expected


def test_cobucketed_join_has_no_shuffle(spark):
    # The in-memory catalog forgets managed tables across sessions but the
    # warehouse directories persist; clear both for a repeatable test.
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        4,
        sort_cols=["o_orderkey"],
    )
    joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    assert count_exchanges(joined) == 0, (
        "co-bucketed tables must join without any shuffle exchange"
    )
    # and the result is right
    plain = orders.join(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert joined.count() == plain.count()


def test_salted_groupby_matches_unsalted(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    salted = salted_groupby(
        li,
        ["l_returnflag"],
        "l_orderkey",
        {"l_quantity": "sum", "l_orderkey": "count"},
        n_salts=16,
    )
    plain = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_l_quantity"),
        F.count("l_orderkey").alias("count_l_quantity"),
    )
    s = {r["l_returnflag"]: (round(r["sum_l_quantity"], 6), r["count_l_orderkey"])
         for r in salted.collect()}
    p = {r["l_returnflag"]: (round(r["sum_l_quantity"], 6), r["count_l_quantity"])
         for r in plain.collect()}
    assert s == p


def test_salted_broadcast_left_deterministic_and_correct(spark):
    """Join result must equal the plain join, and salt placement must be a
    pure function of row content — stable across repartitioning (the
    monotonically_increasing_id form violated this)."""
    from pyspark.sql import functions as F

    from dic_a1_spark.operators.scale import salted_broadcast_left

    fact = spark.createDataFrame(
        [("hot", i) for i in range(200)] + [("cold", i) for i in range(5)],
        ["k", "v"],
    )
    dim = spark.createDataFrame([("hot", "H"), ("cold", "C")], ["k", "tag"])

    got = sorted(
        (r["k"], r["v"], r["tag"])
        for r in salted_broadcast_left(fact, dim, "k").collect()
    )
    want = sorted(
        (r["k"], r["v"], r["tag"]) for r in fact.join(dim, "k").collect()
    )
    assert got == want

    # salt placement is content-derived: identical per row no matter how
    # the fact side is partitioned
    salt = F.pmod(F.xxhash64(F.col("k"), F.col("v")), F.lit(8)).alias("s")
    s1 = {(r["k"], r["v"]): r["s"] for r in fact.select("k", "v", salt).collect()}
    s2 = {
        (r["k"], r["v"]): r["s"]
        for r in fact.repartition(7).select("k", "v", salt).collect()
    }
    assert s1 == s2
