"""PageRank over the TPC-H nation trade graph — the canonical iterative
graph algorithm (Page et al. 1999), here as the repo's demonstration of
the unrolled-iteration pattern for fixed-point computations: discover
edges from the corpus with ONE heavy join pipeline, then iterate on the
graph-sized frame.

Graph: a directed edge c_nat → s_nat for every lineitem whose order's
customer sits in nation c_nat and whose supplier sits in nation s_nat
(self-loops included — a nation trades with itself). Edge weight =
lineitem count. The iteration is WEIGHTED PageRank (the standard
strength-proportional variant): mass flows along each edge in
proportion to its weight share of the source's out-weight — the
unweighted form is VACUOUS here (the trade graph is complete at every
SF, so uniform out-degrees give uniform ranks; the Q11 lesson), while
the weighted form separates nations by trade volume.

Iteration (PR_ITERS unrolled rounds, damping PR_D):

  PR_0(v)   = 1 / N
  PR_t+1(v) = (1 - d)/N
              + d * sum_{(u,v) in E} PR_t(u) * w(u,v) / out_w(u)

Dangling simplification, stated explicitly: nodes with outdeg 0 leak
their mass (no redistribution term) — both engines implement the same
rule, so parity holds; on this graph every nation has outgoing edges,
so the term is vacuous anyway (asserted in tests).

Float parity: ranks are doubles. Each per-node contribution sum is
PINNED by sorting the collected contribution array and folding
sequentially (the mixing.py `_w_total` rule — Spark's 0.0 seed is
bit-neutral for the positive contributions, matching DuckDB's seedless
list_reduce); the update expression `(1-d)/N + d * s` is written with
the identical literal shape both sides.

Scale shape at 100 TB:
  1. Edge discovery is the corpus-sized stage: lineitem ⋈ orders
     (shuffle on orderkey) with customer/supplier/nation as BROADCAST
     dims, then one partial-agg shuffle keyed by (c_nat, s_nat) — the
     result is the bounded nation×nation census.
  2. Every iteration joins the EDGE frame (graph-sized, here ≤625
     rows) against the rank frame — never the corpus. The iteration
     count is fixed and unrolled driver-side into one DAG; at web-graph
     scale the same loop shape holds with per-iteration checkpoints
     (the dedup.py label-propagation idiom).

Reference scope: the reference engine has no graph surface; iterative
fixed-point computation is part of the training-data-pipeline extension
(cf. the label-propagation components in dedup.py — PageRank is its
weighted cousin).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

# Damping factor (classic 0.85) and unrolled iteration count.
PR_D = 0.85
PR_ITERS = 5


def _edge_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src, dst, n_lineitems): the corpus-discovered trade edges.
    src/dst are nation NAMES (stable across engines)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(
            F.broadcast(n.withColumnRenamed("n_name", "src")),
            c.c_nationkey == F.col("n_nationkey"),
        )
        .drop("n_nationkey")
        .join(
            F.broadcast(
                n.withColumnRenamed("n_name", "dst").withColumnRenamed(
                    "n_nationkey", "nk2"
                )
            ),
            s.s_nationkey == F.col("nk2"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n_lineitems"))
    )


def _pinned_sum(col: str) -> F.Column:
    """Sorted-fold double sum (the repo's pinned-association rule)."""
    return F.aggregate(
        F.array_sort(F.collect_list(col)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def graph_nation_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The weighted edge census itself — certifies the corpus-sized
    discovery join under the driver's value hash."""
    return _edge_census(spark, sf_dir)


def _degrees(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Degree census from an ALREADY-MATERIALIZED edge frame — shared by
    the census query and pagerank so the corpus-sized discovery join is
    never executed twice in one plan."""
    outd = edges.groupBy("src").agg(
        F.count("*").cast("bigint").alias("out_deg"),
        F.sum("n_lineitems").cast("bigint").alias("out_weight"),
    )
    ind = edges.groupBy("dst").agg(
        F.count("*").cast("bigint").alias("in_deg"),
        F.sum("n_lineitems").cast("bigint").alias("in_weight"),
    )
    return (
        nodes.join(outd, nodes.nation == outd.src, "left")
        .join(ind, nodes.nation == ind.dst, "left")
        .select(
            "nation",
            F.coalesce("out_deg", F.lit(0).cast("bigint")).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0).cast("bigint")).alias("in_deg"),
            F.coalesce("out_weight", F.lit(0).cast("bigint")).alias(
                "out_weight"
            ),
            F.coalesce("in_weight", F.lit(0).cast("bigint")).alias(
                "in_weight"
            ),
        )
    )


def graph_degree_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, out_deg, in_deg, out_weight, in_weight): distinct-edge
    degrees and lineitem-weighted degrees per nation (isolated nations
    appear with zeros — the census is LEFT-joined onto the node set)."""
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("nation")
    )
    # checkpoint: _degrees consumes edges twice (out and in sides); the
    # corpus discovery join must not execute twice.
    return _degrees(_edge_census(spark, sf_dir).localCheckpoint(), nodes)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, rank_r, in_deg, out_deg) after PR_ITERS unrolled
    iterations — rank_r rounded to 8 dp (the underlying doubles are
    bit-equal across engines; rounding is presentational). The edge
    census is checkpointed ONCE and feeds the iterations AND the
    degree columns — the corpus join never runs twice."""
    edges = _edge_census(spark, sf_dir).localCheckpoint()
    nodes = load_table(spark, sf_dir, "nation").select(
        F.col("n_name").alias("nation")
    )
    n_nodes = nodes.agg(F.count("*").cast("bigint").alias("n"))
    outd = edges.groupBy("src").agg(
        F.sum("n_lineitems").cast("bigint").alias("ow")
    )
    # ranks: (nation, pr) — iteration frames are graph-sized.
    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "nation", (F.lit(1.0) / F.col("n").cast("double")).alias("pr")
    )
    # Edge weight share: ONE double division, identical both engines.
    share = F.col("n_lineitems").cast("double") / F.col("ow").cast("double")
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(outd, "src")
            .join(ranks, edges.src == ranks.nation)
            .select(F.col("dst"), (F.col("pr") * share).alias("c"))
        )
        summed = contrib.groupBy("dst").agg(_pinned_sum("c").alias("s"))
        ranks = (
            nodes.join(summed, nodes.nation == summed.dst, "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "nation",
                (
                    F.lit(1.0 - PR_D) / F.col("n").cast("double")
                    + F.lit(PR_D) * F.coalesce("s", F.lit(0.0))
                ).alias("pr"),
            )
        )
    deg = _degrees(edges, nodes).select("nation", "in_deg", "out_deg")
    return ranks.join(deg, "nation").select(
        "nation",
        F.round("pr", 8).alias("rank_r"),
        "in_deg",
        "out_deg",
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "graph_nation_edges": graph_nation_edges,
    "graph_degree_census": graph_degree_census,
    "graph_pagerank": graph_pagerank,
}

_EDGES_CTE = """
    edges AS (
        SELECT cn.n_name AS src, sn.n_name AS dst,
               CAST(count(*) AS BIGINT) AS n_lineitems
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        GROUP BY cn.n_name, sn.n_name
    )
"""

_DEG_BODY = """
    WITH outd AS (
        SELECT src, CAST(count(*) AS BIGINT) AS out_deg,
               CAST(sum(n_lineitems) AS BIGINT) AS out_weight
        FROM edges GROUP BY src
    ),
    ind AS (
        SELECT dst, CAST(count(*) AS BIGINT) AS in_deg,
               CAST(sum(n_lineitems) AS BIGINT) AS in_weight
        FROM edges GROUP BY dst
    )
    SELECT n.n_name AS nation,
           COALESCE(o.out_deg, 0) AS out_deg,
           COALESCE(i.in_deg, 0) AS in_deg,
           COALESCE(o.out_weight, 0) AS out_weight,
           COALESCE(i.in_weight, 0) AS in_weight
    FROM nation n
    LEFT JOIN outd o ON n.n_name = o.src
    LEFT JOIN ind i ON n.n_name = i.dst
"""

_DEG_SQL = f"""
    WITH {_EDGES_CTE},
    deg AS ({_DEG_BODY})
    SELECT * FROM deg
"""


def _pagerank_sql() -> str:
    """Unrolled-iteration oracle: CTE chain r_0 → r_PR_ITERS mirroring
    `graph_pagerank` — per-node sorted-fold contribution sums, identical
    update-expression shape."""
    parts = [
        f"""
    nodes AS (SELECT n_name AS nation FROM nation),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    outd AS (SELECT src, CAST(sum(n_lineitems) AS BIGINT) AS ow
             FROM edges GROUP BY src),
    r_0 AS (
        SELECT nation, 1.0 / CAST(nn.n AS DOUBLE) AS pr
        FROM nodes CROSS JOIN nn
    )"""
    ]
    for t in range(1, PR_ITERS + 1):
        parts.append(
            f"""
    s_{t} AS (
        SELECT e.dst,
               list_reduce(list_sort(list(
                   r.pr * (CAST(e.n_lineitems AS DOUBLE)
                           / CAST(o.ow AS DOUBLE)))),
                           (a, b) -> a + b) AS s
        FROM edges e
        JOIN outd o ON e.src = o.src
        JOIN r_{t - 1} r ON e.src = r.nation
        GROUP BY e.dst
    ),
    r_{t} AS (
        SELECT nodes.nation,
               {1.0 - PR_D!r} / CAST(nn.n AS DOUBLE)
                   + {PR_D!r} * COALESCE(s_{t}.s, 0.0) AS pr
        FROM nodes
        LEFT JOIN s_{t} ON nodes.nation = s_{t}.dst
        CROSS JOIN nn
    )"""
        )
    chain = ",".join(parts)
    return f"""
    WITH {_EDGES_CTE}, {chain},
    deg AS ({_DEG_BODY})
    SELECT r.nation, round(r.pr, 8) AS rank_r, d.in_deg, d.out_deg
    FROM r_{PR_ITERS} r JOIN deg d ON r.nation = d.nation
    """


ORACLES: dict[str, str] = {
    "graph_nation_edges": f"WITH {_EDGES_CTE} SELECT * FROM edges",
    "graph_degree_census": _DEG_SQL,
    "graph_pagerank": _pagerank_sql(),
}
