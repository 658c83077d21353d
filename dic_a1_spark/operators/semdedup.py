"""SemDeDup — semantic deduplication over the `embeddings` table
(Abbas et al. 2023, arXiv:2303.09540): cluster the corpus with a coarse
quantizer, then inside each cluster drop every vector that is
cosine-similar (>= SEMDEDUP_SIM) to an earlier-id vector. Textually
distinct but semantically redundant documents — paraphrases, templated
rewrites — survive MinHash/SimHash but fall to this pass.

Determinism: the cluster step reuses the repo's fixed-first-K codebook
(similarity.py's ivf_assignments subtree, driver-certified r4) and the
duplicate rule is the id-ordered one-pass greedy — j is dropped iff some
i < j in the same cluster has round(cos(i,j),4) >= tau. That one-pass
rule (vs the paper's iterative keep-set) is the standard scalable
approximation and makes the operator exactly restatable in SQL.
Semantic deviation from the paper, stated explicitly: because the rule
condemns j on ANY earlier i — including an i that was itself dropped —
it can OVER-drop relative to the paper's kept-set greedy. In a chain
a~b, b~c, a!~c the paper keeps {a, c}; this rule keeps only {a}: c's
only condemning neighbor (b) was itself dropped, yet c still falls.
Both engines implement the identical rule, so parity holds; the
trade is recall of near-unique vectors for a join-expressible,
iteration-free plan.

Scale shape at 100 TB:
  1. Assignment is map-only: centroids broadcast, per-vector argmax.
  2. The pairwise stage shuffles once on centroid_id; cost is
     sum_k |C_k|^2, bounded by choosing K ~ N / target_cluster_size (the
     paper uses 50K clusters for 600M points). K is the IVF_K knob; the
     pairing never materializes cross-cluster candidates.
  3. The keep-filter is a broadcast-able anti join only when the dropped
     set is small; it is corpus-proportional in the worst case, so NO
     broadcast hint — AQE decides (the lexical.py rule).
Cosine arithmetic is the bit-parity fold shared with similarity.py
(sequential accumulation = DuckDB list_dot_product order).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.functions.sweeps import (
    sweep_agg_columns,
    sweep_sql_columns,
)
from dic_a1_spark.operators.similarity import (
    IVF_K,
    _cosine_pre,
    _norm,
    ivf_assignments,
    ivf_assignments_fast,
)
from dic_a1_spark.sources.readers import load_table

# Drop threshold, calibrated to the driver's near-random embeddings the
# same way NEARDUP_SIM=0.4 was: at 0.35 the sf0.01 corpus drops 76/500
# vectors (15%) so both branches of the kept flag are populated; the
# production value for real embeddings is ~0.95+ (paper: eps 0.05-0.5 on
# normalized distances).
SEMDEDUP_SIM = 0.35


def _assign(
    spark: SparkSession, sf_dir: str, ivf_k: int | None
) -> DataFrame:
    """(vec_id, centroid_id): exact fixed-first-K assignment when
    ivf_k is None (the registered/oracle path), else the certified
    matmul twin with that many clusters (the scale path)."""
    if ivf_k is None:
        return ivf_assignments(spark, sf_dir).select("vec_id", "centroid_id")
    return ivf_assignments_fast(spark, sf_dir, ivf_k=ivf_k).select(
        "vec_id", "centroid_id"
    )


def _cluster_pairs(
    spark: SparkSession,
    sf_dir: str,
    *,
    ivf_k: int | None = None,
    asg: DataFrame | None = None,
) -> DataFrame:
    """All ordered within-cluster pairs (i < j) with rounded cosine —
    one shuffle on centroid_id; quadratic only inside a cluster.

    ``ivf_k=None`` (the registered/oracle path) uses the exact
    fixed-first-K assignment subtree; passing an int switches to the
    matmul assignment twin (driver-certified bit-identical) with that
    many clusters — the scale path, where K grows with the corpus so
    cluster size (and the quadratic term) stays bounded
    (tools/scale_bench.py sizes it)."""
    e = load_table(spark, sf_dir, "embeddings")
    vec = e.select(
        "vec_id",
        F.col("embedding").alias("v"),
        _norm(F.col("embedding")).alias("vn"),
    )
    if asg is None:
        asg = _assign(spark, sf_dir, ivf_k)
    side = asg.join(vec, "vec_id")
    left = side.select(
        F.col("vec_id").alias("i"),
        F.col("centroid_id").alias("cid"),
        F.col("v").alias("iv"),
        F.col("vn").alias("inrm"),
    )
    right = side.select(
        F.col("vec_id").alias("j"),
        F.col("centroid_id").alias("cid"),
        F.col("v").alias("jv"),
        F.col("vn").alias("jnrm"),
    )
    return (
        left.join(right, "cid")
        .where(F.col("i") < F.col("j"))
        .select(
            "cid",
            "i",
            "j",
            F.round(
                _cosine_pre(F.col("iv"), F.col("jv"), F.col("inrm"), F.col("jnrm")),
                4,
            ).alias("sim"),
        )
    )


def semdedup_dropped_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Witness rows for every dropped vector: the LOWEST-id earlier
    neighbor that condemned it, with the similarity. Certifies the pair
    scoring and the greedy rule itself."""
    p = _cluster_pairs(spark, sf_dir).where(F.col("sim") >= SEMDEDUP_SIM)
    w = p.groupBy("j").agg(F.min("i").alias("witness_id")).withColumnRenamed(
        "j", "dropped_id"
    )
    return w.join(
        p.select(
            F.col("j").alias("dropped_id"),
            F.col("i").alias("witness_id"),
            "sim",
        ),
        ["dropped_id", "witness_id"],
    ).select("dropped_id", "witness_id", "sim")


def semdedup_keep(
    spark: SparkSession, sf_dir: str, *, ivf_k: int | None = None
) -> DataFrame:
    """Full corpus with the kept flag: vec_id, centroid_id, label, kept.
    kept=false iff an earlier-id same-cluster vector is >= tau similar.
    ``ivf_k`` as in `_cluster_pairs` (None = registered exact path)."""
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    # ONE assignment subtree, shared by the keep join and the pair stage
    # (reviewer-flagged: building it twice doubles the most expensive
    # non-quadratic stage, especially on the scaled-K Arrow path).
    asg = _assign(spark, sf_dir, ivf_k)
    dropped = (
        _cluster_pairs(spark, sf_dir, ivf_k=ivf_k, asg=asg)
        .where(F.col("sim") >= SEMDEDUP_SIM)
        .select(F.col("j").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return (
        e.join(asg, "vec_id")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            "centroid_id",
            "label",
            F.coalesce(~F.col("is_dropped"), F.lit(True)).alias("kept"),
        )
    )


def semdedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cluster dedup census: members, dropped, kept_ratio."""
    k = semdedup_keep(spark, sf_dir)
    return (
        k.groupBy("centroid_id")
        .agg(
            F.count("*").alias("n_members"),
            F.sum((~F.col("kept")).cast("long")).alias("n_dropped"),
            F.round(
                F.sum(F.col("kept").cast("long")).cast("double")
                / F.count("*").cast("double"),
                4,
            ).alias("kept_ratio"),
        )
    )


# Operating points for the threshold sweep, bracketing SEMDEDUP_SIM.
SWEEP_TAUS = (0.30, 0.35, 0.40)


def semdedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row operating-point sweep: how many vectors the greedy rule
    would drop at each candidate threshold — the audit a pipeline runs
    to pick tau before committing to a dedup pass.

    Aggregate-once, evaluate-many: the within-cluster pair frame is
    scored ONCE, reduced to each later-id vector's maximum
    earlier-neighbor similarity (one groupBy), and every threshold is
    then a conditional count over that per-vector frame — adding an
    operating point costs one column, not a recomputation."""
    p = _cluster_pairs(spark, sf_dir)
    m = p.groupBy("j").agg(F.max("sim").alias("max_sim"))
    aggs = [F.count("*").cast("bigint").alias("n_candidates")]
    aggs += sweep_agg_columns(
        SWEEP_TAUS, lambda t: F.col("max_sim") >= F.lit(t), "dropped"
    )
    return m.agg(*aggs)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "semdedup_dropped_pairs": semdedup_dropped_pairs,
    "semdedup_keep": semdedup_keep,
    "semdedup_stats": semdedup_stats,
    "semdedup_threshold_sweep": semdedup_threshold_sweep,
}

# Oracle restates: fixed-first-K assignment (same CTE family as
# similarity.py's certified oracles) + within-cluster pairs + greedy rule.
_COS = (
    "(list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST({a} AS DOUBLE[]), CAST({a} AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST({b} AS DOUBLE[]), CAST({b} AS DOUBLE[])))))"
)
_COS_VC = _COS.format(a="v.embedding", b="c.embedding")
_COS_AB = _COS.format(a="a.embedding", b="b.embedding")

_PAIRS_CTE = f"""
    WITH scored AS (
        SELECT v.vec_id, c.vec_id AS centroid_id,
               round({_COS_VC}, 4) AS sim
        FROM embeddings v JOIN embeddings c ON c.vec_id < {IVF_K}
    ),
    asg AS (
        SELECT vec_id, centroid_id FROM (
            SELECT vec_id, centroid_id,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY sim DESC, centroid_id ASC
                   ) AS rnk
            FROM scored
        ) WHERE rnk = 1
    ),
    pairs AS (
        SELECT x.centroid_id AS cid, x.vec_id AS i, y.vec_id AS j,
               round({_COS_AB}, 4) AS sim
        FROM asg x
        JOIN asg y ON x.centroid_id = y.centroid_id AND x.vec_id < y.vec_id
        JOIN embeddings a ON a.vec_id = x.vec_id
        JOIN embeddings b ON b.vec_id = y.vec_id
    ),
    hits AS (SELECT * FROM pairs WHERE sim >= {SEMDEDUP_SIM})
"""

_SWEEP_COLS = sweep_sql_columns(
    SWEEP_TAUS, lambda t: f"max_sim >= {t}", "dropped"
)

ORACLES: dict[str, str] = {
    "semdedup_threshold_sweep": _PAIRS_CTE
    + f"""
    , m AS (SELECT j, max(sim) AS max_sim FROM pairs GROUP BY j)
    SELECT CAST(count(*) AS BIGINT) AS n_candidates,
           {_SWEEP_COLS}
    FROM m
    """,
    "semdedup_dropped_pairs": _PAIRS_CTE
    + """
    , w AS (SELECT j, min(i) AS keeper_hint FROM hits GROUP BY j)
    SELECT h.j AS dropped_id, h.i AS witness_id, h.sim
    FROM hits h JOIN w ON h.j = w.j AND h.i = w.keeper_hint
    """,
    "semdedup_keep": _PAIRS_CTE
    + """
    , dropped AS (SELECT DISTINCT j AS vec_id FROM hits)
    SELECT e.vec_id, a.centroid_id, e.label,
           (d.vec_id IS NULL) AS kept
    FROM embeddings e
    JOIN asg a USING (vec_id)
    LEFT JOIN dropped d USING (vec_id)
    """,
    "semdedup_stats": _PAIRS_CTE
    + """
    , dropped AS (SELECT DISTINCT j AS vec_id FROM hits),
    flagged AS (
        SELECT a.centroid_id, (d.vec_id IS NULL) AS kept
        FROM asg a LEFT JOIN dropped d USING (vec_id)
    )
    SELECT centroid_id,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN kept THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
           round(CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE)
                 / CAST(count(*) AS DOUBLE), 4) AS kept_ratio
    FROM flagged GROUP BY centroid_id
    """,
}
