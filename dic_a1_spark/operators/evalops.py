"""Pipeline quality-evaluation operators: the approximation-quality
reports a curation pipeline publishes next to its outputs.

Approximate operators (LSH banding, int8 retrieval) are only shippable
with a measured quality bound. These queries compute those bounds as
FIRST-CLASS, oracle-verified queries — both the approximate side and the
exact ground truth are deterministic in this engine, so the recall
numbers themselves are value-hash-checkable against DuckDB, not just
pytest-asserted:

  * `lsh_recall_report` — recall of the MinHash-LSH pair finder
    (lsh.dedup_minhash_md5_pairs) against ALL-PAIRS exact Jaccard over
    the same md5-base shingle sets at the same threshold. LSH verifies
    every candidate exactly, so precision is 1.0 by construction; the
    band configuration only loses pairs, and this report measures how
    many. The exact side uses the inverted base-value index (equi-join,
    never a cross join) — it is the expensive yardstick you run at
    audit scale, not per-increment.
  * `quantized_knn_recall_report` — per-query recall@K of int8
    retrieval (quantize.knn_cosine_quantized) against fp32 brute force
    (similarity.knn_cosine_bruteforce).
  * `dedup_group_size_histogram` — distribution of exact-dup group
    sizes (tokenset identity): the one-line shape answer to "how
    duplicated is this corpus", dimension-sized output.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table


def lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(n_true_pairs, n_lsh_pairs, missed, recall) — one audit row.

    True pairs: exact Jaccard >= JACCARD_THRESHOLD over per-doc DISTINCT
    md5-base shingle sets (the lsh.py currency), enumerated through the
    inverted index on base values. LSH pairs: the banded finder. The
    finder's verification step guarantees lsh_pairs ⊆ true_pairs, so
    recall = n_lsh / n_true (pinned in tests/test_evalops.py)."""
    from dic_a1_spark.operators.dedup import JACCARD_THRESHOLD, _with_shingle_arrays
    from dic_a1_spark.operators.lsh import (
        _md5_hashed_shingles,
        dedup_minhash_md5_pairs,
    )
    from pyspark import StorageLevel

    arrs = _md5_hashed_shingles(
        _with_shingle_arrays(load_table(spark, sf_dir, "documents"))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    flat = arrs.select("doc_id", F.explode("hs").alias("base"))
    sizes = arrs.select("doc_id", F.size("hs").alias("n_sh"))
    shared = (
        flat.alias("x")
        .join(flat.alias("y"), "base")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(
            F.col("x.doc_id").alias("doc1"), F.col("y.doc_id").alias("doc2")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    # sizes is one row per DOCUMENT (corpus-proportional) — no broadcast
    # hint: a hard hint pins a plan that exceeds broadcast limits at
    # audit scale. AQE broadcasts while it fits, else sort-merge on the
    # pair frame's own grouping keys (cheap).
    true_pairs = (
        shared.join(sizes.withColumnRenamed("doc_id", "doc1"), "doc1")
        .withColumnRenamed("n_sh", "n1")
        .join(
            sizes.withColumnRenamed("doc_id", "doc2").withColumnRenamed(
                "n_sh", "n2"
            ),
            "doc2",
        )
        .where(
            F.col("n_shared").cast("double")
            / (F.col("n1") + F.col("n2") - F.col("n_shared")).cast("double")
            >= F.lit(JACCARD_THRESHOLD)
        )
    )
    true_cnt = true_pairs.agg(F.count("*").alias("n_true_pairs"))
    # share the persisted hashed-shingle frame with the finder — without
    # it the corpus is tokenized twice and cached twice
    lsh_cnt = dedup_minhash_md5_pairs(spark, sf_dir, arrs=arrs).agg(
        F.count("*").alias("n_lsh_pairs")
    )
    return true_cnt.crossJoin(lsh_cnt).select(
        "n_true_pairs",
        "n_lsh_pairs",
        (F.col("n_true_pairs") - F.col("n_lsh_pairs")).alias("missed"),
        F.when(F.col("n_true_pairs") == 0, F.lit(1.0))
        .otherwise(
            F.round(
                F.col("n_lsh_pairs").cast("double")
                / F.col("n_true_pairs").cast("double"),
                4,
            )
        )
        .alias("recall"),
    )


def quantized_knn_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@K of int8 retrieval vs fp32 brute force — the
    table that justifies (or vetoes) shipping quantized vectors for the
    re-rank stage. Both sides are deterministic queries of this engine,
    so the recall values are exact in any engine."""
    from dic_a1_spark.operators.quantize import knn_cosine_quantized
    from dic_a1_spark.operators.similarity import TOP_K, knn_cosine_bruteforce

    fp = knn_cosine_bruteforce(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("fp_neighbor")
    )
    q8 = knn_cosine_quantized(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("q8_neighbor")
    )
    matched = fp.join(
        q8,
        (fp["query_id"] == q8["query_id"])
        & (fp["fp_neighbor"] == q8["q8_neighbor"]),
    ).groupBy(fp["query_id"].alias("query_id")).agg(
        F.count("*").alias("n_matched")
    )
    return (
        fp.select("query_id")
        .distinct()
        .join(matched, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            F.round(
                F.coalesce("n_matched", F.lit(0)) / F.lit(float(TOP_K)), 4
            ).alias("recall_at_k"),
        )
    )


def dedup_group_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How duplicated is the corpus: for each exact-dup group size
    (tokenset identity, dedup.dedup_tokenset_groups), how many groups and
    how many documents. Output is |distinct sizes|-sized — a handful of
    rows at any corpus scale."""
    from dic_a1_spark.operators.dedup import dedup_tokenset_groups

    groups = dedup_tokenset_groups(spark, sf_dir)
    return (
        groups.groupBy(F.col("n_docs").alias("group_size"))
        .agg(
            F.count("*").alias("n_groups"),
            F.sum("n_docs").cast("long").alias("n_docs_total"),
        )
    )


def pq_knn_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query recall@K of the PQ shortlist+re-rank pipeline vs fp32
    brute force — the audit that sizes PQ_SHORTLIST (the quantized
    report's posture, for the third compression family)."""
    from dic_a1_spark.operators.pq import knn_cosine_pq
    from dic_a1_spark.operators.similarity import TOP_K, knn_cosine_bruteforce

    fp = knn_cosine_bruteforce(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("fp_neighbor")
    )
    pqk = knn_cosine_pq(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("pq_neighbor")
    )
    matched = fp.join(
        pqk,
        (fp["query_id"] == pqk["query_id"])
        & (fp["fp_neighbor"] == pqk["pq_neighbor"]),
    ).groupBy(fp["query_id"].alias("query_id")).agg(
        F.count("*").alias("n_matched")
    )
    return (
        fp.select("query_id")
        .distinct()
        .join(matched, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            F.round(
                F.coalesce("n_matched", F.lit(0)) / F.lit(float(TOP_K)), 4
            ).alias("recall_at_k"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lsh_recall_report": lsh_recall_report,
    "quantized_knn_recall_report": quantized_knn_recall_report,
    "pq_knn_recall_report": pq_knn_recall_report,
    "dedup_group_size_histogram": dedup_group_size_histogram,
}


def _oracles() -> dict[str, str]:
    from dic_a1_spark.operators.dedup import JACCARD_THRESHOLD
    from dic_a1_spark.operators.lsh import ORACLES as LSH_ORACLES
    from dic_a1_spark.operators.pq import ORACLES as PQ_ORACLES
    from dic_a1_spark.operators.quantize import ORACLES as Q_ORACLES
    from dic_a1_spark.operators.similarity import ORACLES as SIM_ORACLES
    from dic_a1_spark.operators.dedup import ORACLES as DEDUP_ORACLES
    from dic_a1_spark.operators.dedup import _SHINGLE_CTE

    from dic_a1_spark.operators.similarity import TOP_K

    _TOP_K_F = f"{float(TOP_K)}"
    lsh_pairs_sql = LSH_ORACLES["dedup_minhash_md5_pairs"]
    return {
        "lsh_recall_report": f"""
            WITH {_SHINGLE_CTE},
            based AS (
                SELECT DISTINCT doc_id,
                       CAST(('0x' || substring(md5(shingle), 1, 10)) AS BIGINT)
                           AS base
                FROM sh
            ),
            bsizes AS (
                SELECT doc_id, count(*) AS n_sh FROM based GROUP BY doc_id
            ),
            bshared AS (
                SELECT x.doc_id AS doc1, y.doc_id AS doc2, count(*) AS n_shared
                FROM based x JOIN based y
                  ON x.base = y.base AND x.doc_id < y.doc_id
                GROUP BY 1, 2
            ),
            tp AS (
                SELECT count(*) AS n_true FROM bshared s
                JOIN bsizes z1 ON z1.doc_id = s.doc1
                JOIN bsizes z2 ON z2.doc_id = s.doc2
                WHERE CAST(s.n_shared AS DOUBLE)
                      / CAST(z1.n_sh + z2.n_sh - s.n_shared AS DOUBLE)
                      >= {JACCARD_THRESHOLD}
            ),
            lp AS (SELECT count(*) AS n_lsh FROM ({lsh_pairs_sql}))
            SELECT CAST(n_true AS BIGINT) AS n_true_pairs,
                   CAST(n_lsh AS BIGINT) AS n_lsh_pairs,
                   CAST(n_true - n_lsh AS BIGINT) AS missed,
                   CASE WHEN n_true = 0 THEN 1.0
                        ELSE round(CAST(n_lsh AS DOUBLE)
                                   / CAST(n_true AS DOUBLE), 4) END AS recall
            FROM tp CROSS JOIN lp
        """,
        "quantized_knn_recall_report": f"""
            WITH fp AS (
                SELECT query_id, neighbor_id
                FROM ({SIM_ORACLES["knn_cosine_bruteforce"]})
            ),
            q8 AS (
                SELECT query_id, neighbor_id
                FROM ({Q_ORACLES["knn_cosine_quantized"]})
            ),
            m AS (
                SELECT fp.query_id, count(*) AS n_matched
                FROM fp JOIN q8 ON fp.query_id = q8.query_id
                                AND fp.neighbor_id = q8.neighbor_id
                GROUP BY fp.query_id
            )
            SELECT f.query_id,
                   COALESCE(m.n_matched, 0) AS n_matched,
                   round(CAST(COALESCE(m.n_matched, 0) AS DOUBLE)
                         / {_TOP_K_F}, 4) AS recall_at_k
            FROM (SELECT DISTINCT query_id FROM fp) f
            LEFT JOIN m ON m.query_id = f.query_id
        """,
        "pq_knn_recall_report": f"""
            WITH fp AS (
                SELECT query_id, neighbor_id
                FROM ({SIM_ORACLES["knn_cosine_bruteforce"]})
            ),
            pqk AS (
                SELECT query_id, neighbor_id
                FROM ({PQ_ORACLES["knn_cosine_pq"]})
            ),
            m AS (
                SELECT fp.query_id, count(*) AS n_matched
                FROM fp JOIN pqk ON fp.query_id = pqk.query_id
                                 AND fp.neighbor_id = pqk.neighbor_id
                GROUP BY fp.query_id
            )
            SELECT f.query_id,
                   COALESCE(m.n_matched, 0) AS n_matched,
                   round(CAST(COALESCE(m.n_matched, 0) AS DOUBLE)
                         / {_TOP_K_F}, 4) AS recall_at_k
            FROM (SELECT DISTINCT query_id FROM fp) f
            LEFT JOIN m ON m.query_id = f.query_id
        """,
        "dedup_group_size_histogram": f"""
            SELECT n_docs AS group_size,
                   CAST(count(*) AS BIGINT) AS n_groups,
                   CAST(sum(n_docs) AS BIGINT) AS n_docs_total
            FROM ({DEDUP_ORACLES["dedup_tokenset_groups"]})
            GROUP BY n_docs
        """,
    }


ORACLES: dict[str, str] = _oracles()


def dedup_ladder_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per dedup level — exact text, order-insensitive tokenset,
    MinHash-LSH, SimHash — with group count, singleton count, largest
    group, and the dedup ratio (docs removed if one representative per
    group is kept). The ladder-comparison table a pipeline publishes to
    choose its dedup aggressiveness; every input here is an
    oracle-certified query (the sketch levels via the md5 twin families,
    lsh.py), so the whole report carries the full value-hash gate.
    Output is exactly 4 rows at any corpus scale; each level's
    aggregation is a group-size rollup over its (already scale-shaped)
    groups frame."""
    from dic_a1_spark.operators.dedup import (
        dedup_exact_groups,
        dedup_tokenset_groups,
    )
    from dic_a1_spark.operators.lsh import (
        dedup_minhash_md5_groups,
        dedup_simhash_md5_groups,
    )

    def from_sizes(method: str, sizes: DataFrame) -> DataFrame:
        # sizes: one row per group with column n_docs
        return sizes.agg(
            F.lit(method).alias("method"),
            F.sum("n_docs").alias("n_docs"),
            F.count("*").alias("n_groups"),
            F.sum((F.col("n_docs") == 1).cast("long")).alias("n_singletons"),
            F.max("n_docs").alias("max_group_size"),
        )

    def from_labels(method: str, labels: DataFrame) -> DataFrame:
        sizes = labels.groupBy("group_id").agg(F.count("*").alias("n_docs"))
        return from_sizes(method, sizes)

    report = (
        from_sizes("exact", dedup_exact_groups(spark, sf_dir).select("n_docs"))
        .unionByName(
            from_sizes(
                "tokenset",
                dedup_tokenset_groups(spark, sf_dir).select("n_docs"),
            )
        )
        .unionByName(
            from_labels("minhash_md5", dedup_minhash_md5_groups(spark, sf_dir))
        )
        .unionByName(
            from_labels("simhash_md5", dedup_simhash_md5_groups(spark, sf_dir))
        )
    )
    return report.select(
        "method",
        "n_docs",
        "n_groups",
        "n_singletons",
        "max_group_size",
        F.round(
            F.lit(1.0)
            - F.col("n_groups").cast("double") / F.col("n_docs").cast("double"),
            4,
        ).alias("dedup_ratio"),
    )


QUERIES["dedup_ladder_report"] = dedup_ladder_report


def _ladder_oracle() -> str:
    from dic_a1_spark.operators.dedup import ORACLES as DEDUP_ORACLES
    from dic_a1_spark.operators.lsh import ORACLES as LSH_ORACLES

    def stats(method: str, sizes_sql: str) -> str:
        return f"""
        SELECT '{method}' AS method,
               CAST(sum(n_docs) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_groups,
               CAST(sum(CASE WHEN n_docs = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_singletons,
               CAST(max(n_docs) AS BIGINT) AS max_group_size,
               round(1.0 - CAST(count(*) AS DOUBLE)
                           / CAST(sum(n_docs) AS DOUBLE), 4) AS dedup_ratio
        FROM ({sizes_sql})"""

    exact = f"SELECT n_docs FROM ({DEDUP_ORACLES['dedup_exact_groups']})"
    tokenset = f"SELECT n_docs FROM ({DEDUP_ORACLES['dedup_tokenset_groups']})"
    mh = (
        "SELECT CAST(count(*) AS BIGINT) AS n_docs FROM ("
        + LSH_ORACLES["dedup_minhash_md5_groups"]
        + ") GROUP BY group_id"
    )
    sh = (
        "SELECT CAST(count(*) AS BIGINT) AS n_docs FROM ("
        + LSH_ORACLES["dedup_simhash_md5_groups"]
        + ") GROUP BY group_id"
    )
    return (
        stats("exact", exact)
        + " UNION ALL "
        + stats("tokenset", tokenset)
        + " UNION ALL "
        + stats("minhash_md5", mh)
        + " UNION ALL "
        + stats("simhash_md5", sh)
    )


ORACLES["dedup_ladder_report"] = _ladder_oracle()
