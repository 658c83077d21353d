"""Spark ML integration: the library path for clustering and LSH.

The hand-rolled operators elsewhere (operators/similarity.py IVF,
operators/dedup.py MinHash) show the algorithms as explicit DataFrame
plans; this module shows the same capabilities through spark.ml — the
route a production pipeline usually takes (Pipeline persistence,
mergeable models, distributed fit). Rows-only driver checks (model
internals aren't SQL-reproducible); determinism and quality properties
are asserted in tests/test_ml_ops.py.

Scale notes: KMeans fit is iterative map-reduce over cached features
(linear per iteration); MinHashLSH transform is a map-only signature
computation with approxSimilarityJoin doing the same band-bucket
equi-join our hand-rolled LSH does.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

KMEANS_K = 8
SEED = 42


def _features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        array_to_vector(F.col("embedding").cast("array<double>")).alias("features"),
    )


def ml_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMeans coarse quantizer fit with a fixed seed — the trained
    codebook the IVF index would use in production (vs the deterministic
    first-K codebook in operators/similarity.py)."""
    from pyspark.ml.clustering import KMeans

    feats = _features(spark, sf_dir)
    model = KMeans(k=KMEANS_K, seed=SEED, maxIter=10).fit(feats)
    return model.transform(feats).select(
        "vec_id", "label", F.col("prediction").alias("cluster")
    )


def ml_minhash_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.ml MinHashLSH near-dup pairs over binarized token features —
    approxSimilarityJoin on Jaccard distance. The library twin of
    operators/dedup.py's hand-rolled banding.

    Identical token SETS are collapsed to one representative before the
    LSH join and the pair list is expanded afterwards (cross-group
    member pairs inherit the reps' jaccard; within-group pairs are 1.0
    by construction). Jaccard depends only on the token set, and
    identical vectors collide in every hash table, so the emitted pair
    set is EXACTLY what the uncollapsed join produces — but the join
    never sees K identical vectors in one bucket (K^2 x numHashTables
    candidate rows each carrying two sparse vectors; the sf0.1 corpus
    has a 248-member identical group, which made the uncollapsed form a
    270 s query). Exact-dedup-before-near-dup is also the production
    admission order (operators/incremental.py), so the demo now shows
    the shape a 100 TB pipeline actually runs."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    from dic_a1_spark.functions.text import tokens_distinct

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.filter(tokens_distinct(F.col("text")), lambda w: w != "").alias("toks")
    ).where(F.size("toks") > 0)
    from pyspark import StorageLevel
    from pyspark.sql import Window

    # Canonical token-set key; one representative (min doc_id) per set.
    keyed = toks.withColumn(
        "gkey", F.md5(F.to_json(F.array_sort("toks")))
    ).persist(StorageLevel.MEMORY_AND_DISK)
    members = keyed.select("gkey", "doc_id")
    w = Window.partitionBy("gkey").orderBy("doc_id")
    reps = (
        keyed.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("gkey", "toks")
    )
    cv = CountVectorizer(
        inputCol="toks", outputCol="features", binary=True, minDF=1.0
    ).fit(reps)
    # Persist the vectorized frame: approxSimilarityJoin references it as
    # BOTH join sides and the LSH fit scans it again — unpersisted, the
    # tokenize -> CountVectorizer chain re-runs three times.
    feats = (
        cv.transform(reps)
        .select("gkey", "features")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=4, seed=SEED
    ).fit(feats)
    rep_pairs = (
        lsh.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
        .where(F.col("datasetA.gkey") < F.col("datasetB.gkey"))
        .select(
            F.col("datasetA.gkey").alias("g1"),
            F.col("datasetB.gkey").alias("g2"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 4).alias("jaccard"),
        )
    )
    # Expand: cross-group member pairs (both orders collapse to
    # doc1 < doc2; the g1 < g2 filter already made group pairs unique) …
    cross = (
        rep_pairs.join(members.withColumnRenamed("gkey", "g1"), "g1")
        .withColumnRenamed("doc_id", "da")
        .join(
            members.withColumnRenamed("gkey", "g2").withColumnRenamed(
                "doc_id", "db"
            ),
            "g2",
        )
        .select(
            F.least("da", "db").alias("doc1"),
            F.greatest("da", "db").alias("doc2"),
            "jaccard",
        )
    )
    # … plus within-group pairs: identical sets, jaccard exactly 1.0.
    m2 = members.withColumnRenamed("doc_id", "db")
    within = (
        members.join(m2, "gkey")
        .where(F.col("doc_id") < F.col("db"))
        .select(
            F.col("doc_id").alias("doc1"),
            F.col("db").alias("doc2"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "ml_kmeans_clusters": ml_kmeans_clusters,   # rows-only (iterative fit)
    "ml_minhash_neardups": ml_minhash_neardups,  # rows-only (model hashes)
}

ORACLES: dict[str, str] = {}
