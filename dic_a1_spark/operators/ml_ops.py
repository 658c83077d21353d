"""Spark ML integration: the library path for clustering and LSH.

The hand-rolled operators elsewhere (operators/similarity.py IVF,
operators/dedup.py MinHash) show the algorithms as explicit DataFrame
plans; this module shows the same capabilities through spark.ml — the
route a production pipeline usually takes (Pipeline persistence,
mergeable models, distributed fit).

Oracle status (the ledger, closed in round 9):
  * ml_minhash_neardups — HASH-GATED. MinHashLSHModel's hash family is
    fully determined by the seed: h_j(S) = min over token indices i of
    ((1 + i) * a_j + b_j) mod 2038074743, with (a_j, b_j) drawn from
    the seed-initialized RNG at fit time INDEPENDENT of the data (the
    model's randCoefficients). With the vocabulary index made
    deterministic (alphabetical — CountVectorizerModel.from_vocabulary
    instead of frequency-ordered CountVectorizer.fit, whose tie order
    is partition-dependent), every hash value, every candidate
    collision, and the strict dist < threshold filter of
    approxSimilarityJoin are restatable in SQL with the four (a_j, b_j)
    pairs as constants. tests/test_ml_ops.py pins the fitted model's
    coefficients to the hardcoded constants (solved from two singleton
    vectors — the hash is linear in the index), so a Spark upgrade that
    changes the RNG fails the pin loudly instead of silently forking
    the oracle.
  * ml_kmeans_clusters — ROWS-ONLY BY DESIGN, documented here once:
    KMeans' k-means|| initialization draws from Spark's private
    XORShiftRandom seeded per (seed, partition index), so the fitted
    centroids depend on input split boundaries, and restating the fit
    in SQL would mean reimplementing that RNG plus the treeAggregate
    float summation order — neither is public SQL-expressible
    behavior. The yardstick's value is the library integration path;
    its determinism-under-fixed-splits and assignment quality are
    asserted in tests/test_ml_ops.py instead.

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

# MinHashLSH(seed=42, numHashTables=4) hash coefficients (a_j, b_j):
# h_j(S) = min_i ((1 + i) * a_j + b_j) mod HASH_PRIME over S's token
# indices. Data-independent (drawn from the seed at fit time); solved
# from two singleton vectors (the hash is linear in the index, so two
# evaluations determine (a, b) mod the prime) and pinned against the
# fitted model in tests/test_ml_ops.py.
MINHASH_PRIME = 2038074743
MINHASH_COEFFS = (
    (1562431131, 117392763),
    (1467211249, 102948884),
    (662969971, 2023087525),
    (595021506, 1519796918),
)
MINHASH_TABLES = len(MINHASH_COEFFS)
MINHASH_DIST = 0.5  # approxSimilarityJoin threshold (STRICT <)
# Loud driver-collect bound for the deterministic vocabulary (the same
# driver footprint CountVectorizer.fit itself has — spark.ml collects
# the vocabulary to build the model either way).
_VOCAB_CAP = 2_000_000


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

    from dic_a1_spark.sources.readers import table_rowcount

    n = table_rowcount(sf_dir, "embeddings")
    if n == 0:
        # KMeans.fit raises on an empty dataset (r10 empty-corpus
        # probe); the footer-metadata count costs no corpus action.
        import pyspark.sql.types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("vec_id", T.LongType()),
                    T.StructField("label", T.IntegerType()),
                    T.StructField("cluster", T.IntegerType()),
                ]
            ),
        )
    feats = _features(spark, sf_dir)
    if n < 2:
        # spark.ml KMeans requires k >= 2; a single-vector slice has
        # exactly one possible clustering (r10 one-row-corpus probe).
        return feats.select(
            "vec_id", "label", F.lit(0).cast("int").alias("cluster")
        )
    # k > n also fails the fit (r10 one-row-corpus probe); a slice
    # smaller than the configured k clusters to one point per row.
    model = KMeans(k=min(KMEANS_K, n), seed=SEED, maxIter=10).fit(feats)
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
    the shape a 100 TB pipeline actually runs.

    HASH-GATED since round 9: the vocabulary index is DETERMINISTIC
    (alphabetical, CountVectorizerModel.from_vocabulary) instead of
    CountVectorizer.fit's frequency order (whose tie order is
    partition-dependent), which makes every minhash value a pure
    function of (token set, seed) — the oracle restates the band
    collisions with the model's seed-derived coefficients as constants
    (MINHASH_COEFFS, pinned in tests/test_ml_ops.py) and the exact
    STRICT keyDistance filter (dist < 0.5, verified empirically: an
    exactly-0.5-distance pair is NOT emitted). Vocabulary sort parity:
    Python sorted() orders by code point, DuckDB ORDER BY by UTF-8
    bytes — identical orders, UTF-8 preserves code-point order."""
    from pyspark.ml.feature import CountVectorizerModel, MinHashLSH

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
    # Deterministic vocabulary: every distinct token, alphabetical.
    # Driver-bounded exactly like CountVectorizer.fit's own vocabulary
    # collect; the limit(cap+1) bounds what the driver materializes and
    # the over-cap check fails LOUDLY (the embdecontam guard pattern).
    vocab_rows = (
        reps.select(F.explode("toks").alias("t"))
        .distinct()
        .limit(_VOCAB_CAP + 1)
        .collect()
    )
    if len(vocab_rows) > _VOCAB_CAP:
        raise ValueError(
            f"ml_minhash_neardups: vocabulary exceeds the documented "
            f"driver bound ({_VOCAB_CAP}) — shard the corpus or raise "
            f"the cap deliberately"
        )
    vocab = sorted(r["t"] for r in vocab_rows)
    if not vocab:
        # Empty/token-free corpus: CountVectorizerModel.from_vocabulary
        # raises on an empty list (r10 empty-corpus probe). No tokens ->
        # no candidate pairs; emit the empty pair table.
        import pyspark.sql.types as T

        return spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("doc1", T.LongType()),
                    T.StructField("doc2", T.LongType()),
                    T.StructField("jaccard", T.DoubleType()),
                ]
            ),
        )
    cv = CountVectorizerModel.from_vocabulary(
        vocab, inputCol="toks", outputCol="features", binary=True
    )
    # Persist the vectorized frame: approxSimilarityJoin references it as
    # BOTH join sides and the LSH fit scans it again — unpersisted, the
    # tokenize -> vectorize chain re-runs three times.
    feats = (
        cv.transform(reps)
        .select("gkey", "features")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    lsh = MinHashLSH(
        inputCol="features",
        outputCol="hashes",
        numHashTables=MINHASH_TABLES,
        seed=SEED,
    ).fit(feats)
    rep_pairs = (
        lsh.approxSimilarityJoin(feats, feats, MINHASH_DIST, distCol="jaccard_dist")
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
    # rows-only BY DESIGN — see the module docstring ledger paragraph
    # (k-means|| init RNG is partition-dependent; not SQL-restatable).
    "ml_kmeans_clusters": ml_kmeans_clusters,
    # HASH-GATED since r9 (deterministic vocabulary + seed-pinned
    # coefficients — see the module docstring).
    "ml_minhash_neardups": ml_minhash_neardups,
}

from dic_a1_spark.config import duckdb_tokens_sql  # noqa: E402

_COEFF_VALUES = ", ".join(
    f"({j}, {a}, {b})" for j, (a, b) in enumerate(MINHASH_COEFFS)
)

# Restates the whole library pipeline: tokenset collapse -> alphabetical
# vocabulary index -> 4 seed-pinned minhashes -> band-collision
# candidates -> STRICT keyDistance filter -> member expansion. Two
# engine-parity facts carry it: (1) equal minhash in table j forces the
# SAME argmin token (a != 0 and vocab < prime make the hash injective on
# indices), so every candidate pair shares >= 1 token and union > 0;
# (2) round/div shapes restate Spark's 1.0 - (1 - i/u) association
# exactly (all counts integral < 2^53, so the casts are exact).
ORACLES: dict[str, str] = {
    "ml_minhash_neardups": f"""
        WITH doc_toks AS (
            SELECT doc_id,
                   list_distinct({duckdb_tokens_sql()}) AS toks
            FROM documents
        ),
        nonempty AS (
            SELECT doc_id,
                   md5(coalesce(array_to_string(list_sort(toks), ' '),
                                '')) AS gkey,
                   toks
            FROM doc_toks WHERE len(toks) > 0
        ),
        members AS (SELECT gkey, doc_id FROM nonempty),
        rep_tok AS (
            SELECT DISTINCT gkey, t.token
            FROM nonempty, unnest(toks) AS t(token)
        ),
        sizes AS (SELECT gkey, count(*) AS n FROM rep_tok GROUP BY gkey),
        vocab AS (
            SELECT token, row_number() OVER (ORDER BY token) - 1 AS idx
            FROM (SELECT DISTINCT token FROM rep_tok)
        ),
        hashes AS (
            SELECT r.gkey, c.j,
                   min(((1 + v.idx) * c.a + c.b) % {MINHASH_PRIME}) AS h
            FROM rep_tok r
            JOIN vocab v USING (token)
            CROSS JOIN (VALUES {_COEFF_VALUES}) AS c(j, a, b)
            GROUP BY r.gkey, c.j
        ),
        cand AS (
            SELECT DISTINCT h1.gkey AS g1, h2.gkey AS g2
            FROM hashes h1
            JOIN hashes h2 ON h1.j = h2.j AND h1.h = h2.h
            WHERE h1.gkey < h2.gkey
        ),
        inter AS (
            SELECT c.g1, c.g2, count(*) AS i
            FROM cand c
            JOIN rep_tok r1 ON r1.gkey = c.g1
            JOIN rep_tok r2 ON r2.gkey = c.g2 AND r2.token = r1.token
            GROUP BY c.g1, c.g2
        ),
        rep_pairs AS (
            SELECT g1, g2,
                   round(1.0 - (1.0 - CAST(i AS DOUBLE)
                                / CAST(s1.n + s2.n - i AS DOUBLE)),
                         4) AS jaccard
            FROM inter
            JOIN sizes s1 ON s1.gkey = g1
            JOIN sizes s2 ON s2.gkey = g2
            WHERE (1.0 - CAST(i AS DOUBLE)
                   / CAST(s1.n + s2.n - i AS DOUBLE)) < {MINHASH_DIST}
        ),
        cross_pairs AS (
            SELECT least(ma.doc_id, mb.doc_id) AS doc1,
                   greatest(ma.doc_id, mb.doc_id) AS doc2,
                   p.jaccard
            FROM rep_pairs p
            JOIN members ma ON ma.gkey = p.g1
            JOIN members mb ON mb.gkey = p.g2
        ),
        within_pairs AS (
            SELECT m1.doc_id AS doc1, m2.doc_id AS doc2,
                   CAST(1.0 AS DOUBLE) AS jaccard
            FROM members m1
            JOIN members m2
              ON m1.gkey = m2.gkey AND m1.doc_id < m2.doc_id
        )
        SELECT doc1, doc2, jaccard FROM cross_pairs
        UNION ALL
        SELECT doc1, doc2, jaccard FROM within_pairs
    """,
}
