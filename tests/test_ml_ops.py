"""Spark ML path: sanity + quality properties (model internals have no
SQL oracle, so these gate behavior instead of values)."""

from __future__ import annotations

from dic_a1_spark.operators import ml_ops
from tests.conftest import SF_SMOKE


def test_kmeans_clusters_all_vectors(spark):
    out = ml_ops.ml_kmeans_clusters(spark, SF_SMOKE)
    rows = out.collect()
    n_vecs = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").count()
    assert len(rows) == n_vecs
    clusters = {r["cluster"] for r in rows}
    assert clusters <= set(range(ml_ops.KMEANS_K))
    assert len(clusters) > 1, "degenerate clustering"


def test_ml_minhash_agrees_with_exact_jaccard(spark):
    """Library-LSH pairs must be real near-dups above the join threshold
    (approxSimilarityJoin computes the EXACT distance for candidates, so
    the reported jaccard is trustworthy — only recall is approximate)."""
    ml_pairs = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in ml_ops.ml_minhash_neardups(spark, SF_SMOKE).collect()
    }
    assert ml_pairs, "no near-dup pairs found by ML MinHashLSH"
    for (d1, d2), j in ml_pairs.items():
        assert d1 < d2
        assert 0.5 - 1e-9 <= j <= 1.0
