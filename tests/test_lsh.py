"""Oracle + semantics checks for the md5-family MinHash-LSH
(dic_a1_spark/operators/lsh.py) — the hash-verified twin of the
xxhash64 production pipeline in operators/dedup.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import dedup, lsh
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT], ids=["sf0.001", "sf0.01"])
def test_matches_oracle(spark, sf_dir):
    compare(
        spark,
        lsh.ORACLES["dedup_minhash_md5_pairs"],
        lsh.dedup_minhash_md5_pairs,
        sf_dir,
        "dedup_minhash_md5_pairs",
    )


def test_pairs_subset_of_exact_jaccard(spark):
    """LSH emits only verified pairs: every output pair must appear in the
    exact-Jaccard ground truth with the identical jaccard value (LSH can
    lose recall, never precision)."""
    got = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in lsh.dedup_minhash_md5_pairs(spark, SF_CORRECT).collect()
    }
    truth = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in dedup.dedup_jaccard_pairs(spark, SF_CORRECT).collect()
    }
    assert got, "LSH found no pairs at sf0.01 — vacuous test"
    for pair, j in got.items():
        assert pair in truth and truth[pair] == j, pair


def test_recall_vs_exact_jaccard(spark):
    """At jaccard >= 0.5 with 16 hashes / 4 bands of 4,
    P(candidate) = 1-(1-s^4)^4 >= 0.23; on the clustered testdata dups
    (mostly near-identical, s ~ 0.8+) empirical recall should be high."""
    got = {
        (r["doc1"], r["doc2"])
        for r in lsh.dedup_minhash_md5_pairs(spark, SF_CORRECT).collect()
    }
    truth = {
        (r["doc1"], r["doc2"])
        for r in dedup.dedup_jaccard_pairs(spark, SF_CORRECT).collect()
    }
    assert len(got & truth) >= 0.6 * len(truth), (len(got), len(truth))


def test_signatures_map_only(spark):
    """Signature computation must not shuffle — the first exchange in the
    pipeline is the band join itself."""
    arrs = dedup._with_shingle_arrays(
        __import__(
            "dic_a1_spark.sources.readers", fromlist=["load_table"]
        ).load_table(spark, SF_SMOKE, "documents")
    )
    sig = lsh._md5_minhash_signatures(lsh._md5_hashed_shingles(arrs))
    plan = sig._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@pytest.mark.parametrize("sf_dir", [SF_SMOKE, SF_CORRECT], ids=["sf0.001", "sf0.01"])
def test_groups_match_oracle(spark, sf_dir):
    """The unrolled fixed-iteration label-propagation oracle must agree
    with label_propagate exactly — the hash certificate for the logic the
    whole groups ladder shares."""
    compare(
        spark,
        lsh.ORACLES["dedup_minhash_md5_groups"],
        lsh.dedup_minhash_md5_groups,
        sf_dir,
        "dedup_minhash_md5_groups",
    )


def test_groups_cover_pairs_one_row_per_doc(spark):
    """Groups invariant: both ends of every verified pair share a label;
    exactly one row per document; unpaired docs keep their own id."""
    from dic_a1_spark.sources.readers import load_table

    labels = {
        r["doc_id"]: r["group_id"]
        for r in lsh.dedup_minhash_md5_groups(spark, SF_CORRECT).collect()
    }
    assert len(labels) == load_table(spark, SF_CORRECT, "documents").count()
    pairs = lsh.dedup_minhash_md5_pairs(spark, SF_CORRECT).collect()
    assert pairs, "no verified pairs at sf0.01 — vacuous"
    paired = set()
    for r in pairs:
        assert labels[r["doc1"]] == labels[r["doc2"]], (r["doc1"], r["doc2"])
        paired.update((r["doc1"], r["doc2"]))
    for doc_id, g in labels.items():
        if doc_id not in paired:
            assert g == doc_id
