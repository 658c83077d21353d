"""Oracle + semantics checks for duplicate-cluster representative
selection (operators/repselect.py)."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import repselect as rs
from dic_a1_spark.operators import qlinear
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(rs.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, rs.ORACLES[name], rs.QUERIES[name], SF_CORRECT, name)


def test_best_of_group_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from dic_a1_spark.operators.dedup import tokenset_hash
    from dic_a1_spark.sources.readers import load_table

    hashes = {
        r["doc_id"]: r["h"]
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", tokenset_hash(F.col("text")).alias("h"))
        .collect()
    }
    scores = {
        r["doc_id"]: r["score_fp"]
        for r in qlinear.qlin_doc_scores(spark, SF_CORRECT).collect()
    }
    groups: dict[str, list[int]] = {}
    for d, h in hashes.items():
        groups.setdefault(h, []).append(d)
    exp = {
        h: min(ds, key=lambda d: (-scores[d], d)) for h, ds in groups.items()
    }
    got = {
        r["tokenset_hash"]: r
        for r in rs.repselect_best_of_group(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(exp)
    for h, keep in exp.items():
        r = got[h]
        assert r["keep_doc_id"] == keep
        assert r["n_docs"] == len(groups[h])
        assert r["best_score_fp"] == scores[keep]
        assert r["minid_doc_id"] == min(groups[h])
    # Non-vacuity: the policy must actually differ from min-id somewhere
    # (a multi-doc group whose best-quality member is not the lowest id).
    assert any(
        r["keep_doc_id"] != r["minid_doc_id"] for r in got.values()
    ), "vacuous: best-of-cluster never disagrees with min-id"


def test_gain_consistent_with_best_of_group(spark):
    best = rs.repselect_best_of_group(spark, SF_CORRECT).collect()
    scores = {
        r["doc_id"]: r["score_fp"]
        for r in qlinear.qlin_doc_scores(spark, SF_CORRECT).collect()
    }
    g = rs.repselect_gain(spark, SF_CORRECT).first()
    assert g["n_groups"] == len(best)
    assert g["n_multi_groups"] == sum(1 for r in best if r["n_docs"] >= 2)
    assert g["docs_removed"] == sum(r["n_docs"] - 1 for r in best)
    assert g["best_total_fp"] == sum(r["best_score_fp"] for r in best)
    assert g["minid_total_fp"] == sum(
        scores[r["minid_doc_id"]] for r in best
    )
    assert g["gain_fp"] == g["best_total_fp"] - g["minid_total_fp"]
    assert g["gain_fp"] >= 0  # best-of can never lose to min-id
