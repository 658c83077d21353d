"""Oracle + recall checks for embedding decontamination
(operators/embdecontam.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import embdecontam as ed
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ed.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, ed.ORACLES[name], ed.QUERIES[name], SF_CORRECT, name)


def _exact_bipartite(spark, threshold):
    """Ground truth: exact cosine over ALL train x bench pairs (test-only
    crossJoin — bench side is ~1% of the corpus)."""
    from dic_a1_spark.operators.similarity import _cosine_pre, _norm
    from dic_a1_spark.sources.readers import load_table

    e = load_table(spark, SF_CORRECT, "embeddings").select(
        "vec_id", "embedding", _norm(F.col("embedding")).alias("nrm")
    )
    bench = e.where((F.col("vec_id") % ed.EMBDECONTAM_MOD) == 0).select(
        F.col("vec_id").alias("bench_id"),
        F.col("embedding").alias("bv"),
        F.col("nrm").alias("bn"),
    )
    train = e.where((F.col("vec_id") % ed.EMBDECONTAM_MOD) != 0)
    return (
        train.crossJoin(F.broadcast(bench))
        .select(
            "vec_id",
            "bench_id",
            F.round(
                _cosine_pre(F.col("embedding"), F.col("bv"),
                            F.col("nrm"), F.col("bn")), 4
            ).alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def test_blocked_recall_vs_exact(spark):
    exact = {
        (r["vec_id"], r["bench_id"])
        for r in _exact_bipartite(spark, ed.EMBDECONTAM_SIM).collect()
    }
    got = {
        (r["vec_id"], r["bench_id"])
        for r in ed.embdecontam_flagged(spark, SF_CORRECT).collect()
    }
    assert got <= exact, "blocked pairs must be a subset of exact pairs"
    assert exact, "vacuous: no contaminated pairs exist at the threshold"
    assert len(got) / len(exact) >= 0.9, (
        f"blocked recall {len(got)}/{len(exact)} below 0.9"
    )


def test_summary_consistent_with_flagged(spark):
    fl = ed.embdecontam_flagged(spark, SF_CORRECT).collect()
    s = ed.embdecontam_summary(spark, SF_CORRECT).first()
    assert s["n_pairs"] == len(fl)
    assert s["n_flagged"] == len({r["vec_id"] for r in fl})
    assert s["n_train"] + s["n_bench"] > 0
    assert 0 < s["n_flagged"] < s["n_train"], "flag gate must discriminate"
