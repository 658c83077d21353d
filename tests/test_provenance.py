"""Oracle + semantics checks for the source-overlap audit
(operators/provenance.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import provenance as pv
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(pv.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, pv.ORACLES[name], pv.QUERIES[name], SF_CORRECT, name)


def _py_source_shingles(spark):
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    rows = (
        load_table(spark, SF_CORRECT, "documents")
        .select("source", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    per_src: dict[str, set] = {}
    for r in rows:
        toks = list(r["toks"])
        for i in range(len(toks) - pv.PROV_SHINGLE_W + 1):
            per_src.setdefault(r["source"], set()).add(
                " ".join(toks[i : i + pv.PROV_SHINGLE_W])
            )
    return per_src


def test_matrix_matches_python_reference(spark):
    per_src = _py_source_shingles(spark)
    nsrc: dict[str, int] = {}
    for s, sh in per_src.items():
        for g in sh:
            nsrc[g] = nsrc.get(g, 0) + 1
    kept = {
        s: {g for g in sh if nsrc[g] <= pv.PROV_MAX_SOURCES}
        for s, sh in per_src.items()
    }
    got = {
        (r["src1"], r["src2"]): r
        for r in pv.source_overlap_matrix(spark, SF_CORRECT).collect()
    }
    srcs = sorted(kept)
    n_pairs = 0
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1 :]:
            shared = len(kept[s1] & kept[s2])
            if shared == 0:
                assert (s1, s2) not in got
                continue
            n_pairs += 1
            r = got[(s1, s2)]
            assert r["n_shared"] == shared
            assert r["n1"] == len(kept[s1]) and r["n2"] == len(kept[s2])
            union = len(kept[s1]) + len(kept[s2]) - shared
            assert math.isclose(r["jaccard_r"], shared / union, abs_tol=5e-7)
    assert len(got) == n_pairs
    # Non-vacuity: overlap must vary across pairs.
    assert len({r["jaccard_r"] for r in got.values()}) > 10


def test_summary_both_ceiling_branches_live(spark):
    r = pv.source_overlap_summary(spark, SF_CORRECT).collect()[0]
    assert r["n_shingles_kept"] > 0
    assert r["n_shingles_ceiled"] > 0, (
        "ceiling never trips — lower PROV_MAX_SOURCES (Q11)"
    )
    assert r["n_sources"] == 20
    assert 0.0 < r["max_jaccard_r"] < 1.0
