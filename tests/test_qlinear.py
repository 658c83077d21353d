"""Oracle + semantics checks for linear quality scoring (operators/qlinear.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import qlinear as ql
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ql.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, ql.ORACLES[name], ql.QUERIES[name], SF_CORRECT, name)


def _docs(spark):
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    return [
        (r["doc_id"], r["source"], list(r["toks"]))
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "source", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    ]


def _py_score(toks):
    w = dict(ql.QLIN_WEIGHTS)
    raw = sum(w.get(t, 0) for t in toks) + ql.QLIN_BIAS
    n = len(toks)
    # trunc-toward-zero division, matching Spark div / DuckDB //
    score_fp = int(raw * 100 / n) if n > 0 else 0
    return raw, raw >= 0, score_fp


def test_doc_scores_match_python_reference(spark):
    docs = _docs(spark)
    exp = {d: _py_score(toks) for d, _, toks in docs}
    got = {
        r["doc_id"]: (r["raw"], r["label"], r["score_fp"])
        for r in ql.qlin_doc_scores(spark, SF_CORRECT).collect()
    }
    assert got == exp
    labels = {v[1] for v in got.values()}
    assert labels == {True, False}, "both labels must be populated (Q11)"


def test_label_census_consistent(spark):
    docs = _docs(spark)
    exp: dict[str, list[int]] = {}
    for d, src, toks in docs:
        a = exp.setdefault(src, [0, 0])
        a[0] += 1
        a[1] += int(_py_score(toks)[1])
    got = {
        r["source"]: (r["n_docs"], r["n_pos"])
        for r in ql.qlin_label_census(spark, SF_CORRECT).collect()
    }
    assert got == {s: tuple(v) for s, v in exp.items()}


def test_histogram_covers_all_docs(spark):
    rows = ql.qlin_score_histogram(spark, SF_CORRECT).collect()
    docs = _docs(spark)
    assert sum(r["n_docs"] for r in rows) == len(docs)
    assert len(rows) >= 5, "histogram must spread across buckets (Q11)"
    # negative buckets must exist alongside non-negative ones: the
    # trunc-toward-zero division is only exercised when they do.
    assert any(r["bucket"] < 0 for r in rows)
    assert any(r["bucket"] >= 0 for r in rows)
