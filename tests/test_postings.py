"""Oracle + semantics checks for the inverted index (operators/postings.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import postings as po
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(po.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, po.ORACLES[name], po.QUERIES[name], SF_CORRECT, name)


def _py_index(spark):
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    rows = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    idx: dict[str, list[int]] = {}
    for r in rows:
        for t in set(r["toks"]):
            idx.setdefault(t, []).append(r["doc_id"])
    return {t: sorted(ds) for t, ds in idx.items()}


def test_postings_match_python_reference(spark):
    idx = _py_index(spark)
    got = {
        r["term"]: r for r in po.index_postings(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(idx)
    k = po.INDEX_MAX_POSTINGS
    for t, ds in idx.items():
        r = got[t]
        assert r["df"] == len(ds)
        head = ds[:k]
        assert r["n_shipped"] == len(head)
        assert r["truncated"] == (len(ds) > k)
        assert r["postings"] == " ".join(str(d) for d in head)
    # Q11: both flag branches must be populated on this corpus.
    assert any(r["truncated"] for r in got.values())
    assert any(not r["truncated"] for r in got.values())


def test_health_census_consistent(spark):
    idx = _py_index(spark)
    r = po.index_health(spark, SF_CORRECT).collect()[0]
    dfs = [len(ds) for ds in idx.values()]
    assert r["n_terms"] == len(dfs)
    assert r["n_postings_total"] == sum(dfs)
    assert r["n_truncated"] == sum(
        1 for d in dfs if d > po.INDEX_MAX_POSTINGS
    )
    assert r["max_df"] == max(dfs)
