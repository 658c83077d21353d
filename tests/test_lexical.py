"""Oracle + semantics checks for sparse lexical similarity and
cross-document repeated n-gram profiling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import lexical
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(lexical.ORACLES))
def test_lexical_oracle(spark, name):
    compare(spark, lexical.ORACLES[name], lexical.QUERIES[name], SF_CORRECT, name)


def test_docsim_nonvacuous_and_shapes(spark):
    df = lexical.docsim_tfidf_topk(spark, SF_CORRECT)
    rows = df.collect()
    # shingle terms keep the query non-vacuous on the 31-word-vocabulary
    # driver corpus (token terms would all be viral and df-ceilinged away)
    assert rows
    for r in rows:
        assert r["doc_id"] != r["partner_id"]
        assert 0.0 <= r["sim"] <= 1.0 + 1e-9
        assert 1 <= r["rnk"] <= lexical.DOCSIM_TOP_K
    # per doc: ranks are dense from 1
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["rnk"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values())


def test_docsim_pairs_are_symmetric_in_score(spark):
    rows = lexical.docsim_tfidf_topk(spark, SF_CORRECT).collect()
    score = {(r["doc_id"], r["partner_id"]): r["sim"] for r in rows}
    for (a, b), s in score.items():
        if (b, a) in score:
            assert score[(b, a)] == s


def test_repeated_ngrams_nonvacuous_and_bounded(spark):
    rows = lexical.dedup_repeated_ngrams(spark, SF_CORRECT).collect()
    assert rows
    n_dup = sum(r["n_dup_positions"] for r in rows)
    assert n_dup > 0  # the corpus does contain cross-document boilerplate
    for r in rows:
        assert 0 <= r["n_dup_positions"] <= r["n_positions"]
        assert 0.0 <= r["dup_fraction"] <= 1.0
    # docs shorter than GRAM_WIDTH tokens are excluded, not zero-rowed
    assert all(r["n_positions"] >= 1 for r in rows)
