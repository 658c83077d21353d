"""Oracle + semantics checks for RAG context packing (operators/ragpack.py)."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import bm25, ragpack as rp
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(rp.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, rp.ORACLES[name], rp.QUERIES[name], SF_CORRECT, name)


def test_pack_is_prefix_of_retrieval_ranking(spark):
    """The packed set must be exactly the top-RAG_TOP_K prefix of the
    bm25 batch ranking, cum_tokens must be the running dl sum in rank
    order, and fits must be monotone (once over budget, never fits
    again — the prefix-cut rule)."""
    rows = rp.rag_context_pack(spark, SF_CORRECT).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    top = {}
    for r in bm25.bm25_batch_topk(spark, SF_CORRECT).collect():
        top.setdefault(r["query_id"], {})[r["rank"]] = r["doc_id"]
    for qid, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, rp.RAG_TOP_K + 1))
        # bm25_batch_topk publishes the first BM25_BATCH_K ranks — the
        # pack's head must agree with them doc-for-doc.
        for r in rs[: bm25.BM25_BATCH_K]:
            assert top[qid][r["rank"]] == r["doc_id"]
        cum = 0
        over = False
        for r in rs:
            cum += r["dl"]
            assert r["cum_tokens"] == cum
            assert r["fits"] == (cum <= rp.RAG_BUDGET)
            if over:
                assert not r["fits"], "fits flag not monotone"
            over = over or not r["fits"]


def test_summary_consistent_with_pack(spark):
    packs = rp.rag_context_pack(spark, SF_CORRECT).collect()
    summary = {
        r["query_id"]: r for r in rp.rag_pack_summary(spark, SF_CORRECT).collect()
    }
    for qid in {r["query_id"] for r in packs}:
        rs = [r for r in packs if r["query_id"] == qid]
        s = summary[qid]
        assert s["n_candidates"] == len(rs)
        assert s["n_packed"] == sum(1 for r in rs if r["fits"])
        assert s["tokens_packed"] == sum(r["dl"] for r in rs if r["fits"])
        assert s["tokens_packed"] <= rp.RAG_BUDGET
    # Non-vacuity: at least one query must overflow the budget.
    assert any(s["n_packed"] < s["n_candidates"] for s in summary.values())
