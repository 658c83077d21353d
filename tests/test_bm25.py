"""Oracle + semantics checks for BM25 retrieval (operators/bm25.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import bm25
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(bm25.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, bm25.ORACLES[name], bm25.QUERIES[name], SF_CORRECT, name)


def _py_scores(docs, terms):
    """Plain-Python BM25 over pre-tokenized docs, same staircase idf and
    sorted-fold summation as the operator."""
    n_docs = len(docs)
    total_dl = sum(len(t) for _, t in docs)
    avgdl = total_dl / n_docs
    df = {
        t: sum(1 for _, toks in docs if t in toks)
        for t in terms
    }
    idf = {t: len(bin(n_docs // df[t])) - 2 for t in terms if df[t] > 0}
    out = {}
    for doc_id, toks in docs:
        contribs = []
        for t in terms:
            tf = toks.count(t)
            if tf == 0 or t not in idf:
                continue
            contribs.append(
                idf[t]
                * (tf * (bm25.BM25_K1 + 1.0))
                / (
                    tf
                    + bm25.BM25_K1
                    * (1.0 - bm25.BM25_B + bm25.BM25_B * len(toks) / avgdl)
                )
            )
        if contribs:
            s = 0.0
            for c in sorted(contribs):
                s += c
            out[doc_id] = (len(contribs), s)
    return out


def _tokenized(spark):
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    rows = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    return [(r["doc_id"], list(r["toks"])) for r in rows]


def test_topk_matches_python_reference(spark):
    """The operator's top-K must equal a plain-Python BM25 run on the
    identically tokenized corpus — same staircase idf, same sorted-fold
    summation, same (score desc, doc_id) total order."""
    docs = _tokenized(spark)
    py = _py_scores(docs, bm25.BM25_QUERY)
    ranked = sorted(py.items(), key=lambda kv: (-kv[1][1], kv[0]))
    expected = [
        (rank + 1, doc_id, n_hits)
        for rank, (doc_id, (n_hits, _)) in enumerate(ranked[: bm25.BM25_TOP_K])
    ]
    got_rows = bm25.bm25_topk(spark, SF_CORRECT).collect()
    got = [(r["rank"], r["doc_id"], r["n_hit_terms"]) for r in got_rows]
    assert got == expected
    # Scores within the round-trip quantum of the unrounded reference
    # (never compare to Python round(): banker's vs HALF_UP).
    for r in got_rows:
        ref = py[r["doc_id"]][1]
        assert math.isclose(r["score_r"], ref, abs_tol=5e-5), (
            r["doc_id"],
            r["score_r"],
            ref,
        )
    assert len(got) == bm25.BM25_TOP_K, "top-k must be fully populated"


def test_rare_term_outranks_viral_terms(spark):
    """Non-vacuity of the idf staircase on this corpus: the rare 'dup'
    term (df ~5%) must carry a strictly higher idf weight than every
    viral term, and documents containing it must fill the top ranks."""
    stats = {
        r["term"]: (r["df"], r["idf_w"])
        for r in bm25.bm25_term_stats(spark, SF_CORRECT).collect()
    }
    assert set(stats) == set(bm25.BM25_QUERY)
    rare_df, rare_idf = stats["dup"]
    for t, (df, idf) in stats.items():
        if t != "dup":
            assert df > rare_df
            assert idf < rare_idf
    docs = _tokenized(spark)
    with_dup = {d for d, toks in docs if "dup" in toks}
    top = [
        r["doc_id"]
        for r in bm25.bm25_topk(spark, SF_CORRECT).collect()
        if r["rank"] <= 5
    ]
    assert all(d in with_dup for d in top), (
        "rare-term docs must dominate the head of the ranking"
    )


def test_batch_topk_is_per_query(spark):
    """Every batch query contributes exactly BM25_BATCH_K ranked rows
    with ranks 1..K, and each per-query ranking matches the Python
    reference."""
    docs = _tokenized(spark)
    rows = bm25.bm25_batch_topk(spark, SF_CORRECT).collect()
    by_q: dict[str, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {qid for qid, _ in bm25.BM25_BATCH}
    for qid, terms in bm25.BM25_BATCH:
        got = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["rank"] for r in got] == list(
            range(1, bm25.BM25_BATCH_K + 1)
        )
        py = _py_scores(docs, terms)
        ranked = sorted(py.items(), key=lambda kv: (-kv[1][1], kv[0]))
        assert [r["doc_id"] for r in got] == [
            d for d, _ in ranked[: bm25.BM25_BATCH_K]
        ]


def test_batch_exchange_count_constant_in_fanout(spark):
    """The r8 tagged-fold refactor's contract: batch scoring pays ONE
    corpus fold regardless of how many queries are in the batch (the r7
    shape paid B corpus shuffles — 13 exchanges at B=3). Plan-only
    audit: a 4x larger batch must compile to EXACTLY the same number of
    shuffle exchanges."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dic_a1_spark.operators.bm25 import BM25_BATCH, _scored_batch
    from dic_a1_spark.plans.explain import plan_audit
    from dic_a1_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    vocab = ["dup", "hash", "key", "scan", "filter", "merge", "stream",
             "batch", "window", "join", "vector", "table"]
    big = tuple(
        (f"q{i:02d}", tuple(vocab[(i + j) % len(vocab)] for j in range(3)))
        for i in range(12)
    )

    def topk_plan(batch):
        docs = load_table(spark, SF_SMOKE, "documents")
        allq = _scored_batch(docs, batch)
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            allq.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .where(F.col("rank") <= 5)
        )

    small = plan_audit(topk_plan(BM25_BATCH))["exchanges"]
    large = plan_audit(topk_plan(big))["exchanges"]
    assert small == large, (
        f"batch exchanges grew with fan-out: {small} (B=3) vs {large} (B=12)"
        " — the per-query corpus-fold shape is back"
    )
    assert small <= 5
