"""Oracle + semantics checks for taxonomy labeling (operators/taxonomy.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import taxonomy as tx
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(tx.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, tx.ORACLES[name], tx.QUERIES[name], SF_CORRECT, name)


def _docs(spark):
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    return [
        (r["doc_id"], r["source"], list(r["toks"]))
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "source", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    ]


def _py_label(toks: list[str]):
    kw = {}
    for topic, k in tx.TOPIC_KEYWORDS:
        kw[k] = topic
    scores: dict[str, int] = {}
    for t in toks:
        topic = kw.get(t)
        if topic:
            scores[topic] = scores.get(topic, 0) + 1
    if not scores:
        return (tx.UNCLASSIFIED, 0, 0)
    topic, hits = min(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return (topic, hits, len(scores))


def test_doc_topics_match_python_reference(spark):
    docs = _docs(spark)
    exp = {d: _py_label(toks) for d, _, toks in docs}
    got = {
        r["doc_id"]: (r["topic"], r["hits"], r["n_topics"])
        for r in tx.taxonomy_doc_topics(spark, SF_CORRECT).collect()
    }
    assert got == exp
    labels = {v[0] for v in got.values()}
    assert len(labels) >= 3, f"labeling degenerated to {labels}"


def test_source_profile_shares_sum_to_one(spark):
    rows = tx.taxonomy_source_profile(spark, SF_CORRECT).collect()
    by_src: dict[str, float] = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0.0) + r["share_r"]
    for src, s in by_src.items():
        assert abs(s - 1.0) < 1e-4, (src, s)


def test_coverage_consistent_with_doc_labels(spark):
    docs = _docs(spark)
    kw = {k: t for t, k in tx.TOPIC_KEYWORDS}
    exp_any: dict[str, set] = {}
    exp_tf: dict[str, int] = {}
    for d, _, toks in docs:
        for t in toks:
            topic = kw.get(t)
            if topic:
                exp_any.setdefault(topic, set()).add(d)
                exp_tf[topic] = exp_tf.get(topic, 0) + 1
    exp_dom: dict[str, int] = {}
    for d, _, toks in docs:
        topic, _, _ = _py_label(toks)
        exp_dom[topic] = exp_dom.get(topic, 0) + 1
    got = {
        r["topic"]: r for r in tx.taxonomy_coverage(spark, SF_CORRECT).collect()
    }
    for topic in exp_any:
        assert got[topic]["n_docs_any"] == len(exp_any[topic])
        assert got[topic]["tf_total"] == exp_tf[topic]
        assert got[topic]["n_docs_dominant"] == exp_dom.get(topic, 0)
