"""Oracle + semantics checks for the Heaps-law vocabulary growth curve
(operators/vocabgrowth.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import vocabgrowth
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(vocabgrowth.ORACLES))
def test_matches_oracle(spark, name):
    compare(
        spark,
        vocabgrowth.ORACLES[name],
        vocabgrowth.QUERIES[name],
        SF_CORRECT,
        name,
    )


def test_curve_is_a_consistent_census(spark):
    """The curve must tile the corpus: doc counts sum to the corpus,
    token counts to the token total, the cumulative vocabulary is
    non-decreasing and ends at the exact distinct-word count, and every
    bin's new words are minted exactly once."""
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    rows = sorted(
        vocabgrowth.vocab_growth_curve(spark, SF_CORRECT).collect(),
        key=lambda r: r["bin"],
    )
    assert [r["bin"] for r in rows] == sorted({r["bin"] for r in rows})
    assert all(0 <= r["bin"] < vocabgrowth.GROWTH_BINS for r in rows)

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    n_docs_with_rows = len({r["doc_id"] for r in docs if len(r["toks"]) > 0})
    vocab = {t for r in docs for t in r["toks"]}
    n_tokens = sum(len(r["toks"]) for r in docs)

    assert sum(r["n_docs"] for r in rows) == n_docs_with_rows
    assert sum(r["n_tokens"] for r in rows) == n_tokens
    assert sum(r["n_new_words"] for r in rows) == len(vocab)
    cums = [r["vocab_cumulative"] for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == len(vocab)
