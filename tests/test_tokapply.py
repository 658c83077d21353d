"""Oracle + semantics checks for corpus BPE application
(operators/tokapply.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import tokapply as ta
from dic_a1_spark.operators import bpe
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(ta.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, ta.ORACLES[name], ta.QUERIES[name], SF_CORRECT, name)


def test_token_counts_match_python_reference(spark):
    """Recompute per-source budgets from the segmented vocab + raw
    tokens in plain Python."""
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    seg = {
        r["word"]: r["n_pieces"]
        for r in bpe.bpe_segmented_vocab(spark, SF_CORRECT).collect()
    }
    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("source", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    exp: dict[str, dict[str, int]] = {}
    types: dict[str, set] = {}
    for r in docs:
        s = exp.setdefault(
            r["source"],
            {"word_tokens": 0, "subword_tokens": 0, "unseg_tokens": 0},
        )
        tset = types.setdefault(r["source"], set())
        for w in r["toks"]:
            s["word_tokens"] += 1
            tset.add(w)
            if w in seg:
                s["subword_tokens"] += seg[w]
            else:
                s["unseg_tokens"] += 1
    got = {
        r["source"]: r
        for r in ta.bpe_corpus_token_counts(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(exp)
    for src, e in exp.items():
        g = got[src]
        assert g["word_tokens"] == e["word_tokens"]
        assert g["word_types"] == len(types[src])
        assert g["subword_tokens"] == e["subword_tokens"]
        assert g["unseg_tokens"] == e["unseg_tokens"]
        denom = e["word_tokens"] - e["unseg_tokens"]
        if denom:
            assert math.isclose(
                g["pieces_per_word_r"], e["subword_tokens"] / denom,
                abs_tol=5e-7,
            )
    # Non-vacuity: the corpus must actually be segmentable, and pieces
    # per word must exceed 1 (merges do not recreate whole words at 6
    # rounds on a real corpus).
    total_sub = sum(e["subword_tokens"] for e in exp.values())
    total_seg = sum(
        e["word_tokens"] - e["unseg_tokens"] for e in exp.values()
    )
    assert total_sub > total_seg > 0


def test_compression_consistent_with_counts(spark):
    row = ta.bpe_corpus_compression(spark, SF_CORRECT).first()
    counts = ta.bpe_corpus_token_counts(spark, SF_CORRECT).collect()
    assert row["seg_word_tokens"] == sum(
        r["word_tokens"] - r["unseg_tokens"] for r in counts
    )
    assert row["subword_tokens"] == sum(r["subword_tokens"] for r in counts)
    assert row["chars_per_piece_r"] > 1.0  # pieces shorter than words
    assert row["pieces_per_word_r"] > 1.0
