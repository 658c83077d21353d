"""Oracle + semantics checks for corpus LM statistics (operators/lm.py)."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import lm
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare

SF_SMALL = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(lm.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, lm.ORACLES[name], lm.QUERIES[name], SF_CORRECT, name)


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_CORRECT])
def test_decile_census_is_a_partition(spark, sf_dir):
    """Deciles 1..10 present, sizes differ by at most 1, the avg-bits
    ranges are non-overlapping and ordered, and doc counts add up to the
    number of scored documents."""
    rows = sorted(
        lm.ppl_decile_census(spark, sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, lm.PPL_BUCKETS + 1))
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    from dic_a1_spark.operators.corpusops import text_unigram_surprisal

    assert sum(sizes) == text_unigram_surprisal(spark, sf_dir).count()
    for lo, hi in zip(rows, rows[1:]):
        assert lo["min_avg_bits"] <= lo["max_avg_bits"]
        assert lo["max_avg_bits"] <= hi["min_avg_bits"]


def test_bigram_rarer_than_unigram(spark):
    """Order-2 events are rarer than order-1 events, so the mean bigram
    surprisal must exceed the mean unigram surprisal."""
    from dic_a1_spark.operators.corpusops import text_unigram_surprisal

    bi = lm.text_bigram_surprisal(spark, SF_CORRECT).collect()
    un = text_unigram_surprisal(spark, SF_CORRECT).collect()
    mean_bi = sum(r["avg_bits"] for r in bi) / len(bi)
    mean_un = sum(r["avg_bits"] for r in un) / len(un)
    assert mean_bi > mean_un


def test_by_source_totals_match_per_doc(spark):
    """The source rollup must re-aggregate the certified per-doc frame
    exactly (cross-check against a driver-side regroup)."""
    from dic_a1_spark.operators.corpusops import text_unigram_surprisal
    from dic_a1_spark.sources.readers import load_table

    src = {
        r["doc_id"]: r["source"]
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "source")
        .collect()
    }
    per_doc = text_unigram_surprisal(spark, SF_CORRECT).collect()
    agg: dict[str, list[int]] = {}
    for r in per_doc:
        a = agg.setdefault(src[r["doc_id"]], [0, 0, 0])
        a[0] += 1
        a[1] += r["n_tokens"]
        a[2] += r["total_bits"]
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"], r["total_bits"])
        for r in lm.lm_crossentropy_by_source(spark, SF_CORRECT).collect()
    }
    assert got == {k: tuple(v) for k, v in agg.items()}
