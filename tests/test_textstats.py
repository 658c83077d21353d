from __future__ import annotations

import pytest

from dic_a1_spark.operators import textstats
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(textstats.QUERIES))
def test_textstats_oracle(spark, name):
    compare(spark, textstats.ORACLES[name], textstats.QUERIES[name], SF_CORRECT, name)


def test_lang_confusion_matrix_sums_and_diagonal(spark):
    from dic_a1_spark.operators.textstats import (
        lang_confusion_matrix,
        text_lang_id,
    )

    cells = lang_confusion_matrix(spark, SF_CORRECT).collect()
    pred = text_lang_id(spark, SF_CORRECT).collect()
    assert sum(r["n_docs"] for r in cells) == len(pred)
    for r in cells:
        assert r["correct"] == (r["labeled_lang"] == r["predicted_lang"])
    # non-vacuous: the matrix has both diagonal and off-diagonal mass
    assert any(r["correct"] for r in cells)
    assert any(not r["correct"] for r in cells)


def test_lang_fertility_consistent_with_corpus(spark):
    from dic_a1_spark.operators.textstats import lang_token_fertility
    from dic_a1_spark.sources.readers import load_table

    rows = lang_token_fertility(spark, SF_CORRECT).collect()
    d = load_table(spark, SF_CORRECT, "documents")
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        assert r["chars_per_token"] > 1.0  # tokens are >=1 char + separator mass
        assert r["total_chars"] >= r["total_tokens"]
