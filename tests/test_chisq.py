from __future__ import annotations

import pytest

from dic_a1_spark.operators import chisq
from tests.conftest import SF_CORRECT, SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(chisq.QUERIES))
def test_chisq_oracle_smoke(spark, name):
    compare(spark, chisq.ORACLES[name], chisq.QUERIES[name], SF_SMOKE, name)


@pytest.mark.parametrize("name", ["chisq_top75", "chisq_vocab_union"])
def test_chisq_oracle_sf001(spark, name):
    compare(spark, chisq.ORACLES[name], chisq.QUERIES[name], SF_CORRECT, name)


def test_topk_rank_bounds(spark):
    df = chisq.QUERIES["chisq_top75"](spark, SF_SMOKE)
    rows = df.collect()
    per_cat = {}
    for r in rows:
        per_cat.setdefault(r["category"], []).append(r["rank"])
    for cat, ranks in per_cat.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)), cat
        assert len(ranks) <= 75


def test_golden_line_format(spark):
    topk = chisq.QUERIES["chisq_top75"](spark, SF_SMOKE).collect()
    vocab = [r["word"] for r in chisq.QUERIES["chisq_vocab_union"](spark, SF_SMOKE).collect()]
    lines = chisq.format_golden_lines(topk, vocab)
    assert lines[-1].startswith("[") and lines[-1].endswith("]")
    for line in lines[:-1]:
        cat, payload = line.split("\t", 1)
        assert payload.startswith("{'") or payload == "{}"
