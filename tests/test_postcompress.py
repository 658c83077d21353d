"""Oracle + semantics checks for inverted-index compression sizing
(operators/postcompress.py)."""

from __future__ import annotations

import math

import pytest

from dic_a1_spark.operators import postcompress as pc
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(pc.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, pc.ORACLES[name], pc.QUERIES[name], SF_CORRECT, name)


def _code_bits(v: int) -> int:
    assert v >= 1
    return 4 * ((v.bit_length() + 2) // 3)


def test_compression_matches_python_reference(spark):
    from pyspark.sql import functions as F

    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    rows = (
        load_table(spark, SF_CORRECT, "documents")
        .select(
            "doc_id",
            F.array_distinct(tokens_nonempty(F.col("text"))).alias("toks"),
        )
        .collect()
    )
    postings: dict[str, list[int]] = {}
    for r in rows:
        for t in r["toks"]:
            postings.setdefault(t, []).append(r["doc_id"])
    exp = {}
    for t, ids in postings.items():
        ids.sort()
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        exp[t] = (
            len(ids),
            sum(_code_bits(g) for g in gaps),
            max(gaps),
        )
    got = {
        r["term"]: r for r in pc.index_compression(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(exp)
    for t, (df, cb, mg) in exp.items():
        r = got[t]
        assert r["df"] == df and r["code_bits"] == cb, t
        assert r["max_gap"] == mg and r["raw_bits"] == 64 * df, t
        assert math.isclose(r["ratio_r"], cb / (64 * df), abs_tol=5e-7)
    # Non-vacuity: both single-group and multi-group codes must occur.
    s = pc.index_compression_summary(spark, SF_CORRECT).first()
    assert 0 < s["one_group_gaps"] < s["n_postings"]
    assert s["code_bits"] < s["raw_bits"]  # the code must actually win
    assert s["n_postings"] == sum(v[0] for v in exp.values())
