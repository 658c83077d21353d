"""Oracle + semantics checks for PMI collocations (operators/colloc.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import colloc
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(colloc.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, colloc.ORACLES[name], colloc.QUERIES[name], SF_CORRECT, name)


def test_census_matches_python_reference(spark):
    """Recompute the windowed pair census in plain Python from the
    tokenized docs and require exact equality (canonical w1 <= w2,
    COLLOC_MIN_COUNT floor, per-doc doc counts)."""
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    w = colloc.COLLOC_W
    counts: dict[tuple[str, str], int] = {}
    docsets: dict[tuple[str, str], set[int]] = {}
    for r in docs:
        toks = r["toks"]
        for i in range(len(toks) - 1):
            for j in range(i + 1, min(i + w, len(toks) - 1) + 1):
                key = tuple(sorted((toks[i], toks[j])))
                counts[key] = counts.get(key, 0) + 1
                docsets.setdefault(key, set()).add(r["doc_id"])
    expected = {
        k: (c, len(docsets[k]))
        for k, c in counts.items()
        if c >= colloc.COLLOC_MIN_COUNT
    }
    got = {
        (r["w1"], r["w2"]): (r["n_pairs"], r["n_docs"])
        for r in colloc.colloc_pair_census(spark, SF_CORRECT).collect()
    }
    assert got == expected
    assert got, "census must be non-vacuous at sf0.01"


def test_topk_ranks_by_exact_lift(spark):
    """The top-K report must agree with a driver-side recomputation of
    the fixed-point lift from the census and unigram counts."""
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select(tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    uni: dict[str, int] = {}
    nw = 0
    for r in docs:
        for t in r["toks"]:
            uni[t] = uni.get(t, 0) + 1
            nw += 1
    census = colloc.colloc_pair_census(spark, SF_CORRECT).collect()
    w = colloc.COLLOC_W
    np_total = sum(
        sum(min(i + w, len(r["toks"]) - 1) - i for i in range(len(r["toks"]) - 1))
        for r in docs
    )
    scored = sorted(
        (
            (
                r["n_pairs"] * nw * nw * 100 // (uni[r["w1"]] * uni[r["w2"]] * np_total),
                r["n_pairs"],
                r["w1"],
                r["w2"],
            )
            for r in census
        ),
        key=lambda t: (-t[0], -t[1], t[2], t[3]),
    )
    expected = [
        (w1, w2, n, lift) for lift, n, w1, w2 in scored[: colloc.COLLOC_TOP_K]
    ]
    got = [
        (r["w1"], r["w2"], r["n_pairs"], r["lift_fp"])
        for r in colloc.colloc_pmi_topk(spark, SF_CORRECT).collect()
    ]
    assert got == expected
