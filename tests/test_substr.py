"""Oracle + semantics checks for cross-document exact-substring span
dedup (operators/substr.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import substr
from dic_a1_spark.plans.explain import formatted_plan
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(substr.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, substr.ORACLES[name], substr.QUERIES[name], SF_CORRECT, name)


def test_spans_nonvacuous_and_well_formed(spark):
    """Spans exist at sf0.01 (Q11 vacuity rule), every span covers at
    least one full window, and per-doc spans are disjoint AND
    non-adjacent (the interval merge is maximal: touching or
    overlapping spans would have merged)."""
    rows = substr.substr_dup_spans(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    w = substr.SUBSTR_WIDTH
    by_doc: dict[int, list] = {}
    for r in rows:
        assert r["span_end"] >= r["span_start"] + w - 1
        assert r["n_windows"] >= 1
        # n_windows stride-1 windows inside the span fit exactly
        assert r["n_windows"] <= r["span_end"] - r["span_start"] - w + 2
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for spans in by_doc.values():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert s2 > e1, "overlapping spans must merge"


@pytest.mark.parametrize("keepfirst", [False, True])
def test_spans_windows_truly_cross_document(spark, keepfirst):
    """Ground-truth audit, independent of the hashed pipeline: recompute
    the duplicated window positions in plain Python from the tokenized
    docs (minus each window's canonical first occurrence in keepfirst
    mode) and check the merged intervals match exactly."""
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    w = substr.SUBSTR_WIDTH
    docs = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    occ: dict[str, set[int]] = {}
    first: dict[str, tuple[int, int]] = {}
    per_doc_pos: dict[int, list[tuple[int, str]]] = {}
    for r in docs:
        toks = r["toks"]
        for i in range(len(toks) - w + 1):
            win = " ".join(toks[i : i + w])
            occ.setdefault(win, set()).add(r["doc_id"])
            key = (r["doc_id"], i + 1)
            if win not in first or key < first[win]:
                first[win] = key
            per_doc_pos.setdefault(r["doc_id"], []).append((i + 1, win))
    expected = set()
    for doc_id, poss in per_doc_pos.items():
        hit = sorted(
            p
            for p, win in poss
            if len(occ[win]) >= 2
            and not (keepfirst and first[win] == (doc_id, p))
        )
        if not hit:
            continue
        start, end, n = hit[0], hit[0] + w - 1, 1
        for p in hit[1:]:
            if p > end:
                expected.add((doc_id, start, end, n))
                start, end, n = p, p + w - 1, 1
            else:
                end, n = p + w - 1, n + 1
        expected.add((doc_id, start, end, n))
    fn = (
        substr.substr_dup_spans_keepfirst
        if keepfirst
        else substr.substr_dup_spans
    )
    got = {
        (r["doc_id"], r["span_start"], r["span_end"], r["n_windows"])
        for r in fn(spark, SF_CORRECT).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stats_consistent_with_spans(spark):
    st = substr.substr_dup_stats(spark, SF_CORRECT).collect()[0]
    assert 0 < st["n_dup_keys"] < st["n_distinct"]
    assert st["n_dup_occurrences"] >= 2 * st["n_dup_keys"]
    assert st["n_docs_affected"] >= 2
    assert 0.0 < st["dup_share"] < 1.0
    n_span_docs = (
        substr.substr_dup_spans(spark, SF_CORRECT)
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_span_docs == st["n_docs_affected"]


def test_hot_spans_ordering_and_threshold(spark):
    rows = substr.substr_hot_spans(spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= substr.HOT_K
    keys = [(-r["n_occurrences"], r["h"]) for r in rows]
    assert keys == sorted(keys)
    assert all(r["n_docs"] >= 2 for r in rows)
    assert all(r["n_occurrences"] >= r["n_docs"] for r in rows)


def test_scrub_consistent_with_spans(spark):
    """Every affected doc's removal count equals the summed length of its
    merged spans, and the kept text has exactly n_tokens - n_removed
    tokens (token order preserved is covered by the oracle's value
    hash — kept_text is order-sensitive)."""
    spans = substr.substr_dup_spans(spark, SF_CORRECT).collect()
    removed = {}
    for r in spans:
        removed[r["doc_id"]] = removed.get(r["doc_id"], 0) + (
            r["span_end"] - r["span_start"] + 1
        )
    rows = substr.substr_scrub_text(spark, SF_CORRECT).collect()
    assert {r["doc_id"] for r in rows} == set(removed)
    for r in rows:
        assert r["n_removed"] == removed[r["doc_id"]]
        n_kept = len(r["kept_text"].split()) if r["kept_text"] else 0
        assert n_kept == r["n_tokens"] - r["n_removed"]


def test_window_stream_is_map_only(spark):
    """The window/hash construction must reach the first aggregation
    without an exchange and without a Python UDF stage."""
    from dic_a1_spark.sources.readers import load_table

    d = load_table(spark, SF_CORRECT, "documents")
    plan = formatted_plan(substr._window_hashes(d))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
