"""Oracle + semantics checks for winnowing fingerprints
(operators/winnow.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import winnow
from dic_a1_spark.plans.explain import count_exchanges
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare

SF_SMALL = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(winnow.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, winnow.ORACLES[name], winnow.QUERIES[name], SF_CORRECT, name)


def _python_winnow(toks: list[str]) -> set[tuple[int, int]]:
    """Plain-Python reference: (pos, h42) selections, rightmost-min per
    window, independent of the DataFrame pipeline."""
    from dic_a1_spark.functions.xxh64_sql import py_to_signed, py_xxh64_bytes

    k, w = winnow.WINNOW_K, winnow.WINNOW_W
    hs = [
        py_to_signed(py_xxh64_bytes(" ".join(toks[i : i + k]).encode()))
        % (1 << 42)
        for i in range(len(toks) - k + 1)
    ]
    out: set[tuple[int, int]] = set()
    for e in range(w - 1, len(hs)):
        window = hs[e - w + 1 : e + 1]
        m = min(window)
        # rightmost index achieving the min, 1-based gram position
        off = max(i for i, h in enumerate(window) if h == m)
        out.add((e - w + 1 + off + 1, m))
    return out


def test_selection_matches_python_reference(spark):
    """Ground-truth audit at sf0.001: recompute the fingerprint set per
    document in plain Python (including the rightmost-min tiebreak) and
    require exact equality."""
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    expected = {
        (r["doc_id"], pos, h)
        for r in docs
        if len(r["toks"]) >= winnow.WINNOW_K
        for pos, h in _python_winnow(r["toks"])
    }
    got = {
        (r["doc_id"], r["pos"], r["h"])
        for r in winnow.winnow_fingerprints(spark, SF_SMALL).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_every_full_window_is_covered(spark):
    """The winnowing guarantee's local form: every window of WINNOW_W
    consecutive k-gram positions contains at least one selected
    position."""
    fps = winnow.winnow_fingerprints(spark, SF_SMALL)
    sel = {
        (r["doc_id"], r["pos"])
        for r in fps.select("doc_id", "pos").collect()
    }
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    k, w = winnow.WINNOW_K, winnow.WINNOW_W
    for r in docs:
        n_pos = len(r["toks"]) - k + 1
        for start in range(1, n_pos - w + 2):
            assert any(
                (r["doc_id"], p) in sel for p in range(start, start + w)
            ), f"uncovered window at doc {r['doc_id']} start {start}"


def test_density_near_theoretical(spark):
    """Random 42-bit hashes ==> expected density 2/(W+1); the synthetic
    corpus should sit near it (repetition pushes it slightly down, never
    above ~1)."""
    row = winnow.winnow_stats(spark, SF_CORRECT).collect()[0]
    expected = 2.0 / (winnow.WINNOW_W + 1)
    assert 0.5 * expected <= row["density"] <= 1.5 * expected
    assert row["n_fingerprints"] <= row["n_grams"]


def test_fingerprints_single_exchange(spark):
    """Scale pin: the selection pass is one exchange (the doc_id window
    sort); the per-doc distinct reuses that partitioning."""
    df = winnow.winnow_fingerprints(spark, SF_CORRECT)
    assert count_exchanges(df) <= 1


def test_candidates_share_actual_fingerprints(spark):
    """Every reported pair must share >= n_shared distinct fingerprint
    keys in the materialized fingerprint sets (cross-check the join
    against the fingerprint query itself)."""
    fps = winnow.winnow_fingerprints(spark, SF_CORRECT)
    by_doc: dict[int, set[int]] = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    pairs = winnow.winnow_dup_candidates(spark, SF_CORRECT).collect()
    assert pairs, "candidate report must be non-vacuous at sf0.01"
    for r in pairs:
        shared = by_doc[r["doc1"]] & by_doc[r["doc2"]]
        assert len(shared) >= r["n_shared"] > 0
