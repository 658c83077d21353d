"""Oracle + semantics checks for content-defined chunking
(operators/cdc.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import cdc
from dic_a1_spark.plans.explain import count_exchanges
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare

SF_SMALL = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(cdc.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, cdc.ORACLES[name], cdc.QUERIES[name], SF_CORRECT, name)


def test_chunks_tile_every_document(spark):
    """Chunks must partition each document's token range exactly:
    contiguous, non-overlapping, starting at 1, ending at n_tokens."""
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    n_toks = {
        r["doc_id"]: r["n"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select(
            "doc_id", F.size(tokens_nonempty(F.col("text"))).alias("n")
        )
        .where(F.col("n") >= 1)
        .collect()
    }
    by_doc: dict[int, list] = {}
    for r in cdc.cdc_chunks(spark, SF_SMALL).collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_toks)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_start"])
        assert rows[0]["chunk_start"] == 1
        assert rows[-1]["chunk_end"] == n_toks[doc_id]
        for a, b in zip(rows, rows[1:]):
            assert b["chunk_start"] == a["chunk_end"] + 1
        for r in rows:
            assert r["n_tokens"] == r["chunk_end"] - r["chunk_start"] + 1


def _chunk_reference(toks: list[str]) -> set[tuple[int, int, int]]:
    """Plain-Python CDC reference: (chunk_start, chunk_end, n_tokens)
    intervals for one document's token list."""
    from dic_a1_spark.functions.xxh64_sql import py_to_signed, py_xxh64_bytes

    k, d = cdc.CDC_K, cdc.CDC_D
    if not toks:
        return set()
    bounds = [
        e
        for e in range(k, len(toks) + 1)
        if py_to_signed(py_xxh64_bytes(" ".join(toks[e - k : e]).encode()))
        % d
        == 0
    ]
    if not bounds or bounds[-1] != len(toks):
        bounds.append(len(toks))
    out, prev = set(), 0
    for b in bounds:
        out.add((prev + 1, b, b - prev))
        prev = b
    return out


def test_boundaries_are_content_defined(spark):
    """The CDC property: recompute boundaries in plain Python from the
    window-hash rule and require the exact same chunk intervals."""
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    expected = {
        (r["doc_id"], s, e)
        for r in docs
        for (s, e, _n) in _chunk_reference(list(r["toks"]))
    }
    got = {
        (r["doc_id"], r["chunk_start"], r["chunk_end"])
        for r in cdc.cdc_chunks(spark, SF_SMALL).collect()
    }
    assert got == expected


def test_chunking_is_zero_exchange(spark):
    """Scale pin: chunk construction is entirely map-side — the corpus
    chunks at scan speed."""
    assert count_exchanges(cdc.cdc_chunks(spark, SF_CORRECT)) == 0


def test_dup_census_consistent_with_chunks(spark):
    """Every census row must match a driver-side regroup of the chunk
    table, and the report must be non-vacuous at sf0.01 (the corpus has
    repeated passages)."""
    agg: dict[int, list[int]] = {}
    for r in cdc.cdc_chunks(spark, SF_CORRECT).collect():
        a = agg.setdefault(r["chunk_hash"], [0, 0, set()])
        a[0] += 1
        a[1] = max(a[1], r["n_tokens"])
        a[2].add(r["doc_id"])
    rows = cdc.cdc_dup_chunks(spark, SF_CORRECT).collect()
    assert rows, "duplicate-chunk census must be non-vacuous at sf0.01"
    expected = {
        h: (v[1], v[0], int(len(v[2]) > 1))
        for h, v in agg.items()
        if v[0] >= 2
    }
    got = {
        r["chunk_hash"]: (r["n_tokens"], r["n_occurrences"], r["cross_doc"])
        for r in rows
    }
    assert got == expected
