"""Oracle + semantics checks for lexical diversity (operators/diversity.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import diversity as dv
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(dv.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, dv.ORACLES[name], dv.QUERIES[name], SF_CORRECT, name)


def _by_source(spark):
    from dic_a1_spark.functions.text import tokens_nonempty
    from dic_a1_spark.sources.readers import load_table

    rows = (
        load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", "source", tokens_nonempty(F.col("text")).alias("toks"))
        .collect()
    )
    by_src: dict[str, list[tuple[int, list[str]]]] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["doc_id"], list(r["toks"])))
    return by_src


def test_simpson_matches_python_reference(spark):
    by_src = _by_source(spark)
    got = {
        r["source"]: r for r in dv.diversity_simpson(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(by_src)
    for src, docs in by_src.items():
        census: dict[str, int] = {}
        for _, toks in docs:
            for t in toks:
                census[t] = census.get(t, 0) + 1
        c = sum(census.values())
        ss = sum(v * v for v in census.values())
        r = got[src]
        assert r["c_tokens"] == c
        assert r["vocab"] == len(census)
        assert r["sum_sq"] == ss
        assert math.isclose(r["simpson_r"], 1.0 - ss / (c * c), abs_tol=5e-7)
        assert math.isclose(r["eff_vocab_r"], (c * c) / ss, abs_tol=5e-5)


def test_distinct_ngrams_match_python_reference(spark):
    by_src = _by_source(spark)
    got = {
        r["source"]: r
        for r in dv.diversity_distinct_ngrams(spark, SF_CORRECT).collect()
    }
    for src, docs in by_src.items():
        for n in (1, 2, 3):
            total = 0
            seen: set[tuple[str, ...]] = set()
            for _, toks in docs:
                for i in range(len(toks) - n + 1):
                    total += 1
                    seen.add(tuple(toks[i : i + n]))
            r = got[src]
            assert r[f"total_{n}"] == total, (src, n)
            assert r[f"distinct_{n}"] == len(seen), (src, n)
            assert math.isclose(
                r[f"ratio_{n}"], len(seen) / total, abs_tol=5e-7
            )


def test_cross_doc_bigrams_match_python_reference(spark):
    by_src = _by_source(spark)
    got = {
        r["source"]: r
        for r in dv.diversity_cross_doc_bigrams(spark, SF_CORRECT).collect()
    }
    for src, docs in by_src.items():
        df: dict[tuple[str, str], int] = {}
        for _, toks in docs:
            for b in {
                (toks[i], toks[i + 1]) for i in range(len(toks) - 1)
            }:
                df[b] = df.get(b, 0) + 1
        rep = sum(1 for v in df.values() if v >= 2)
        r = got[src]
        assert r["distinct_bigrams"] == len(df)
        assert r["repeated_bigrams"] == rep
    # Non-vacuity: both repeated and non-repeated bigrams must exist.
    assert any(r["repeated_bigrams"] > 0 for r in got.values())
    assert any(
        r["repeated_bigrams"] < r["distinct_bigrams"] for r in got.values()
    )


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    """A corpus where source 'tiny' has only sub-trigram docs and
    source 'void' only empty/whitespace docs — the panel must keep
    BOTH visible with zero counts and null ratios (ADVICE: the inner
    join silently dropped exactly the degenerate sources)."""
    import shutil
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dic_a1_spark.config import TABLES

    out = tmp_path_factory.mktemp("degen_sf")
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copy(Path(SF_CORRECT) / f"{t}.parquet", out / f"{t}.parquet")
    rows = [
        (0, "the fast join merges the fast scan rows", "en", "ok"),
        (1, "dup dup window vector hash key", "en", "ok"),
        (2, "one two", "en", "tiny"),
        (3, "solo", "en", "tiny"),
        (4, "pair here", "en", "tiny"),
        (5, "", "en", "void"),
        (6, "   ", "en", "void"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")
    return str(out)


def test_degenerate_sources_stay_visible(spark, degenerate_dir):
    got = {
        r["source"]: r
        for r in dv.diversity_distinct_ngrams(spark, degenerate_dir).collect()
    }
    assert set(got) == {"ok", "tiny", "void"}
    tiny = got["tiny"]
    assert tiny["n_docs"] == 3
    assert tiny["total_3"] == 0 and tiny["distinct_3"] == 0
    assert tiny["ratio_3"] is None
    assert tiny["total_1"] == 5 and tiny["ratio_1"] is not None
    void = got["void"]
    assert void["n_docs"] == 2
    for n in (1, 2, 3):
        assert void[f"total_{n}"] == 0 and void[f"distinct_{n}"] == 0
        assert void[f"ratio_{n}"] is None


def test_degenerate_corpus_matches_oracle(spark, degenerate_dir):
    compare(
        spark,
        dv.ORACLES["diversity_distinct_ngrams"],
        dv.QUERIES["diversity_distinct_ngrams"],
        degenerate_dir,
        "diversity_distinct_ngrams",
    )
