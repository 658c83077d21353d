"""Full-registry cross-engine sweep on a DEGENERATE corpus — the ANSI
crash hunt.

The round-9 zero-norm fuzz proved a whole bug class exists: Spark 4
runs ANSI mode by default, so a raw Column division whose denominator
can reach zero does not fork from the oracle — it THROWS and kills the
job, while DuckDB quietly returns NULL. The embedding family was fixed
with try_divide; this sweep points the same weapon at every other
registered query by running the ENTIRE oracle-gated registry over a
corpus built from the degenerate shapes that zero denominators come
from:

- documents: empty and whitespace-only texts (0 tokens -> per-doc
  ratios), a source with exactly ONE doc (sample-variance cnt-1 = 0),
  a source whose docs all have IDENTICAL length (variance = 0 ->
  z-score division by sqrt(0)), and an all-identical-token doc.
- events: one single event for an entire type, constant values within
  groups (variance 0), one (dow, hour) cell with a single sample.
- embeddings: zero vectors and identical constant vectors (handled by
  the r9 try_divide fix — kept here so the sweep covers the whole
  corpus at once).

TPC-H tables are copied intact from sf0.001 (referential integrity);
the relational families run as no-op consistency checks.

Every query must either match its oracle or — for the rows-only
entries — simply materialize. A SparkArithmeticException anywhere in
this sweep is a real 100 TB incident: a single all-empty document
shard would kill the whole job.
"""

from __future__ import annotations

import importlib
import shutil
from datetime import datetime, timedelta
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dic_a1_spark.config import TABLES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare


@pytest.fixture(scope="module")
def degen_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("degen_sf")
    for t in TABLES:
        if t in ("documents", "events", "embeddings"):
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", Path(out) / f"{t}.parquet")

    # --- documents -------------------------------------------------------
    texts, langs, sources = [], [], []

    def add(text: str, lang: str, source: str) -> None:
        texts.append(text)
        langs.append(lang)
        sources.append(source)

    for _ in range(6):
        add("", "en", "empty_src")          # 0 tokens
    for _ in range(4):
        add("   \t  ", "de", "empty_src")   # whitespace only
    add("solo doc with a few tokens", "en", "lonely_src")  # cnt-1 == 0
    for i in range(8):
        add(f"word{i} fixed length here", "en", "const_src")  # var == 0
    for _ in range(3):
        add("x x x x x x x x", "zh", "const_src")  # one repeated token
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, Path(out) / "documents.parquet")

    # --- events ----------------------------------------------------------
    t0 = datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (t0, 1, "solo_type", 7.25),                       # single event of its type
        (t0 + timedelta(hours=1), 2, "const", 3.5),       # constant values
        (t0 + timedelta(hours=2), 2, "const", 3.5),
        (t0 + timedelta(hours=3), 3, "const", 3.5),
        (t0 + timedelta(days=7), 3, "const", 3.5),        # same dow/hour, next week
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, Path(out) / "events.parquet")

    # --- embeddings ------------------------------------------------------
    n, dim = 80, 64
    vecs = []
    for i in range(n):
        if i % 3 == 0:
            vecs.append([0.0] * dim)                       # zero-norm
        else:
            vecs.append([1.0 if d % 2 else -1.0 for d in range(dim)])  # identical
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
            "label": pa.array([i % 4 for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(tbl, Path(out) / "embeddings.parquet")
    return str(out)


@pytest.fixture(scope="module")
def nulls_dir(tmp_path_factory):
    """Second hostile shape: NULL-bearing columns. The r8 fuzz already
    proved NULL propagation is a real fork source (DuckDB's
    array_to_string([]) vs Spark's concat_ws); this corpus plants NULLs
    in every nullable documents/events column the parquet schema allows
    — NULL text (tokenizers must propagate, not crash), NULL lang and
    source (grouping keys: both engines group NULLs together), NULL
    n_chars (aggregates skip), and NULL event value (sums/percentiles
    skip). Embeddings stay healthy: a NULL embedding ARRAY is out of
    contract (the schema is finite float32 — similarity._null_div), so
    it is deliberately not planted."""
    out = tmp_path_factory.mktemp("nulls_sf")
    for t in TABLES:
        if t in ("documents", "events"):
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", Path(out) / f"{t}.parquet")

    texts = [
        "normal doc alpha beta",
        None,                       # NULL text
        "second normal doc gamma",
        None,
        "shared vocab alpha",
    ]
    langs = ["en", None, "de", "en", None]          # NULL group keys
    sources = ["s0", "s0", None, None, "s1"]
    n_chars = [len(t) if t is not None else None for t in texts]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array(n_chars, pa.int64()),
        }
    )
    pq.write_table(tbl, Path(out) / "documents.parquet")

    t0 = datetime(2024, 6, 1, 12, 0, 0)
    rows = [
        (t0, 1, "click", 1.25, '{"k": 1}'),
        (t0 + timedelta(minutes=5), 1, "purchase", None, '{"k": 2}'),  # NULL value
        (t0 + timedelta(minutes=9), 2, "click", 2.5, None),            # NULL props
        (t0 + timedelta(minutes=15), 2, "error", None, '{"k": 3}'),
        (t0 + timedelta(hours=1), 3, "click", 3.75, '{"k": 4}'),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[0] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([r[3] for r in rows], pa.float64()),
            "props": pa.array([r[4] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, Path(out) / "events.parquet")
    return str(out)


def _registry():
    reg = importlib.import_module("dic_a1_spark.registry")
    return reg.all_queries(), reg.all_oracles()


_QUERIES, _ORACLES = _registry()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_registry_survives_degenerate_corpus(spark, degen_dir, name):
    fn = _QUERIES[name]
    if name in _ORACLES:
        compare(spark, _ORACLES[name], fn, degen_dir, name)
    else:
        fn(spark, degen_dir).count()  # rows-only: must materialize


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_registry_survives_null_corpus(spark, nulls_dir, name):
    fn = _QUERIES[name]
    if name in _ORACLES:
        compare(spark, _ORACLES[name], fn, nulls_dir, name)
    else:
        fn(spark, nulls_dir).count()  # rows-only: must materialize
