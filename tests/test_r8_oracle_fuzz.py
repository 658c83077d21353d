"""Cross-engine oracle parity for the round-8 operators on ADVERSARIAL
inputs. Documents-based operators (tokapply, repselect) reuse the
hostile text recipe from test_r7_oracle_fuzz (tokenizer-translate
punctuation, unicode whitespace, `<`/`>` survivors, empty and one-token
docs, repeated runs); the embeddings-based embdecontam gets a planted
corpus: exact duplicates STRADDLING the %MOD benchmark boundary (the
case the driver corpus lacks — its dup clusters never cross it),
near-threshold sims, an all-zeros vector (0/0 cosine — ships as NULL
via pandas->Arrow on the Spark side, NULL from DuckDB's division by
zero; NULL ranks LAST under DESC in both engines, the r9 finding
pinned exhaustively in test_r9_oracle_fuzz), and sign-flipped vectors
(negative sims)."""

from __future__ import annotations

import math
import random
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dic_a1_spark.config import TABLES, TOKEN_CHARS
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare

_VOCAB = [
    "dup", "join", "vector", "window", "hash", "key", "scan", "filter",
    "merge", "stream", "batch", "table", "row", "the", "fast",
]
_HOSTILE = [
    "<tag>", "a<b", "x>y", "", " ", " ", " ",
    "word.with,punct!", "(paren)", "tab\there", "'quoted'", "1234",
    "mixed5tokens6here",
]


def _fuzz_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(0, 40)):
        r = rng.random()
        if r < 0.55:
            parts.append(rng.choice(_VOCAB))
        elif r < 0.8:
            parts.append(rng.choice(_HOSTILE))
        else:
            parts.append(rng.choice(_VOCAB) * rng.randint(1, 3))
        parts.append(rng.choice([" ", "  ", "\t", " ", "  "]))
    return "".join(parts)


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("fuzz_sf_r8")
    for t in TABLES:
        if t in ("documents", "embeddings"):
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", out / f"{t}.parquet")

    rng = random.Random(0xF08)
    texts = [_fuzz_text(rng) for _ in range(200)]
    texts += ["", "dup", TOKEN_CHARS, "< > <tag> dup dup dup"]
    # Exact duplicate texts so repselect has multi-doc groups whose
    # best-quality member is NOT always the lowest id.
    texts += ["dup join fast", "dup join fast", "dup join fast"]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(
                [rng.choice(["en", "de", "zh"]) for _ in texts], pa.string()
            ),
            "source": pa.array(
                [f"fz{rng.randint(0, 7)}" for _ in texts], pa.string()
            ),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, out / "documents.parquet")

    # Planted embedding corpus (ids 0..N-1, dim 16).
    nprng = np.random.RandomState(0xF08)
    n, dim = 400, 16
    V = nprng.randn(n, dim).astype(np.float32)
    # exact duplicates straddling the benchmark boundary (97 | 194 | 291)
    V[101] = V[97]          # train dup of bench 97
    V[200] = V[194]         # train dup of bench 194
    V[292] = -V[291]        # sign-flip: sim exactly -1 (never flagged)
    # near-threshold pair: bench 0 vs a train vector at ~0.4 cosine
    a = V[0].astype(np.float64)
    b = nprng.randn(dim)
    b -= (b @ a) / (a @ a) * a  # orthogonalize
    mix = 0.4 * a / np.linalg.norm(a) + math.sqrt(1 - 0.16) * b / np.linalg.norm(b)
    V[5] = mix.astype(np.float32)
    V[7] = np.zeros(dim, dtype=np.float32)  # NaN cosine row
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in V],
                pa.list_(pa.float32()),
            ),
            "label": pa.array([int(i % 7) for i in range(n)], pa.int64()),
        }
    )
    pq.write_table(tbl, out / "embeddings.parquet")
    return str(out)


_R8_QUERIES = [
    ("tokapply", "bpe_corpus_token_counts"),
    ("tokapply", "bpe_corpus_compression"),
    ("repselect", "repselect_best_of_group"),
    ("repselect", "repselect_gain"),
    ("embdecontam", "embdecontam_flagged"),
    ("embdecontam", "embdecontam_summary"),
    ("similarity", "embedding_neardup_blocked_fast"),
    ("similarity", "embedding_neardup_groups"),
]


@pytest.mark.parametrize("mod_name,query", _R8_QUERIES)
def test_r8_oracle_parity_on_hostile_corpus(spark, fuzz_dir, mod_name, query):
    import importlib

    mod = importlib.import_module(f"dic_a1_spark.operators.{mod_name}")
    compare(spark, mod.ORACLES[query], mod.QUERIES[query], fuzz_dir, query)


def test_planted_contamination_is_found(spark, fuzz_dir):
    """The planted cross-boundary duplicates must be flagged; the
    sign-flipped planted pair must not."""
    from dic_a1_spark.operators import embdecontam as ed

    got = {
        (r["vec_id"], r["bench_id"])
        for r in ed.embdecontam_flagged(spark, fuzz_dir).collect()
    }
    assert (101, 97) in got
    assert (200, 194) in got
    assert (292, 291) not in got


def test_fuzz_corpus_not_vacuous_for_repselect(spark, fuzz_dir):
    from dic_a1_spark.operators import repselect as rs

    rows = rs.repselect_best_of_group(spark, fuzz_dir).collect()
    assert any(r["n_docs"] >= 2 for r in rows)
    g = rs.repselect_gain(spark, fuzz_dir).first()
    assert g["docs_removed"] > 0
