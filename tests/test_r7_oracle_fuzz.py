"""Cross-engine oracle parity for the round-7 operators on an
ADVERSARIAL corpus: random documents mixing real vocabulary (so BM25 /
taxonomy / qlinear hits exist), tokenizer-translate punctuation, unicode
whitespace, `<`/`>` survivors (SURVEY.md P3), empty and one-token
documents, and repeated-run words. The driver corpus is too clean to
exercise these paths; parity must hold on hostile text too, so every
query below runs through the SAME oracle gate (tests/oracle_utils) on a
synthetic sf-dir whose other tables are borrowed from sf0.001."""

from __future__ import annotations

import random
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dic_a1_spark.config import TABLES, TOKEN_CHARS
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare

# Words the round-7 operators key on (BM25 queries, taxonomy keywords,
# qlinear weights) plus hostile fragments.
_VOCAB = [
    "dup", "join", "vector", "window", "hash", "key", "scan", "filter",
    "merge", "stream", "batch", "table", "row", "the", "fast",
]
_HOSTILE = [
    "<tag>", "a<b", "x>y", "", " ", " ", " ",
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
        parts.append(rng.choice([" ", "  ", "\t", " ", "  "]))
    return "".join(parts)


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("fuzz_sf")
    for t in TABLES:
        if t == "documents":
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", out / f"{t}.parquet")
    rng = random.Random(0xF022)
    texts = [_fuzz_text(rng) for _ in range(220)]
    texts += ["", "dup", TOKEN_CHARS, "< > <tag> dup dup dup"]
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
    return str(out)


# Every round-7 documents-based oracle family, one representative each
# (the full registry fuzz would re-run the whole sweep; these are the
# operators whose logic is NEW this round).
_R7_QUERIES = [
    ("bm25", "bm25_topk"),
    ("bm25", "bm25_batch_topk"),
    ("bpe", "bpe_merges"),
    ("bpe", "bpe_segmented_vocab"),
    ("diversity", "diversity_simpson"),
    ("diversity", "diversity_cross_doc_bigrams"),
    ("taxonomy", "taxonomy_doc_topics"),
    ("qlinear", "qlin_doc_scores"),
    ("ragpack", "rag_context_pack"),
    ("postings", "index_postings"),
    ("provenance", "source_overlap_matrix"),
]


@pytest.mark.parametrize("mod_name,query", _R7_QUERIES)
def test_r7_oracle_parity_on_hostile_corpus(spark, fuzz_dir, mod_name, query):
    import importlib

    mod = importlib.import_module(f"dic_a1_spark.operators.{mod_name}")
    compare(spark, mod.ORACLES[query], mod.QUERIES[query], fuzz_dir, query)


def test_fuzz_corpus_is_not_vacuous(spark, fuzz_dir):
    """The fuzz corpus must actually produce hits for the keyed
    operators — otherwise the parity above is trivially empty-vs-empty."""
    from dic_a1_spark.operators import bm25, qlinear, taxonomy

    assert bm25.bm25_topk(spark, fuzz_dir).count() > 0
    labels = {
        r["topic"]
        for r in taxonomy.taxonomy_doc_topics(spark, fuzz_dir).collect()
    }
    assert len(labels) >= 2
    raws = {r["raw"] for r in qlinear.qlin_doc_scores(spark, fuzz_dir).collect()}
    assert len(raws) > 5
