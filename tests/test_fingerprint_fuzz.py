"""Adversarial parity for the fingerprinting operators: winnowing
selection and CDC chunking must agree with their plain-Python references
on seeded random corpora designed to force the edge cases the real
corpus rarely hits — tiny vocabularies (equal hashes INSIDE one window,
so the rightmost-min tiebreak decides), documents shorter than /exactly
at the window width, and single-token documents. One Spark action per
corpus (the tokenizer-fuzz pattern)."""

from __future__ import annotations

import random

from dic_a1_spark.operators import cdc, winnow
from tests.test_cdc import _chunk_reference
from tests.test_winnow import _python_winnow


def _fuzz_docs(seed: int, vocab: list[str], n_docs: int) -> list[str]:
    rng = random.Random(seed)
    docs = [
        "",  # no tokens
        "a",  # below K
        " ".join(["a"] * winnow.WINNOW_K),  # exactly K tokens (1 gram)
        " ".join(["b"] * (winnow.WINNOW_K + winnow.WINNOW_W - 1)),
        # all-identical tokens: every gram hash EQUAL -> pure tiebreak
        " ".join(["tie"] * 30),
    ]
    for _ in range(n_docs):
        n = rng.randint(0, 60)
        docs.append(" ".join(rng.choice(vocab) for _ in range(n)))
    return docs


def test_winnow_selection_fuzz(spark):
    """Tiny-vocab corpora repeat grams within windows: equal encoded
    hashes force the rightmost-position tiebreak on nearly every window.
    The Spark selection must equal the Python reference exactly."""
    for seed, vocab in [
        (11, ["a", "b"]),
        (12, ["x", "y", "z"]),
        # digit-free words only: digits are in the tokenizer's translate
        # set and would split, diverging from the raw split() reference
        (13, ["w" + chr(ord("a") + i) for i in range(12)]),
    ]:
        docs = _fuzz_docs(seed, vocab, 120)
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(docs)], ["doc_id", "text"]
        )
        got: dict[int, set] = {}
        for r in winnow._selected_encoded(df).collect():
            pos = winnow._MAXP - r["enc"] % winnow._POS_ENC
            h = r["enc"] // winnow._POS_ENC
            got.setdefault(r["doc_id"], set()).add((pos, h))
        bad = []
        for i, s in enumerate(docs):
            toks = s.split()
            expected = (
                _python_winnow(toks)
                if len(toks) >= winnow.WINNOW_K
                else set()
            )
            if got.get(i, set()) != expected:
                bad.append((seed, i, s))
        assert not bad, f"{len(bad)} docs mismatch; first: {bad[:3]}"


def test_cdc_chunks_fuzz(spark):
    """CDC boundary rule on hostile lengths: empty docs, docs below the
    window width (single whole-doc chunk), boundary-at-last-token dedup,
    and repetitive text where many windows divide CDC_D."""
    for seed, vocab in [
        (21, ["a", "b"]),
        (22, ["w" + chr(ord("a") + i) for i in range(9)]),
    ]:
        docs = _fuzz_docs(seed, vocab, 120)
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(docs)], ["doc_id", "text"]
        )
        got: dict[int, set] = {}
        for r in cdc._chunks(df).collect():
            got.setdefault(r["doc_id"], set()).add(
                (r["chunk_start"], r["chunk_end"], r["n_tokens"])
            )
        bad = []
        for i, s in enumerate(docs):
            expected = _chunk_reference(s.split())
            if got.get(i, set()) != expected:
                bad.append((seed, i, s, got.get(i, set()), expected))
        assert not bad, f"{len(bad)} docs mismatch; first: {bad[:2]}"
