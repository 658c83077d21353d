"""Adversarial tokenizer parity: the Spark tokenizer must agree with the
reference semantics (plain-Python ``lower().translate().split()``,
tests/reference_impl.py) on a seeded corpus of hostile strings — unicode
whitespace, mixed scripts, emoji, punctuation storms, huge runs. One Spark
action for the whole corpus."""

from __future__ import annotations

import random

from dic_a1_spark.functions.text import explode_tokens
from tests.reference_impl import tokenize as ref_tokenize

_CHARSET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    '()[]{}.!?,;:+=-_"~#@&*%€$§/\\1234567890\t' + "'"
    "<>|^`"                      # survivors: not in the translate set
    "éÉßñÑçÇøØåÅ中文日本語한국어"      # non-latin scripts
    "   　"   # unicode whitespace (NOT ascii \\s)
    " \n\r\x0b\x0c"
    "\U0001F600\U0001F680"       # emoji
)


def _corpus() -> list[str]:
    rng = random.Random(20250813)
    docs = ["", " ", "\t\t", "a", "<>", "don't", "€5 §2 (2024)"]
    # r11: the casefold fork strings. Python's str.lower() implements the
    # SAME full Unicode casing as Java (İ -> i + combining dot, the
    # Final_Sigma context rule), so the plain-Python reference is the
    # right arbiter for Spark's F.lower here too — these pin that the
    # JVM tokenizer tracks the reference on exactly the strings where
    # utf8proc-style per-codepoint casing would fork (the DuckDB side
    # has its own mirror, config.duckdb_lower_sql, pinned elsewhere).
    docs += [
        "İstanbul DİYARBAKIR Iı iİ",
        "ΟΔΥΣΣΕΥΣ ΚΑΙ Ο ΣΟΦΟΣ",
        "ΑΣ ΑΣΣΣ Σ οδυσσεύΣ ΕΥΣ.",
        "STRASSE straße ẞ WEIẞ",
        "ﬁle oﬃce ǅungla Ǆ ǆ",
    ]
    for _ in range(400):
        n = rng.randint(0, 80)
        docs.append("".join(rng.choice(_CHARSET) for _ in range(n)))
    docs.append("x" * 5000 + " y")  # long run
    return docs


def test_tokenizer_matches_reference_on_fuzz_corpus(spark):
    docs = _corpus()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(docs)], ["doc_id", "text"]
    )
    got: dict[int, set[str]] = {i: set() for i in range(len(docs))}
    for r in explode_tokens(df).collect():
        got[r["doc_id"]].add(r["word"])
    bad = []
    for i, s in enumerate(docs):
        expected = ref_tokenize(s)
        if got[i] != expected:
            bad.append((i, s, got[i] ^ expected))
    assert not bad, f"{len(bad)} docs mismatch; first: {bad[:3]}"
