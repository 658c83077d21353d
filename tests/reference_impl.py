"""Independent plain-Python implementation of the reference pipeline's
SEMANTICS (tokenize -> per-review dedup -> stopword filter -> doc frequency
-> chi-square -> top-k), written from the spec in SURVEY.md §2 for use as a
test oracle. Deliberately structured nothing like either the reference or
the Spark engine: single-threaded dict folding over parsed lines."""

from __future__ import annotations

import json

PUNCT = '()[]{}.!?,;:+=-_"~#@&*%€$§/\\1234567890\t' + "'"
_TABLE = {ord(ch): " " for ch in PUNCT}


def tokenize(text: str) -> set[str]:
    return {w for w in text.lower().translate(_TABLE).split() if w}


def pipeline(lines: list[str], stopwords: set[str], k: int):
    """Returns (per_category_topk: {cat: {word: chi2}}, total, cat_counts)."""
    doc_freq: dict[tuple[str, str], int] = {}
    cat_counts: dict[str, int] = {}
    total = 0
    for line in lines:
        try:
            rec = json.loads(line)
            if not isinstance(rec, dict):
                continue
        except Exception:
            continue
        cat = rec.get("category", "Unknown")
        text = rec.get("reviewText", "")
        total += 1
        cat_counts[cat] = cat_counts.get(cat, 0) + 1
        for word in tokenize(text):
            if word not in stopwords:
                doc_freq[(word, cat)] = doc_freq.get((word, cat), 0) + 1

    word_totals: dict[str, int] = {}
    for (word, _cat), n in doc_freq.items():
        word_totals[word] = word_totals.get(word, 0) + n

    scores: dict[str, list[tuple[str, float]]] = {}
    for (word, cat), n in doc_freq.items():
        a = n
        b = word_totals[word] - a
        c = cat_counts[cat] - a
        d = total - a - b - c
        if any(x == 0 for x in (a + b, a + c, b + d, c + d)):
            continue
        chi2 = (total * (a * d - b * c) ** 2) / ((a + b) * (a + c) * (b + d) * (c + d))
        scores.setdefault(cat, []).append((word, chi2))

    out: dict[str, dict[str, float]] = {}
    for cat, pairs in scores.items():
        pairs.sort(key=lambda t: (-t[1], t[0]))
        out[cat] = dict(pairs[:k])
    return out, total, cat_counts
