"""Adversarial parity for the BPE merge loop: random word censuses over
a TWO-LETTER alphabet force the cases the real corpus rarely hits —
overlapping pair runs (aaaa...), merged symbols immediately re-merging
(ab + ab), and count ties decided purely by the (x, y) lexicographic
tie-break. The Spark round loop (census → top-1 → sentinel replace)
must match the plain-Python reference merge-for-merge and produce the
identical final segmentation for every word."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dic_a1_spark.operators import bpe
from tests.test_bpe import _py_bpe

_FUZZ_ROUNDS = 4


def _fuzz_census(seed: int) -> dict[str, int]:
    rng = random.Random(seed)
    words = {
        # guaranteed pair mass for all _FUZZ_ROUNDS rounds, plus the
        # overlap-run and remerge shapes
        "abababab": rng.randint(1, 9),
        "aaaabbbb": rng.randint(1, 9),
        "bbbbaaaa": rng.randint(1, 9),
        "aaaaaaa": rng.randint(1, 9),
        "a": rng.randint(1, 9),  # single symbol: no pairs, must survive
        "b": rng.randint(1, 9),
    }
    for _ in range(12):
        n = rng.randint(2, 7)
        w = "".join(rng.choice("ab") for _ in range(n))
        words.setdefault(w, rng.randint(1, 9))
    return words


def _spark_rounds(spark, census: dict[str, int]):
    """Drive the module's round primitives on a synthetic census."""
    df = spark.createDataFrame(
        [(w, c) for w, c in sorted(census.items())], ["word", "freq"]
    ).select(
        "word",
        F.col("freq").cast("bigint").alias("freq"),
        F.expr(bpe._WRAP_SPARK.format(w="word")).alias("seq"),
    )
    seqs = df.localCheckpoint()
    merges = []
    for _ in range(_FUZZ_ROUNDS):
        top = bpe._top1(bpe._census(seqs)).localCheckpoint()
        rows = top.collect()
        assert rows, "fuzz census exhausted its pairs — widen the corpus"
        merges.append((rows[0]["x"], rows[0]["y"], rows[0]["cnt"]))
        seqs = bpe._apply_merge(seqs, top).localCheckpoint()
    seg = {
        r["word"]: r["seq"]
        for r in seqs.collect()
    }
    return merges, seg


def test_bpe_loop_fuzz_two_letter_alphabet(spark):
    for seed in (101, 202, 303):
        census = _fuzz_census(seed)
        exp_merges, exp_seqs = _py_bpe(census, _FUZZ_ROUNDS)
        got_merges, got_seg = _spark_rounds(spark, census)
        assert got_merges == exp_merges, (seed, got_merges, exp_merges)
        for w, syms in exp_seqs.items():
            assert got_seg[w] == "<" + "><".join(syms) + ">", (
                seed,
                w,
                got_seg[w],
                syms,
            )
        # the adversarial shapes must actually exercise a remerge:
        # some later round consumes an earlier round's output
        assert any(len(x) > 1 or len(y) > 1 for x, y, _ in got_merges)
