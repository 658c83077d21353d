"""Oracle + semantics checks for BPE merge induction (operators/bpe.py)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import bpe
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare, duck_con


@pytest.mark.parametrize("name", sorted(bpe.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, bpe.ORACLES[name], bpe.QUERIES[name], SF_CORRECT, name)


def _py_bpe(word_freq: dict[str, int], rounds: int):
    """Plain-Python BPE on the word census: positional pair counts,
    (count desc, x, y) tie-break, leftmost-nonoverlapping merge."""
    seqs = {w: tuple(w) for w in word_freq}
    merges = []
    for _ in range(rounds):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seqs.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + word_freq[w]
        if not counts:
            break
        (x, y), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((x, y, cnt))
        new_seqs = {}
        for w, syms in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == x and syms[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_seqs[w] = tuple(out)
        seqs = new_seqs
    return merges, seqs


def _word_freq(spark) -> dict[str, int]:
    rows = bpe._word_census(spark, SF_CORRECT).collect()
    return {r["word"]: r["freq"] for r in rows}


def test_merges_match_python_reference(spark):
    wf = _word_freq(spark)
    exp_merges, exp_seqs = _py_bpe(wf, bpe.BPE_ROUNDS)
    got = sorted(
        bpe.bpe_merges(spark, SF_CORRECT).collect(), key=lambda r: r["round"]
    )
    assert [(r["x"], r["y"], r["cnt"]) for r in got] == exp_merges
    assert [r["merged"] for r in got] == [x + y for x, y, _ in exp_merges]
    seg = {
        r["word"]: (r["seg"], r["n_pieces"])
        for r in bpe.bpe_segmented_vocab(spark, SF_CORRECT).collect()
    }
    assert seg == {
        w: (" ".join(s), len(s)) for w, s in exp_seqs.items()
    }


def test_piece_census_matches_python_reference(spark):
    wf = _word_freq(spark)
    _, seqs = _py_bpe(wf, bpe.BPE_ROUNDS)
    exp: dict[str, list[int]] = {}
    for w, syms in seqs.items():
        for s in set(syms):
            exp.setdefault(s, [0, 0])[0] += 1
        for s in syms:
            exp[s][1] += wf[w]
    got = {
        r["piece"]: [r["n_words"], r["freq_total"]]
        for r in bpe.bpe_piece_census(spark, SF_CORRECT).collect()
    }
    assert got == exp
    assert len(got) > 5, "piece census must be non-vacuous"


def test_replace_semantics_identical_across_engines(spark):
    """The merge step's correctness rests on replace() being leftmost-
    nonoverlapping continue-after-replacement in BOTH engines AND in
    Python (the reference). Fuzz wrapped sequences over a 2-symbol
    alphabet — the worst case for overlap handling — plus random pairs,
    and require three-way byte equality."""
    rng = random.Random(0xB9E)
    cases = []
    for _ in range(60):
        n = rng.randint(1, 8)
        syms = [rng.choice(["a", "b", "ab"]) for _ in range(n)]
        seq = "<" + "><".join(syms) + ">"
        x = rng.choice(["a", "b", "ab"])
        y = rng.choice(["a", "b", "ab"])
        cases.append((seq, f"<{x}><{y}>", f"<{x}{y}>"))
    sdf = spark.createDataFrame(cases, ["seq", "pat", "rep"])
    srows = sdf.select(
        "seq", "pat", F.expr("replace(seq, pat, rep)").alias("out")
    ).collect()
    con = duck_con(SF_CORRECT)
    for (seq, pat, rep), srow in zip(cases, srows):
        py = seq.replace(pat, rep)
        dk = con.execute(
            "SELECT replace(?, ?, ?)", [seq, pat, rep]
        ).fetchone()[0]
        assert srow["out"] == py == dk, (seq, pat, rep, srow["out"], py, dk)
    con.close()


def test_merges_are_nontrivial(spark):
    """Non-vacuity on this corpus: every round must find a pair with a
    weighted count well above the census floor, and at least one later
    round must merge a multi-char symbol (proof the unrolled rounds
    actually feed each other)."""
    rows = sorted(
        bpe.bpe_merges(spark, SF_CORRECT).collect(), key=lambda r: r["round"]
    )
    assert len(rows) == bpe.BPE_ROUNDS
    assert all(r["cnt"] > bpe.BPE_CENSUS_MIN for r in rows)
    assert any(
        len(r["x"]) > 1 or len(r["y"]) > 1 for r in rows
    ), "no round consumed an earlier round's merge"
