"""Spec test for lm.py's closed-form NTILE: the integer formula must
reproduce SQL NTILE semantics (first N mod k buckets one row larger)
for EVERY rank at a sweep of corpus sizes — pure Python, no Spark.
The cross-engine hash gate certifies it at two data points; this pins
the whole function domain."""

from __future__ import annotations

from dic_a1_spark.operators.lm import PPL_BUCKETS


def _closed_form(rank: int, n: int, k: int) -> int | None:
    q, r = divmod(n, k)
    if q == 0:
        return None
    if rank <= r * (q + 1):
        return (rank + q) // (q + 1)
    return r + (rank - r * (q + 1) + q - 1) // q


def _ntile_reference(n: int, k: int) -> list[int]:
    """SQL NTILE: bucket sizes ceil for the first n mod k buckets,
    floor after."""
    q, r = divmod(n, k)
    out = []
    for b in range(1, k + 1):
        out.extend([b] * (q + 1 if b <= r else q))
    return out


def test_closed_form_equals_ntile_for_all_ranks():
    k = PPL_BUCKETS
    for n in list(range(k, 400)) + [999, 1000, 12345]:
        want = _ntile_reference(n, k)
        got = [_closed_form(rank, n, k) for rank in range(1, n + 1)]
        assert got == want, f"mismatch at n={n}"


def test_below_k_rows_emit_no_decile():
    k = PPL_BUCKETS
    for n in range(1, k):
        assert _closed_form(1, n, k) is None
