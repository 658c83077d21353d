"""Cross-engine oracle parity for the EMBEDDING family on an adversarial
corpus built around the round-9 NaN/NULL finding.

The fork this fuzz exists to pin: a zero-norm vector makes cosine 0/0.
DuckDB (1.0.0) maps ANY division by zero to NULL, and NULL sorts LAST
under ``ORDER BY sim DESC`` in both engines — but a raw Spark JVM
division yields a true Double.NaN, which Spark's total order ranks
GREATEST, i.e. FIRST under ``desc(sim)``. Before the round-9
``similarity._nan_to_null`` normalization the exact Spark paths would
therefore (a) rank a zero-norm candidate at the top of every kNN list
while the oracle ranked it last, and (b) emit NaN where the oracle
emits NULL. The fuzz corpus plants zero-norm vectors in every
structural role — query, IVF centroid / PQ codebook member, and plain
candidate — so the fork cannot hide behind "the first K vectors are
well-behaved".

Additional hostile structure, aimed at the round-4 ``round(sim, 4)``
staircase shared by the quantize/pq families: exact duplicates of a
query (sim exactly 1.0 → full tie-break reliance), positive scalings
(cosine identical to the unscaled vector → staircase collisions),
sign-flips (sim exactly -1.0), and a pair orthogonalized to a chosen
mid-scale cosine. Labels cycle mod 7 so the semdedup cluster and
label-centroid queries get multi-member groups that include the
zero-norm rows.
"""

from __future__ import annotations

import importlib
import math
import shutil
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dic_a1_spark.config import TABLES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("fuzz_sf_r9")
    for t in TABLES:
        if t == "embeddings":
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", out / f"{t}.parquet")

    nprng = np.random.RandomState(0xF09)
    n, dim = 400, 64
    V = nprng.randn(n, dim).astype(np.float32)

    # Zero-norm plants, one per structural role:
    V[3] = 0.0    # a QUERY (vec_id < N_QUERIES=10), an IVF centroid
    #               (vec_id < IVF_K=8) AND a PQ codebook donor
    #               (vec_id < PQ_K=64) all at once
    V[50] = 0.0   # a codebook donor that is NOT a query/centroid
    V[200] = 0.0  # a plain candidate

    # Tie-break stress: sim exactly 1.0 with query 0 (duplicate) and a
    # positive scaling (cosine invariant under positive scale).
    V[120] = V[0]
    V[130] = 2.0 * V[0]
    # Sign flip: sim exactly -1.0 with query 1.
    V[121] = -V[1]
    # Mid-scale planted cosine (~0.4) against query 2 — near typical
    # neardup/semdedup thresholds.
    a = V[2].astype(np.float64)
    b = nprng.randn(dim)
    b -= (b @ a) / (a @ a) * a
    mix = 0.4 * a / np.linalg.norm(a) + math.sqrt(1 - 0.16) * b / np.linalg.norm(b)
    V[140] = mix.astype(np.float32)
    # Tiny-magnitude (denormal-adjacent) vector: norm is small but
    # nonzero — must NOT be treated as zero-norm by either engine.
    V[150] = (nprng.randn(dim) * 1e-20).astype(np.float32)

    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in V], pa.list_(pa.float32())
            ),
            "label": pa.array([int(i % 7) for i in range(n)], pa.int32()),
        }
    )
    pq.write_table(tbl, out / "embeddings.parquet")
    return str(out)


_EMBED_FAMILY = [
    ("similarity", "embedding_norms"),
    ("similarity", "knn_cosine_bruteforce"),
    ("similarity", "ivf_assignments"),
    ("similarity", "ivf_assignments_fast"),
    ("similarity", "knn_cosine_ivf"),
    ("similarity", "embedding_neardup_blocked"),
    ("similarity", "embedding_neardup_blocked_fast"),
    ("similarity", "embedding_neardup_groups"),
    ("similarity", "label_centroid_sim"),
    ("pq", "embedding_pq_codes"),
    ("pq", "pq_recon_certificate"),
    ("pq", "knn_cosine_pq"),
    ("pq", "embedding_pq_codes_fast"),
    ("pq", "knn_cosine_pq_fast"),
    ("quantize", "embedding_quantize_int8"),
    ("quantize", "quantize_error_certificate"),
    ("quantize", "knn_cosine_quantized"),
    ("quantize", "knn_cosine_quantized_fast"),
    ("semdedup", "semdedup_dropped_pairs"),
    ("semdedup", "semdedup_keep"),
    ("semdedup", "semdedup_stats"),
    ("semdedup", "semdedup_threshold_sweep"),
    ("evalops", "quantized_knn_recall_report"),
    ("evalops", "pq_knn_recall_report"),
    ("embdecontam", "embdecontam_flagged"),
    ("embdecontam", "embdecontam_summary"),
]


@pytest.mark.parametrize("mod_name,query", _EMBED_FAMILY)
def test_embedding_family_parity_on_zero_norm_corpus(
    spark, fuzz_dir, mod_name, query
):
    mod = importlib.import_module(f"dic_a1_spark.operators.{mod_name}")
    compare(spark, mod.ORACLES[query], mod.QUERIES[query], fuzz_dir, query)


def test_zero_norm_query_ranks_null_sims_last(spark, fuzz_dir):
    """Structural check, independent of the oracle: the zero-norm
    candidate (vec_id 200) must never beat a finite-sim candidate in
    any query's top-k, and the zero-norm query (vec_id 3) must emit a
    full top-k of NULL sims tie-broken by neighbor_id ascending."""
    from dic_a1_spark.operators import similarity as sim

    rows = sim.knn_cosine_bruteforce(spark, fuzz_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    # vec_id 200 (all-zero) may only appear where sims are NULL —
    # i.e. under the zero-norm query 3, never with a finite sim.
    for qid, rs in by_q.items():
        for r in rs:
            if r["neighbor_id"] == 200:
                assert r["sim"] is None, (qid, r)
    q3 = sorted(by_q[3], key=lambda r: r["rank"])
    assert [r["sim"] for r in q3] == [None] * len(q3)
    ids = [r["neighbor_id"] for r in q3]
    assert ids == sorted(ids)


def test_duplicate_and_scaled_vectors_tie_at_sim_one(spark, fuzz_dir):
    """The planted duplicate (120) and positive scaling (130) of query 0
    must both surface with sim 1.0 in query 0's top-k."""
    from dic_a1_spark.operators import similarity as sim

    rows = sim.knn_cosine_bruteforce(spark, fuzz_dir).collect()
    q0 = {r["neighbor_id"]: r["sim"] for r in rows if r["query_id"] == 0}
    assert q0.get(120) == 1.0
    assert q0.get(130) == 1.0
