"""Oracle + semantics checks for SemDeDup (cluster-local semantic dedup)."""

from __future__ import annotations

import pytest

from dic_a1_spark.functions.sweeps import tau_label

from dic_a1_spark.operators import semdedup
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(semdedup.ORACLES))
def test_semdedup_oracle(spark, name):
    compare(
        spark, semdedup.ORACLES[name], semdedup.QUERIES[name], SF_CORRECT, name
    )


def test_keep_nonvacuous_and_corpus_complete(spark):
    """Every vector gets exactly one kept flag; both branches populated
    (SEMDEDUP_SIM is calibrated for this at sf0.01)."""
    from dic_a1_spark.sources.readers import load_table

    rows = semdedup.semdedup_keep(spark, SF_CORRECT).collect()
    n_vecs = load_table(spark, SF_CORRECT, "embeddings").count()
    assert len(rows) == n_vecs
    n_dropped = sum(not r["kept"] for r in rows)
    assert 0 < n_dropped < n_vecs


def test_dropped_pairs_certify_greedy_rule(spark):
    """Witness rows: earlier-id neighbor, above threshold, one per
    dropped vector, consistent with the keep flags."""
    pairs = semdedup.semdedup_dropped_pairs(spark, SF_CORRECT).collect()
    assert pairs
    assert all(r["witness_id"] < r["dropped_id"] for r in pairs)
    assert all(r["sim"] >= semdedup.SEMDEDUP_SIM for r in pairs)
    dropped_ids = {r["dropped_id"] for r in pairs}
    assert len(dropped_ids) == len(pairs)  # exactly one witness each
    keep = semdedup.semdedup_keep(spark, SF_CORRECT).collect()
    assert dropped_ids == {r["vec_id"] for r in keep if not r["kept"]}


def test_stats_consistent_with_keep(spark):
    st = semdedup.semdedup_stats(spark, SF_CORRECT).collect()
    keep = semdedup.semdedup_keep(spark, SF_CORRECT).collect()
    by_cluster: dict[int, list] = {}
    for r in keep:
        by_cluster.setdefault(r["centroid_id"], []).append(r["kept"])
    assert len(st) == len(by_cluster)
    for r in st:
        flags = by_cluster[r["centroid_id"]]
        assert r["n_members"] == len(flags)
        assert r["n_dropped"] == sum(not k for k in flags)


def test_witness_never_dropped_transitively_ok(spark):
    """The one-pass greedy rule (module docstring) allows a dropped
    vector's witness to itself be dropped by an even earlier vector —
    document the semantics by asserting the MINIMUM id in every cluster
    with members is always kept (it has no earlier neighbor)."""
    keep = semdedup.semdedup_keep(spark, SF_CORRECT).collect()
    first_in_cluster: dict[int, int] = {}
    for r in keep:
        c = r["centroid_id"]
        if c not in first_in_cluster or r["vec_id"] < first_in_cluster[c]:
            first_in_cluster[c] = r["vec_id"]
    kept_by_id = {r["vec_id"]: r["kept"] for r in keep}
    assert all(kept_by_id[v] for v in first_in_cluster.values())


def test_threshold_sweep_monotone_and_consistent_with_keep(spark):
    """Sweep counts must be monotone decreasing in tau, and the count at
    SEMDEDUP_SIM must equal the production keep-pass drop count."""
    row = semdedup.semdedup_threshold_sweep(spark, SF_CORRECT).collect()[0]
    counts = [
        row[tau_label("dropped", t)] for t in semdedup.SWEEP_TAUS
    ]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > counts[-1] > 0  # non-vacuous spread
    at_prod = row[tau_label("dropped", semdedup.SEMDEDUP_SIM)]
    keep = semdedup.semdedup_keep(spark, SF_CORRECT).collect()
    assert at_prod == sum(not r["kept"] for r in keep)
