"""Driver-gate replication for the PRODUCTION xxhash64 dedup queries.

For five rounds dedup_minhash_pairs/groups and dedup_simhash_pairs/groups
were rows-only (DuckDB lacks xxhash64); their oracles are now GENERATED
from functions/xxh64_sql.py. These tests run the exact driver comparison
(row count + column names + typed value hash) at sf0.001; the committed
sf0.1 sweep and the md5-twin tests in test_lsh.py cover the larger
scales. Hash-level parity of the generator itself is pinned separately
in test_xxh64_sql.py — a failure HERE with a green generator points at
the oracle's pipeline restatement (banding, label propagation, Jaccard
arithmetic), not the hash.
"""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import dedup
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_pairs",
        "dedup_minhash_groups",
        "dedup_simhash_pairs",
        "dedup_simhash_groups",
    ],
)
def test_xxh_oracle_matches(spark, name):
    compare(spark, dedup.ORACLES[name], dedup.QUERIES[name], SF_SMOKE, name)


def test_oracles_registered():
    """The four production entries must never silently fall back to
    rows-only again: ORACLES carries all four generated twins."""
    for name in (
        "dedup_minhash_pairs",
        "dedup_minhash_groups",
        "dedup_simhash_pairs",
        "dedup_simhash_groups",
    ):
        assert name in dedup.ORACLES
        assert "xor" in dedup.ORACLES[name]  # generated hash SQL, not a stub
