"""Second-scale-factor gating (ADVICE r1): sf0.01-only oracle checks let a
set_except semantics bug pass vacuously because both sides were empty at
that scale. Two layers of defense:

1. Always-on: every oracle-matched query whose sf0.01 result is EMPTY
   (vacuous hash match) is re-verified at sf0.1, where data actually
   flows through it.
2. Env-gated full sweep: SPARK_GRAFT_SF01=1 runs the entire registry
   against the oracles at sf0.1 (minutes, not CI-default).
"""

from __future__ import annotations

import os

import pytest

from dic_a1_spark.registry import all_oracles, all_queries
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare

SF01 = "/root/testdata/sf0.1"

# Queries known to return zero rows at sf0.01 — their sf0.01 oracle rows
# are vacuous, so the sf0.1 check is the one that actually gates them.
VACUOUS_AT_SF001 = [
    "set_except",
    "join_anti",
    "q22_idle_rich_customers",
    "sql_scalar_subquery_parts",
]


@pytest.mark.parametrize("name", VACUOUS_AT_SF001)
def test_vacuous_queries_verified_at_sf01(spark, name):
    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    oracles = all_oracles()
    compare(spark, oracles[name], all_queries()[name], SF01, f"{name}@sf0.1")


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_HOSTILE") != "1",
    reason=(
        "full-registry meta-scan (every oracle query materialized at "
        "sf0.01, ~3.5 min) — r13: part of the SPARK_GRAFT_HOSTILE=1 "
        "full tier so the default suite fits the round driver's pytest "
        "window; the list only moves when the registry does"
    ),
)
def test_vacuous_list_is_current(spark):
    """If new oracle queries become empty at sf0.01, they must be added to
    VACUOUS_AT_SF001 (or made non-vacuous) — otherwise their hash match
    proves nothing."""
    qs, oracles = all_queries(), all_oracles()
    empty = []
    for name in sorted(oracles):
        try:
            if len(qs[name](spark, SF_CORRECT).head(1)) == 0:
                empty.append(name)
        except Exception as ex:  # pragma: no cover - surfaced as failure
            pytest.fail(f"{name} failed to run: {ex}")
    missing = sorted(set(empty) - set(VACUOUS_AT_SF001))
    assert not missing, (
        f"oracle queries empty at sf0.01 need sf0.1 gating: {missing}"
    )


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_SF01") != "1",
    reason="full sf0.1 sweep is opt-in (SPARK_GRAFT_SF01=1)",
)
@pytest.mark.parametrize("name", sorted(all_oracles()))
def test_full_registry_at_sf01(spark, name):
    if not os.path.isdir(SF01):
        pytest.skip("sf0.1 testdata not present")
    compare(spark, all_oracles()[name], all_queries()[name], SF01, f"{name}@sf0.1")
