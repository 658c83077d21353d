"""Oracle + consistency checks for the redundancy panel
(operators/panel.py)."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import panel
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(panel.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, panel.ORACLES[name], panel.QUERIES[name], SF_CORRECT, name)


def test_rows_consistent_with_source_censuses(spark):
    """Each panel row must agree with the certified census it
    summarizes: substr_dup_stats for windows, cdc_stats for chunks, and
    line_dedup_stats for lines."""
    from dic_a1_spark.operators.cdc import cdc_stats
    from dic_a1_spark.operators.linededup import line_dedup_stats
    from dic_a1_spark.operators.substr import substr_dup_stats

    rows = {
        r["granularity"]: r
        for r in panel.redundancy_panel(spark, SF_CORRECT).collect()
    }
    assert set(rows) == {"document", "line", "window", "chunk"}
    for r in rows.values():
        assert r["excess"] == r["n_units"] - r["n_distinct"] >= 0

    w = substr_dup_stats(spark, SF_CORRECT).collect()[0]
    assert rows["window"]["n_units"] == w["n_windows"]
    assert rows["window"]["n_distinct"] == w["n_distinct"]

    c = cdc_stats(spark, SF_CORRECT).collect()[0]
    assert rows["chunk"]["n_units"] == c["n_chunks"]
    assert rows["chunk"]["n_distinct"] == c["n_distinct_chunks"]

    ln = line_dedup_stats(spark, SF_CORRECT).collect()[0]
    assert rows["line"]["n_units"] == ln["total_instances"]
    assert rows["line"]["n_distinct"] == ln["distinct_lines"]
