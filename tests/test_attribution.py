"""Oracle + semantics checks for last-touch attribution
(operators/attribution.py)."""

from __future__ import annotations

import math

import pytest

from dic_a1_spark.operators import attribution as at
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(at.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, at.ORACLES[name], at.QUERIES[name], SF_CORRECT, name)


def _events(spark):
    from dic_a1_spark.sources.readers import load_table

    return [
        (r["event_id"], r["user_id"], r["ts"], r["event_type"], r["value"])
        for r in load_table(spark, SF_CORRECT, "events").collect()
    ]


def _py_attribution(events):
    """Plain-Python last-touch: per user, scan in (ts, event_id) order
    keeping the latest non-purchase; attribute each purchase within the
    window."""
    by_user: dict[int, list] = {}
    for e in events:
        by_user.setdefault(e[1], []).append(e)
    out = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda e: (e[2], e[0]))
        last = None  # (ts, event_id, type)
        for eid, _, ts, typ, val in evs:
            if typ == "purchase":
                if last is not None:
                    gap = int(
                        (ts - last[0]).total_seconds()
                    )  # non-negative; trunc == floor here
                    if gap <= at.ATTR_WINDOW_S:
                        out[eid] = (last[2], last[1], gap)
                        continue
                out[eid] = (at.DIRECT, None, None)
            else:
                last = (ts, eid, typ)
    return out


def test_attribution_matches_python_reference(spark):
    events = _events(spark)
    exp = _py_attribution(events)
    got = {
        r["purchase_id"]: (
            r["attributed_type"],
            r["attributed_event_id"],
            r["gap_s"],
        )
        for r in at.events_attribution(spark, SF_CORRECT).collect()
    }
    assert got == exp
    types = {v[0] for v in got.values()}
    assert at.DIRECT in types and len(types) >= 3, (
        "both direct and attributed purchases must exist (Q11)"
    )


def test_rollup_consistent_with_attribution(spark):
    rows = at.events_attribution(spark, SF_CORRECT).collect()
    roll = {
        r["attributed_type"]: r
        for r in at.events_attribution_rollup(spark, SF_CORRECT).collect()
    }
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["attributed_type"], []).append(r)
    assert set(roll) == set(by_type)
    for t, rs in by_type.items():
        s = 0.0
        for v in sorted(r["value"] for r in rs):
            s += v
        assert roll[t]["n_purchases"] == len(rs)
        assert math.isclose(roll[t]["sum_value_r"], s, abs_tol=5e-3)
        gaps = [r["gap_s"] for r in rs if r["gap_s"] is not None]
        if gaps:
            assert math.isclose(
                roll[t]["avg_gap_s_r"], sum(gaps) / len(gaps), abs_tol=5e-5
            )
        else:
            assert roll[t]["avg_gap_s_r"] is None
