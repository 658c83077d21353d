"""Oracle + semantics checks for seasonal profiles (operators/seasonality.py)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from dic_a1_spark.operators import seasonality as sn
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(sn.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, sn.ORACLES[name], sn.QUERIES[name], SF_CORRECT, name)


def _events(spark):
    from dic_a1_spark.sources.readers import load_table

    return [
        (r["event_type"], r["ts"])
        for r in load_table(spark, SF_CORRECT, "events")
        .select("event_type", "ts")
        .collect()
    ]


def _dow(ts: dt.datetime) -> int:
    return (ts.date() - dt.date(1970, 1, 5)).days % 7


def test_dow_anchor_is_monday():
    """The epoch-anchored formula must agree with the calendar."""
    assert dt.date(1970, 1, 5).weekday() == 0
    for d, expect in [
        (dt.date(2024, 1, 1), 0),  # a Monday
        (dt.date(2024, 1, 6), 5),  # a Saturday
        (dt.date(2024, 1, 7), 6),  # a Sunday
    ]:
        assert (d - dt.date(1970, 1, 5)).days % 7 == expect == d.weekday()


def test_profile_matches_python_reference(spark):
    ev = _events(spark)
    exp: dict[tuple[int, int], int] = {}
    for _, ts in ev:
        k = (_dow(ts), ts.hour)
        exp[k] = exp.get(k, 0) + 1
    rows = sn.events_dow_hour_profile(spark, SF_CORRECT).collect()
    got = {(r["dow"], r["hour_of_day"]): r["n_events"] for r in rows}
    assert got == exp
    total = sum(exp.values())
    for r in rows:
        assert math.isclose(
            r["share_r"], exp[(r["dow"], r["hour_of_day"])] / total,
            abs_tol=5e-7,
        )


def test_weekend_lift_matches_python_reference(spark):
    ev = _events(spark)
    agg: dict[str, list[int]] = {}
    for t, ts in ev:
        a = agg.setdefault(t, [0, 0])
        a[_dow(ts) in (5, 6)] += 1
    got = {
        r["event_type"]: r
        for r in sn.events_weekend_lift(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(agg)
    for t, (nwd, nwe) in agg.items():
        r = got[t]
        assert (r["n_weekday"], r["n_weekend"]) == (nwd, nwe)
        assert math.isclose(
            r["lift_r"], (nwe * 5.0) / (nwd * 2.0), abs_tol=5e-7
        )


def test_seasonal_deviation_matches_python_reference(spark):
    ev = _events(spark)
    cen: dict[tuple[str, int], int] = {}
    for t, ts in ev:
        k = (t, _dow(ts))
        cen[k] = cen.get(k, 0) + 1
    types = sorted({t for t, _ in cen})
    g = {d: sum(c for (t, dd), c in cen.items() if dd == d) for d in range(7)}
    gt = sum(g.values())
    got = {
        r["event_type"]: r
        for r in sn.events_seasonal_deviation(spark, SF_CORRECT).collect()
    }
    for t in types:
        ct = sum(c for (tt, _), c in cen.items() if tt == t)
        diffs = sorted(
            abs(cen.get((t, d), 0) / ct - g[d] / gt)
            for d in range(7)
            if (t, d) in cen
        )
        acc = 0.0
        for x in diffs:
            acc += x
        r = got[t]
        assert r["n_events"] == ct
        assert math.isclose(r["l1_dev_r"], acc, abs_tol=5e-7), (t, r, acc)
        peak = min(
            ((c, d) for (tt, d), c in cen.items() if tt == t),
            key=lambda cd: (-cd[0], cd[1]),
        )[1]
        assert r["peak_dow"] == peak
    # Non-vacuity: deviations differ across types.
    assert len({r["l1_dev_r"] for r in got.values()}) > 1
