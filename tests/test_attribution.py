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


@pytest.fixture(scope="module")
def pipey_dir(tmp_path_factory):
    """A synthetic sf-dir whose events stream has pipe-containing
    event types and max-width (but in-range) ids — the decode must not
    count pipes (ADVICE: substring_index vs split_part divergence)."""
    import datetime as dt
    import shutil
    from pathlib import Path

    import pyarrow as pa
    import pyarrow.parquet as pq

    from dic_a1_spark.config import TABLES

    out = tmp_path_factory.mktemp("pipey_sf")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copy(Path(SF_CORRECT) / f"{t}.parquet", out / f"{t}.parquet")
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: pipey click then purchase inside the window
        (1, t0, 1, "click|ad|banner", 10.0),
        (10**12 - 1, t0 + dt.timedelta(seconds=30), 1, "view|x", 5.0),
        (3, t0 + dt.timedelta(seconds=60), 1, "purchase", 99.0),
        # user 2: preceding event OUTSIDE the window -> direct
        (4, t0, 2, "click|y", 1.0),
        (5, t0 + dt.timedelta(seconds=at.ATTR_WINDOW_S + 1), 2, "purchase", 7.0),
        # user 3: purchase with no preceding event -> direct
        (6, t0, 3, "purchase", 3.0),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, out / "events.parquet")
    return str(out)


@pytest.mark.parametrize("name", sorted(at.ORACLES))
def test_pipe_safe_decode_matches_oracle(spark, pipey_dir, name):
    compare(spark, at.ORACLES[name], at.QUERIES[name], pipey_dir, name)


def test_pipe_containing_type_decodes_intact(spark, pipey_dir):
    got = {
        r["purchase_id"]: r["attributed_type"]
        for r in at.events_attribution(spark, pipey_dir).collect()
    }
    assert got == {3: "view|x", 5: at.DIRECT, 6: at.DIRECT}


def test_width_overflow_fails_loudly(spark, pipey_dir, tmp_path):
    """An event_id past the lpad width must raise, not silently corrupt
    the running-max ordering (ADVICE: unenforced width assumption)."""
    import shutil
    from pathlib import Path

    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    bad = tmp_path / "overflow_sf"
    shutil.copytree(pipey_dir, bad)
    tbl = pq.read_table(Path(pipey_dir) / "events.parquet")
    tbl = tbl.set_column(
        0, "event_id", pc.add(tbl["event_id"], 10**at._ID_W)
    )
    pq.write_table(tbl, bad / "events.parquet")
    with pytest.raises(Exception, match="(?i)assert|overflow"):
        at.events_attribution(spark, str(bad)).collect()


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
