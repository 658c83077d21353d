"""Cross-engine oracle parity for the EVENTS families on an
ADVERSARIAL stream — the r8 fuzz treatment (test_r8_oracle_fuzz) applied
to time: the driver stream is too smooth to exercise the tie-break and
boundary paths, so this corpus plants:

  - same-(user, ts) event pairs differing only in event_id (the
    events_session_windows / attribution ADVICE tie-break lesson);
  - events exactly at the 10-minute session gap and one microsecond to
    either side (merge-at-most-gap semantics: an event landing EXACTLY
    on the session end extends the session — Spark's session_window
    merges it, and the oracle splits only on gap > SESSION_GAP, see
    events.py);
  - events exactly on hour boundaries (tumbling/window edges);
  - single-event users, a user with 60 events inside one second, and a
    user whose purchases have NO preceding event;
  - zero-value and identical-value events (percentile / anomaly ties);
  - a Sunday<->Monday midnight straddle (dow seam for seasonality).

Every events/seasonality/attribution oracle runs through the same
value-hash gate on this stream.
"""

from __future__ import annotations

import datetime as dt
import random
import shutil
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dic_a1_spark.config import TABLES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare

_TYPES = ["signup", "click", "error", "view", "purchase"]


@pytest.fixture(scope="module")
def hostile_events_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("hostile_events_sf")
    for t in TABLES:
        if t == "events":
            continue
        shutil.copy(Path(SF_SMOKE) / f"{t}.parquet", out / f"{t}.parquet")

    rng = random.Random(0xE08)
    t0 = dt.datetime(2024, 1, 1)  # a Monday
    rows: list[tuple[int, dt.datetime, int, str, float]] = []
    eid = 0

    def add(ts, user, typ, val):
        nonlocal eid
        rows.append((eid, ts, user, typ, val))
        eid += 1

    # user 1: same-timestamp tie pairs (click+view at identical ts), a
    # purchase at the same instant as its candidate attribution source
    tie_ts = t0 + dt.timedelta(hours=1)
    add(tie_ts, 1, "click", 1.0)
    add(tie_ts, 1, "view", 2.0)
    add(tie_ts, 1, "purchase", 10.0)
    # user 2: events at EXACTLY the 10-minute session gap, and 1 us
    # inside/outside it
    base = t0 + dt.timedelta(hours=2)
    add(base, 2, "click", 1.0)
    add(base + dt.timedelta(minutes=10), 2, "view", 1.0)  # exactly gap
    add(
        base + dt.timedelta(minutes=20) - dt.timedelta(microseconds=1),
        2, "click", 1.0,
    )  # 1 us inside
    add(
        base + dt.timedelta(minutes=30, microseconds=1), 2, "view", 1.0
    )  # 1 us outside
    # user 3: exact hour boundaries
    for h in range(3, 7):
        add(t0 + dt.timedelta(hours=h), 3, "view", float(h))
    # user 4: 60 events inside one second (dense ties), then a purchase
    burst = t0 + dt.timedelta(hours=8)
    for i in range(60):
        add(
            burst + dt.timedelta(microseconds=i * 1000),
            4,
            _TYPES[i % 4],  # never purchase
            0.0,
        )
    add(burst + dt.timedelta(seconds=1), 4, "purchase", 5.0)
    # user 5: purchase with NO preceding event (direct)
    add(t0 + dt.timedelta(hours=9), 5, "purchase", 7.0)
    # user 6: single non-purchase event
    add(t0 + dt.timedelta(hours=10), 6, "signup", 0.0)
    # Sunday -> Monday midnight straddle (2024-01-07 is a Sunday)
    sun = dt.datetime(2024, 1, 7, 23, 59, 59, 999999)
    add(sun, 7, "click", 3.0)
    add(dt.datetime(2024, 1, 8, 0, 0, 0), 7, "purchase", 3.0)
    # bulk: random events for mass (identical values for percentile ties)
    for _ in range(800):
        add(
            t0 + dt.timedelta(seconds=rng.randint(0, 14 * 24 * 3600)),
            rng.randint(10, 40),
            rng.choice(_TYPES),
            rng.choice([0.0, 1.0, 1.0, 5.0, 9.99]),
        )

    rows.sort(key=lambda r: r[1])
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, out / "events.parquet")
    return str(out)


_FAMILIES = [
    ("events", "events_session_windows"),
    ("events", "events_tumbling_hour"),
    ("events", "events_sliding_window"),
    ("events", "events_asof_click_before_purchase"),
    ("events", "events_first_per_user_type"),
    ("events", "events_funnel_depth"),
    ("events", "events_hourly_anomaly"),
    ("events", "events_value_percentiles"),
    ("events", "events_gapfill_hourly"),
    ("events", "events_retention_cohorts"),
    ("events", "events_dau_stickiness"),
    ("events", "events_hour_of_day_matrix"),
    ("attribution", "events_attribution"),
    ("attribution", "events_attribution_rollup"),
    ("seasonality", "events_dow_hour_profile"),
    ("seasonality", "events_weekend_lift"),
    ("seasonality", "events_seasonal_deviation"),
]


@pytest.mark.parametrize("mod_name,query", _FAMILIES)
def test_events_oracle_parity_on_hostile_stream(
    spark, hostile_events_dir, mod_name, query
):
    import importlib

    mod = importlib.import_module(f"dic_a1_spark.operators.{mod_name}")
    compare(spark, mod.ORACLES[query], mod.QUERIES[query], hostile_events_dir, query)


def test_hostile_stream_exercises_the_planted_paths(spark, hostile_events_dir):
    """The planted rows must actually hit the paths they target."""
    from dic_a1_spark.operators import attribution as at
    from dic_a1_spark.operators import events as ev

    attr = {
        r["purchase_id"]: r
        for r in at.events_attribution(spark, hostile_events_dir).collect()
    }
    # user 1's purchase shares its timestamp with two candidates: the
    # tie must break to the HIGHER event_id among same-ts predecessors
    # (running max over the ts|id|type encoding), here the 'view'
    assert attr[2]["attributed_type"] == "view"
    assert attr[2]["gap_s"] == 0
    # user 5: direct
    direct = [r for r in attr.values() if r["user_id"] == 5]
    assert direct and direct[0]["attributed_type"] == at.DIRECT
    # user 2's session structure: exactly-at-gap merges iff the
    # semantics say strictly-less — whatever Spark computed, the oracle
    # agreed (parity test above); here we only require >= 2 sessions
    sess = [
        r
        for r in ev.events_session_windows(spark, hostile_events_dir).collect()
        if r["user_id"] == 2
    ]
    assert len(sess) >= 2
    # user 4's burst is one session with 60 + 1 events
    sess4 = [
        r
        for r in ev.events_session_windows(spark, hostile_events_dir).collect()
        if r["user_id"] == 4
    ]
    assert sum(r["n_events"] for r in sess4) == 61
