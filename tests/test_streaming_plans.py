"""Plan-level regression checks on the streaming surface.

Two classes of silent failure these pin down:

1. **ts-conversion parity** between the batch reader (readers.load_table)
   and the stream reader (streaming.jobs.read_events_stream). Round 2
   shipped a stream reader that unconditionally divided by 1000 while the
   batch reader branched on the on-disk encoding — every window landed in
   1970. A direct value-level comparison of the two readers catches that
   class of bug in one cheap availableNow drain, without needing the full
   windowed parity suite.

2. **State-boundedness**: every stateful streaming job must carry an
   event-time watermark (else state grows without bound at 100 TB) and key
   its state store by the intended (window/session, key) grouping. Both
   are visible in the analyzed logical plan.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table
from dic_a1_spark.streaming import jobs
from tests.conftest import SF_SMOKE


def _analyzed(df) -> str:
    return df._jdf.queryExecution().analyzed().toString()


def test_stream_reader_ts_values_match_batch_reader(spark):
    """The stream's per-event timestamps must be wall-clock identical to
    the batch reader's (batch is NTZ, stream is TIMESTAMP in a UTC-pinned
    session — date_format strings are the tz-independent comparison)."""
    stream = jobs.read_events_stream(spark, SF_SMOKE).select(
        "event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t")
    )
    jobs.run_to_memory(stream, "t_ts_parity", output_mode="append")
    got = sorted(
        (r["event_id"], r["t"]) for r in spark.table("t_ts_parity").collect()
    )
    want = sorted(
        (r["event_id"], r["t"])
        for r in load_table(spark, SF_SMOKE, "events")
        .select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("t"))
        .collect()
    )
    assert got == want
    # sanity: nothing collapsed into the epoch (the round-2 failure mode)
    years = {t[:4] for _, t in got}
    assert "1970" not in years


@pytest.mark.parametrize(
    "job",
    [
        jobs.tumbling_counts,
        jobs.session_counts,
        jobs.dedup_within_watermark,
        jobs.clicks_before_purchases,
    ],
    ids=lambda f: f.__name__,
)
def test_stateful_jobs_carry_watermark(spark, job):
    plan = _analyzed(job(jobs.read_events_stream(spark, SF_SMOKE)))
    assert "EventTimeWatermark" in plan, f"{job.__name__} has unbounded state"


def test_state_store_keying(spark):
    """The analyzed plans must key state by the intended grouping — a
    window/session expression plus the business key — so per-key state is
    bounded and expirable by the watermark."""
    stream = jobs.read_events_stream(spark, SF_SMOKE)

    tumbling = _analyzed(jobs.tumbling_counts(stream))
    assert "window" in tumbling and "event_type" in tumbling

    sessions = _analyzed(jobs.session_counts(stream))
    assert "session_window" in sessions and "user_id" in sessions

    stateful = _analyzed(jobs.running_user_stats(stream))
    assert "FlatMapGroupsInPandasWithState" in stateful
    assert "user_id" in stateful

    ssjoin = _analyzed(jobs.clicks_before_purchases(stream))
    # two watermarked sides + an event-time range condition = expirable
    # join state on both sides
    assert ssjoin.count("EventTimeWatermark") == 2
    assert "click_ts" in ssjoin and "purchase_ts" in ssjoin


def test_incremental_admission_plan_shape(spark):
    """The admission plan must show (a) streaming dedup state keyed by
    content_hash and (b) the corpus side as a STATIC subtree (no second
    streaming source — the whole point of the stream-static design: the
    corpus is never treated as unbounded input)."""
    stream = jobs.read_increment_stream(spark, SF_SMOKE)
    df = jobs.incremental_admission(stream, spark, SF_SMOKE)
    plan = _analyzed(df)
    assert "FlatMapGroupsInPandasWithState" in plan and "content_hash" in plan
    assert "LeftAnti" in plan
    assert plan.count("StreamingRelation") == 1, (
        "corpus side must be static, not a second stream"
    )
