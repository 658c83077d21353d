"""Windowed analytics over the `events` stream table (batch semantics).

The reference is batch-only (SURVEY.md §2.8) — this module is the engine's
event-time window surface, expressed so that the SAME aggregations run
unchanged under Structured Streaming (see dic_a1_spark.streaming.jobs,
which reuses these groupings behind readStream + watermark). Checked in
batch mode so the DuckDB oracle applies.

Scale notes: tumbling/sliding windows group on (window, type) — high
cardinality, shuffles fine. Session windows partition by user_id before
island detection; state per key is bounded by the gap, which is exactly
what applyInPandasWithState / session_window need at 100 TB of events.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

_TS = "yyyy-MM-dd HH:mm:ss"


def _tstr(col):
    return F.date_format(col, _TS)


def events_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type: F.window == the canonical
    Structured Streaming tumbling aggregation, run on a static frame."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            _tstr(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h length, 30 min slide): every event lands in
    exactly two windows; Spark materializes that via F.window, the oracle
    via an explicit 2-offset expansion."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            _tstr(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap.
    F.session_window merges an event into the open session when its gap
    from the previous event is AT MOST 10 min — an event landing exactly
    on the session end extends it (verified empirically by the hostile
    exact-gap row in tests/test_events_fuzz.py; the driver corpus never
    lands on the boundary). Window end = last event + gap. The oracle
    reproduces this with gaps-and-islands (lag + running flag sum, new
    session iff gap > 10 min) — the classic SQL encoding of the same
    state machine."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            _tstr(F.col("w.start")).alias("session_start"),
            _tstr(F.col("w.end")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def events_hour_of_day_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day x type activity matrix (time-dimension extraction)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.hour("ts").alias("hour_of_day"),
            "event_type",
        )
        .agg(F.count("*").alias("n_events"))
    )


def events_first_per_user_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest event per (user, type) — the keep-first dedup pattern
    (streaming twin: dropDuplicatesWithinWatermark on the key)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        _tstr(F.min("ts")).alias("first_ts"),
        F.min("event_id").alias("first_event_id"),
        F.count("*").alias("n_events"),
    )


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (percentile_disc picks an actual element,
    so cross-engine float parity is exact — no interpolation arithmetic)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").alias(
            "median_value"
        ),
    )


def events_asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the user's most recent STRICTLY
    PRIOR click (an operator Spark lacks as a primitive; the reference has
    no joins at all beyond a broadcast lookup).

    Composition: one window over (user_id, ordered by ts, event_id) with a
    ROWS ... 1 PRECEDING frame; ``last(CASE WHEN click ...) IGNORE NULLS``
    picks the as-of match. One shuffle on user_id total — no self-join, no
    inequality join, and the frame makes tie behavior explicit where the
    classic sort-merge as-of implementations leave it to the engine.
    """
    e = load_table(spark, sf_dir, "events")
    both = e.where(F.col("event_type").isin("click", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(w)
    return (
        both.withColumn("last_click_ts", click_ts)
        .withColumn("last_click_id", click_id)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            _tstr("ts").alias("purchase_ts"),
            "last_click_id",
            _tstr("last_click_ts").alias("last_click_ts"),
        )
    )


def events_range_join_error_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: per error event, how many clicks the same user made in
    the preceding 5 minutes.

    Spark has no range-join optimizer, and a naive inequality self-join
    plans as a nested-loop cross product. The scalable encoding: bucketize
    time into interval-width buckets, explode the probe side into the two
    buckets it can answer from, equi-join on (user, bucket) — candidate
    space is bounded by true temporal locality — then apply the exact
    range predicate. Same result as the oracle's inequality join, but the
    plan is a plain shuffled equi-join at any scale.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    width = 300  # = the 5-minute range; one bucket behind covers the rest

    errors = e.where(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        (sec / width).cast("long").alias("bucket"),
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .select(
            "user_id",
            F.col("ts").alias("click_ts"),
            F.explode(
                F.array(
                    (sec / width).cast("long"),
                    (sec / width).cast("long") + 1,
                )
            ).alias("bucket"),
        )
    )
    in_range = (
        (F.col("click_ts") < F.col("error_ts"))
        & (F.col("click_ts") >= F.col("error_ts") - F.expr("INTERVAL 5 MINUTES"))
    )
    return (
        errors.join(clicks, ["user_id", "bucket"], "left")
        .groupBy("error_id", "user_id", "error_ts")
        .agg(
            F.count(F.when(in_range, 1)).alias("n_clicks_5min"),
        )
        .select(
            "error_id",
            "user_id",
            _tstr("error_ts").alias("error_ts"),
            "n_clicks_5min",
        )
    )


def events_approx_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw approximate aggregates — the 100 TB substitutes for exact
    distinct counts and exact percentiles (HLL++ and GK-sketch: mergeable,
    bounded memory). Unregistered helper; the registered, oracle-checkable
    form is events_approx_stats below."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median_value"),
        F.count("*").alias("n_events"),
    )


def events_approx_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-error check for the approximate aggregates, expressed as the
    query's own output so the driver can hash-match it.

    The sketch values themselves are engine-specific, so instead of
    emitting them we emit per-group booleans asserting the error bands —
    HLL++ (rsd=2%) within 3 sigma (6%) of the exact distinct count, and
    percentile_approx (accuracy=10000) landing inside the DISCRETE
    p45..p55 rank corridor (the sorted non-null values between 1-based
    ranks ceil(0.45 n) and ceil(0.55 n)) — both computed in the same
    aggregation pass. The corridor must be DISCRETE because the sketch
    always returns an order statistic: against an INTERPOLATED p45..p55
    the claim is simply false for small wide-spread groups (n=2 values
    {1.0, 5.5}: every order statistic is outside the interpolated
    [3.025, 3.475] — found by the r11 time-extremes corpus). The rank
    guarantee is |rank - 0.5 n| <= n/accuracy, inside the corridor for
    all n (verified empirically: small-n returns exactly rank
    ceil(0.5 n)). The sorted collect is certification-only buffering —
    the exact percentile() it replaces buffered the group identically.
    The DuckDB oracle emits TRUE for each band, so a hash match
    certifies the sketch error bounds instead of the old no_oracle
    rows-only check."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.percentile_approx("value", 0.5, 10000).alias("approx_median"),
        F.countDistinct("user_id").alias("exact_users"),
        F.sort_array(F.collect_list("value")).alias("vals"),
        F.count("*").alias("n_events"),
    )
    nv = F.size("vals")
    # F.get is 0-based and returns NULL out-of-range (never an ANSI
    # error), so the empty-group case degrades to NULL -> vacuous truth.
    lo = F.get("vals", F.ceil(nv.cast("double") * 0.45).cast("int") - 1)
    hi = F.get("vals", F.ceil(nv.cast("double") * 0.55).cast("int") - 1)
    return agg.select(
        "event_type",
        "n_events",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.col("exact_users").cast("double") * 0.06
        ).alias("users_in_band"),
        # Vacuous truth for an all-NULL value group: the corridor is
        # NULL, the comparison is NULL, and the oracle's literal TRUE
        # would hash-mismatch (r9 NULL-corpus sweep). An empty error band
        # is not a violated error band.
        F.coalesce(
            (F.col("approx_median") >= lo) & (F.col("approx_median") <= hi),
            F.lit(True),
        ).alias("median_in_band"),
    )


def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly series per event type with zero-filled counts and
    forward-filled (last-observation-carried-forward) hourly averages —
    the gap-filling + LOCF resampling a timeseries store performs before
    charting or feature extraction.

    Scale shape: the dense axis is generated from DIMENSION-sized inputs
    (distinct types x global hour bounds, broadcast), never by exploding
    fact rows; the hourly aggregate is one shuffle on (type, hour); the
    forward fill is a per-type ordered window over the filled axis —
    axis rows = |types| x |hours|, independent of event count. Hours
    before a type's first observation stay NULL (nothing to carry
    forward; the oracle mirrors this)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        # Float discipline: round the SUM (stable across engines at these
        # magnitudes, same device as the window queries above) and divide
        # by the exact count — the quotient of identical doubles is
        # bit-identical in both engines, where round(avg(), 2) is not
        # (Spark rounds the shortest-decimal repr, DuckDB the binary
        # value; measured 56 mismatches at sf0.01).
        (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("h0"),
        F.date_trunc("hour", F.max("ts")).alias("h1"),
    )
    axis = (
        e.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(h0, h1, interval 1 hour)")
            ).alias("h"),
        )
    )
    filled = axis.join(hourly, ["event_type", "h"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        _tstr(F.col("h")).alias("hour"),
        "event_type",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.last("avg_value", ignorenulls=True).over(w).alias("ffill_avg_value"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_gapfill_hourly": events_gapfill_hourly,
    "events_asof_click_before_purchase": events_asof_click_before_purchase,
    "events_range_join_error_clicks": events_range_join_error_clicks,
    "events_approx_stats": events_approx_stats,  # boolean error-band oracle
    "events_tumbling_hour": events_tumbling_hour,
    "events_sliding_window": events_sliding_window,
    "events_session_windows": events_session_windows,
    "events_hour_of_day_matrix": events_hour_of_day_matrix,
    "events_first_per_user_type": events_first_per_user_type,
    "events_value_percentiles": events_value_percentiles,
}

ORACLES: dict[str, str] = {
    # The approx sketches are engine-specific; the query emits boolean
    # error-band verdicts computed against exact values in the same pass,
    # so the oracle's job is just the exact group counts + TRUE bands.
    "events_approx_stats": """
        SELECT event_type,
               count(*) AS n_events,
               TRUE AS users_in_band,
               TRUE AS median_in_band
        FROM events
        GROUP BY event_type
    """,
    "events_asof_click_before_purchase": """
        WITH both_t AS (
            SELECT * FROM events WHERE event_type IN ('click', 'purchase')
        ),
        matched AS (
            SELECT event_id, user_id, ts, event_type,
                   last_value(CASE WHEN event_type = 'click' THEN ts END
                              IGNORE NULLS) OVER w AS last_click_ts,
                   last_value(CASE WHEN event_type = 'click' THEN event_id END
                              IGNORE NULLS) OVER w AS last_click_id
            FROM both_t
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        )
        SELECT event_id AS purchase_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               last_click_id,
               strftime(last_click_ts, '%Y-%m-%d %H:%M:%S') AS last_click_ts
        FROM matched WHERE event_type = 'purchase'
    """,
    "events_range_join_error_clicks": """
        SELECT e.event_id AS error_id, e.user_id,
               strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS error_ts,
               count(c.ts) AS n_clicks_5min
        FROM events e
        LEFT JOIN events c
          ON c.user_id = e.user_id AND c.event_type = 'click'
         AND c.ts < e.ts AND c.ts >= e.ts - INTERVAL '5 minutes'
        WHERE e.event_type = 'error'
        GROUP BY e.event_id, e.user_id, e.ts
    """,
    "events_tumbling_hour": """
        SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
                   AS window_start,
               event_type, count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "events_sliding_window": """
        SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
               count(*) AS n_events, round(sum(value), 2) AS sum_value
        FROM (
            SELECT time_bucket(INTERVAL '30 minutes', ts)
                       - k * INTERVAL '30 minutes' AS ws,
                   value
            FROM events CROSS JOIN (VALUES (0), (1)) offs(k)
        )
        GROUP BY ws
    """,
    "events_session_windows": """
        WITH flagged AS (
            SELECT user_id, ts, event_id, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '10 minutes'
                        THEN 1 ELSE 0 END AS new_session
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        islands AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS session_id
            FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL '10 minutes', '%Y-%m-%d %H:%M:%S')
                   AS session_end,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM islands GROUP BY user_id, session_id
    """,
    "events_hour_of_day_matrix": """
        SELECT CAST(hour(ts) AS INTEGER) AS hour_of_day, event_type,
               count(*) AS n_events
        FROM events GROUP BY 1, 2
    """,
    "events_first_per_user_type": """
        SELECT user_id, event_type,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
               min(event_id) AS first_event_id,
               count(*) AS n_events
        FROM events GROUP BY user_id, event_type
    """,
    "events_value_percentiles": """
        SELECT event_type,
               min(value) AS min_value,
               max(value) AS max_value,
               percentile_disc(0.5) WITHIN GROUP (ORDER BY value) AS median_value
        FROM events GROUP BY event_type
    """,
}

ORACLES["events_gapfill_hourly"] = """
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h, event_type,
               count(*) AS n_events,
               round(sum(value), 2) / count(*) AS avg_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events
    ),
    axis AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR))
                        AS h FROM bounds) g
    ),
    filled AS (
        SELECT a.event_type, a.h, y.n_events, y.avg_value
        FROM axis a LEFT JOIN hourly y
          ON a.event_type = y.event_type AND a.h = y.h
    )
    SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
           CAST(coalesce(n_events, 0) AS BIGINT) AS n_events,
           last_value(avg_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY h
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS ffill_avg_value
    FROM filled
"""


def events_funnel_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis: per user, the first 'view', the first
    'click' strictly after that view WITHIN 24 hours, and the first
    'purchase' strictly after that click within 24 hours — the
    product-analytics primitive behind every conversion report. The step
    deadline is what makes the funnel a funnel: without it every user
    with 67 events over a month trivially completes all steps (depth
    distribution at sf0.01 is 90/35/25 across depths 1/2/3 with the
    deadline, 0/0/150 without).

    Shape: ONE shuffle on user_id, then three layered window minima over
    the same partitioning (Catalyst chains the Window operators without
    re-exchanging) and a per-user aggregate. The naive formulation is
    three self-joins of the events table — 3 extra scans + 3 shuffles —
    which this deliberately avoids; at 100 TB of events the single
    user-partitioned pass is the only viable plan. Oracle restates it
    with step-wise joins (fine at oracle scale) for independence."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    step1 = e.withColumn(
        "t1", F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    )
    deadline = F.expr("INTERVAL 24 HOURS")
    step2 = step1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") > F.col("t1"))
                & (F.col("ts") <= F.col("t1") + deadline),
                F.col("ts"),
            )
        ).over(w),
    )
    step3 = step2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") > F.col("t2"))
                & (F.col("ts") <= F.col("t2") + deadline),
                F.col("ts"),
            )
        ).over(w),
    )
    per_user = step3.groupBy("user_id").agg(
        F.min("t1").alias("t1"), F.min("t2").alias("t2"), F.min("t3").alias("t3")
    )
    depth = (
        F.when(F.col("t3").isNotNull(), 3)
        .when(F.col("t2").isNotNull(), 2)
        .when(F.col("t1").isNotNull(), 1)
        .otherwise(0)
    )
    return per_user.select(
        "user_id",
        _tstr(F.col("t1")).alias("view_ts"),
        _tstr(F.col("t2")).alias("click_ts"),
        _tstr(F.col("t3")).alias("purchase_ts"),
        depth.alias("funnel_depth"),
    )


QUERIES["events_funnel_depth"] = events_funnel_depth

ORACLES["events_funnel_depth"] = f"""
    WITH s1 AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        FROM events GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          AND e.ts <= s2.t2 + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT s1.user_id,
           strftime(t1, '%Y-%m-%d %H:%M:%S') AS view_ts,
           strftime(t2, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(t3, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           CASE WHEN t3 IS NOT NULL THEN 3
                WHEN t2 IS NOT NULL THEN 2
                WHEN t1 IS NOT NULL THEN 1
                ELSE 0 END AS funnel_depth
    FROM s1
    LEFT JOIN s2 USING (user_id)
    LEFT JOIN s3 USING (user_id)
"""


# --- round 6: retention cohorts + DAU/WAU stickiness -------------------


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by their first active day,
    distinct-user counts at each day offset, and the retention rate vs
    the cohort's size.

    Scale shape: the (user, day) activity grid is ONE distinct
    aggregation (map-side combine collapses repeat events); first-day
    per user reuses the same shuffle key; the cohort join is
    co-partitioned on user_id; the final census is dimension-sized
    (days x offsets). No corpus-sized window, no broadcast of a
    user-proportional frame."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    # `first` is one row per user, `days` one row per (user, day):
    # plain counts are exact and skip Spark's distinct-agg expansion on
    # the corpus-proportional frames (reviewer-flagged). Only wau below
    # genuinely needs a distinct.
    sizes = first.groupBy("cohort_day").agg(
        F.count("*").cast("bigint").alias("cohort_size")
    )
    cells = (
        days.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("day", F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )
    return cells.join(sizes, "cohort_day").select(
        F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
        "day_offset",
        "n_users",
        "cohort_size",
        F.round(
            F.col("n_users").cast("double") / F.col("cohort_size").cast("double"),
            4,
        ).alias("retention"),
    )


def events_dau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day DAU, trailing-7-day WAU, and the DAU/WAU stickiness
    ratio. The rolling distinct is NOT a window function (distinct over
    a sliding range would hold per-day user sets in window state):
    each (user, day) activity row fans out map-only to the 7 report
    days it supports, and WAU is then a plain per-day distinct count —
    partial aggregation collapses duplicates before the shuffle.
    Report days are restricted to days with actual activity (no
    zero-DAU gap rows — gap-filling is events_gapfill_hourly's job)."""
    e = load_table(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    dau = days.groupBy("day").agg(F.count("*").cast("bigint").alias("dau"))
    support = days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("report_day"),
    )
    wau = (
        support.groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .withColumnRenamed("report_day", "day")
    )
    return dau.join(wau, "day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "dau",
        "wau",
        F.round(
            F.col("dau").cast("double") / F.col("wau").cast("double"), 4
        ).alias("stickiness"),
    )


QUERIES["events_retention_cohorts"] = events_retention_cohorts
QUERIES["events_dau_stickiness"] = events_dau_stickiness

ORACLES["events_retention_cohorts"] = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    first AS (
        SELECT user_id, min(day) AS cohort_day FROM days GROUP BY user_id
    ),
    sizes AS (
        SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
        FROM first GROUP BY cohort_day
    ),
    cells AS (
        SELECT f.cohort_day,
               CAST(datediff('day', f.cohort_day, d.day) AS INTEGER)
                   AS day_offset,
               CAST(count(*) AS BIGINT) AS n_users
        FROM days d JOIN first f USING (user_id)
        GROUP BY 1, 2
    )
    SELECT strftime(c.cohort_day, '%Y-%m-%d') AS cohort_day,
           c.day_offset, c.n_users, s.cohort_size,
           round(CAST(c.n_users AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 4)
               AS retention
    FROM cells c JOIN sizes s USING (cohort_day)
"""

ORACLES["events_dau_stickiness"] = """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau
        FROM days GROUP BY day
    ),
    support AS (
        SELECT user_id,
               CAST(unnest(generate_series(day, day + INTERVAL 6 DAY,
                                           INTERVAL 1 DAY)) AS DATE)
                   AS report_day
        FROM days
    ),
    wau AS (
        SELECT report_day AS day,
               CAST(count(DISTINCT user_id) AS BIGINT) AS wau
        FROM support GROUP BY report_day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
           round(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 4)
               AS stickiness
    FROM dau d JOIN wau w USING (day)
"""


ANOMALY_Z = 2.0  # hourly-volume anomaly threshold in stddevs


def events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly volume anomalies: (event_type, hour, n_events,
    z_r, anomaly) — each observed hour's event count z-scored against
    its type's hourly distribution. The on-call volume-spike report.

    Float parity is the quality_outlier_zscore recipe (corpusops.py):
    n / sum / sum-of-squares are exact bigints per type; mean, variance
    and z are derived in ONE identically-associated float expression in
    both engines (never an engine's own stddev — internal summation
    orders differ). Statistics run over OBSERVED hours only; the
    zero-filled series is events_gapfill_hourly's job.

    Scale shape: one shuffle on (event_type, hour) with map-side
    combine; the per-type stats frame is dimension-sized and broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count("*").alias("n_events"))
    stats = hourly.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum("n_events").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).alias("ss"),
    )
    joined = hourly.join(F.broadcast(stats), "event_type")
    mean = F.col("s").cast("double") / F.col("cnt").cast("double")
    var = (
        F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("cnt").cast("double")
    ) / (F.col("cnt") - F.lit(1)).cast("double")
    z = F.when(
        (F.col("cnt") > 1) & (var > 0),
        (F.col("n_events").cast("double") - mean) / F.sqrt(var),
    ).otherwise(F.lit(0.0))
    return joined.select(
        "event_type",
        _tstr(F.col("hour")).alias("hour"),
        "n_events",
        F.round(z, 4).alias("z_r"),
        (F.abs(z) > F.lit(ANOMALY_Z)).alias("anomaly"),
    )


QUERIES["events_hourly_anomaly"] = events_hourly_anomaly

ORACLES["events_hourly_anomaly"] = f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS cnt,
               CAST(sum(n_events) AS BIGINT) AS s,
               CAST(sum(n_events * n_events) AS BIGINT) AS ss
        FROM hourly GROUP BY event_type
    )
    SELECT h.event_type, strftime(h.hour, '%Y-%m-%d %H:%M:%S') AS hour,
           h.n_events,
           round(CASE WHEN st.cnt > 1 AND
                      (CAST(st.ss AS DOUBLE)
                       - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                         / CAST(st.cnt AS DOUBLE))
                      / CAST(st.cnt - 1 AS DOUBLE) > 0
                 THEN (CAST(h.n_events AS DOUBLE)
                       - CAST(st.s AS DOUBLE) / CAST(st.cnt AS DOUBLE))
                      / sqrt((CAST(st.ss AS DOUBLE)
                              - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                                / CAST(st.cnt AS DOUBLE))
                             / CAST(st.cnt - 1 AS DOUBLE))
                 ELSE 0.0 END, 4) AS z_r,
           CASE WHEN st.cnt > 1 AND
                     (CAST(st.ss AS DOUBLE)
                      - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                        / CAST(st.cnt AS DOUBLE))
                     / CAST(st.cnt - 1 AS DOUBLE) > 0
                THEN abs((CAST(h.n_events AS DOUBLE)
                          - CAST(st.s AS DOUBLE) / CAST(st.cnt AS DOUBLE))
                         / sqrt((CAST(st.ss AS DOUBLE)
                                 - CAST(st.s AS DOUBLE) * CAST(st.s AS DOUBLE)
                                   / CAST(st.cnt AS DOUBLE))
                                / CAST(st.cnt - 1 AS DOUBLE)))
                     > {ANOMALY_Z}
                ELSE FALSE END AS anomaly
    FROM hourly h JOIN stats st USING (event_type)
"""
