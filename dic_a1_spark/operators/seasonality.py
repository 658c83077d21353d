"""Seasonal event-traffic profiles — the day-of-week × hour-of-day
panels an event pipeline maintains next to the anomaly/gap-fill views
(events.py): weekly seasonality is the baseline every volume alert is
judged against, and per-type seasonal deviation flags event families
whose weekly rhythm diverges from the site-wide pattern (bot traffic,
batch jobs masquerading as users).

Day-of-week convention: dow = (date - 1970-01-05) mod 7, 0 = Monday —
an EPOCH-ANCHORED formula because the engines' native dayofweek()
disagree (Spark: 1 = Sunday; DuckDB: 0 = Sunday), and an explicit
anchor is self-documenting where a +5 offset is not.

Float parity: counts and sums are BIGINT; shares are single exact
divisions; the weekend lift is ONE cross-multiplied ratio
(n_weekend * 5) / (n_weekday * 2) — rate-per-day ratio without
intermediate division; the L1 seasonal deviation folds its 7 per-dow
share differences through the repo's sorted sequential fold (the
mixing.py `_w_total` rule).

Scale shape at 100 TB: every query is one partial-agg shuffle keyed by
(event_type?, dow, hour) — at most |types| × 168 result rows; map-side
combine collapses the event stream before any exchange; the
deviation/lift joins run on those dimension-sized censuses.

Reference scope: the reference engine has no event surface; part of the
training-data-pipeline extension (events analytics family, cf.
events.py's tumbling/session/anomaly operators).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

# Monday anchor for the epoch-day dow formula (1970-01-05 was a Monday).
_DOW_ANCHOR = "1970-01-05"
# dow values counted as weekend under the Monday=0 convention.
_WEEKEND = (5, 6)


def _dow() -> F.Column:
    return (
        F.datediff(F.to_date("ts"), F.lit(_DOW_ANCHOR).cast("date")) % 7
    ).cast("bigint")


_DOW_SQL = f"(CAST(ts AS DATE) - DATE '{_DOW_ANCHOR}') % 7"


def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(dow, hour_of_day, n_events, share_r): the 7×24 weekly heatmap
    with each cell's share of total traffic."""
    e = load_table(spark, sf_dir, "events")
    cen = e.groupBy(
        _dow().alias("dow"),
        F.hour("ts").cast("bigint").alias("hour_of_day"),
    ).agg(F.count("*").cast("bigint").alias("n_events"))
    tot = cen.agg(F.sum("n_events").cast("bigint").alias("total"))
    return cen.crossJoin(F.broadcast(tot)).select(
        "dow",
        "hour_of_day",
        "n_events",
        F.round(
            F.col("n_events").cast("double") / F.col("total").cast("double"),
            6,
        ).alias("share_r"),
    )


def events_weekend_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_weekday, n_weekend, lift_r): per-day weekend/
    weekday rate ratio — lift > 1 means the type over-indexes on
    weekends. One cross-multiplied division for parity."""
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        "event_type", _dow().isin(*_WEEKEND).alias("is_we")
    )
    agg = wk.groupBy("event_type").agg(
        F.sum((~F.col("is_we")).cast("bigint")).cast("bigint").alias(
            "n_weekday"
        ),
        F.sum(F.col("is_we").cast("bigint")).cast("bigint").alias(
            "n_weekend"
        ),
    )
    return agg.select(
        "event_type",
        "n_weekday",
        "n_weekend",
        # try_divide: a type seen ONLY on weekends has n_weekday = 0 —
        # ANSI `/` THROWS where DuckDB yields NULL (r9 NULL-corpus
        # sweep; the planted corpus starts on a Saturday).
        F.round(
            F.try_divide(
                F.col("n_weekend").cast("double") * F.lit(5.0),
                F.col("n_weekday").cast("double") * F.lit(2.0),
            ),
            6,
        ).alias("lift_r"),
    )


def events_seasonal_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_events, l1_dev_r, peak_dow): L1 distance between
    the type's dow-share vector and the global dow-share vector (7
    terms, sorted fold), plus the type's peak day (argmax count, ties
    by dow ASC)."""
    e = load_table(spark, sf_dir, "events")
    # The (type, dow) census is |types|*7 rows and feeds FOUR consumers
    # (type totals, global census, diffs, peak) — checkpoint it so the
    # event stream is aggregated exactly once.
    cen = e.groupBy("event_type", _dow().alias("dow")).agg(
        F.count("*").cast("bigint").alias("c")
    ).localCheckpoint()
    t_tot = cen.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("ct")
    )
    g_cen = cen.groupBy("dow").agg(F.sum("c").cast("bigint").alias("g"))
    g_tot = g_cen.agg(F.sum("g").cast("bigint").alias("gt"))
    diffs = (
        cen.join(t_tot, "event_type")
        .join(F.broadcast(g_cen), "dow")
        .crossJoin(F.broadcast(g_tot))
        .select(
            "event_type",
            "dow",
            "c",
            "ct",
            F.abs(
                F.col("c").cast("double") / F.col("ct").cast("double")
                - F.col("g").cast("double") / F.col("gt").cast("double")
            ).alias("d"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(F.desc("c"), F.asc("dow"))
    peak = (
        diffs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", F.col("dow").alias("peak_dow"))
    )
    dev = diffs.groupBy("event_type", "ct").agg(
        F.aggregate(
            F.array_sort(F.collect_list("d")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("l1"),
    )
    return dev.join(peak, "event_type").select(
        "event_type",
        F.col("ct").alias("n_events"),
        F.round("l1", 6).alias("l1_dev_r"),
        "peak_dow",
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_dow_hour_profile": events_dow_hour_profile,
    "events_weekend_lift": events_weekend_lift,
    "events_seasonal_deviation": events_seasonal_deviation,
}

ORACLES: dict[str, str] = {
    "events_dow_hour_profile": f"""
        WITH cen AS (
            SELECT CAST({_DOW_SQL} AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hour_of_day,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM events GROUP BY 1, 2
        ),
        tot AS (SELECT CAST(sum(n_events) AS BIGINT) AS total FROM cen)
        SELECT dow, hour_of_day, n_events,
               round(CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE), 6)
                   AS share_r
        FROM cen CROSS JOIN tot
    """,
    "events_weekend_lift": f"""
        WITH agg AS (
            SELECT event_type,
                   CAST(sum(CASE WHEN {_DOW_SQL} IN (5, 6)
                                 THEN 0 ELSE 1 END) AS BIGINT) AS n_weekday,
                   CAST(sum(CASE WHEN {_DOW_SQL} IN (5, 6)
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_weekend
            FROM events GROUP BY event_type
        )
        SELECT event_type, n_weekday, n_weekend,
               round((CAST(n_weekend AS DOUBLE) * 5.0)
                     / (CAST(n_weekday AS DOUBLE) * 2.0), 6) AS lift_r
        FROM agg
    """,
    "events_seasonal_deviation": f"""
        WITH cen AS (
            SELECT event_type, CAST({_DOW_SQL} AS BIGINT) AS dow,
                   CAST(count(*) AS BIGINT) AS c
            FROM events GROUP BY 1, 2
        ),
        t_tot AS (
            SELECT event_type, CAST(sum(c) AS BIGINT) AS ct
            FROM cen GROUP BY event_type
        ),
        g_cen AS (
            SELECT dow, CAST(sum(c) AS BIGINT) AS g FROM cen GROUP BY dow
        ),
        g_tot AS (SELECT CAST(sum(g) AS BIGINT) AS gt FROM g_cen),
        diffs AS (
            SELECT cen.event_type, cen.dow, cen.c, t.ct,
                   abs(CAST(cen.c AS DOUBLE) / CAST(t.ct AS DOUBLE)
                       - CAST(gc.g AS DOUBLE) / CAST(gt.gt AS DOUBLE)) AS d
            FROM cen
            JOIN t_tot t USING (event_type)
            JOIN g_cen gc USING (dow)
            CROSS JOIN g_tot gt
        ),
        peak AS (
            SELECT event_type, dow AS peak_dow
            FROM (
                SELECT event_type, dow,
                       row_number() OVER (
                           PARTITION BY event_type
                           ORDER BY c DESC, dow ASC
                       ) AS rn
                FROM diffs
            ) WHERE rn = 1
        ),
        dev AS (
            SELECT event_type, ct,
                   list_reduce(list_sort(list(d)), (a, b) -> a + b) AS l1
            FROM diffs GROUP BY event_type, ct
        )
        SELECT d.event_type, d.ct AS n_events,
               round(d.l1, 6) AS l1_dev_r, p.peak_dow
        FROM dev d JOIN peak p USING (event_type)
    """,
}
