"""Last-touch purchase attribution over the events stream — the
marketing-analytics classic: each purchase is credited to the SAME
user's most recent preceding non-purchase event within the attribution
window; purchases with no such event are 'direct'. Composes the events
family's as-of machinery (events.py's asof join) into a revenue rollup.

Determinism: "most recent preceding" ties on timestamp are broken by
event_id (the ADVICE lesson on events_session_windows). The preceding
event is found with a running MAX over a sortable string encoding
(zero-padded epoch-micros | zero-padded event_id | type) — a plain
max() both engines implement identically, avoiding engine-specific
struct-comparison semantics in window aggregates.

All arithmetic is exact: the gap is integer seconds (epoch-micros
difference div 1_000_000 — both engines truncate toward zero on
BIGINT division, verified); revenue sums round a DOUBLE sum of raw
`value` inputs — order-independent here because each (type) group's
values are summed through a SORTED collected fold (the repo's pinned-
association rule).

Scale shape at 100 TB: ONE shuffle keyed by user_id for the running
window (the sessionization shape — per-user event streams are the
natural partition), then a dimension-keyed rollup over one row per
purchase. No self-joins: the as-of lookup is a window aggregate, so a
user with N events costs N log N sort, not N^2 pairs.

Reference scope: no event surface in the reference; part of the
training-data-pipeline extension (events analytics family).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

# Attribution window: a preceding event older than this is not credited.
ATTR_WINDOW_S = 3600
DIRECT = "direct"

# Sortable encoding widths: the ts field is epoch-micros BIASED by
# +10^18 so pre-1970 rows (negative epochs — real in any 100 TB log
# after enough ingestion bugs; the r11 time-extremes corpus) stay
# lexicographically ordered: an unbiased negative would both sort '-'
# below digits and reverse order among negatives. The bias covers
# timestamps back to ~29000 BCE and forward to year ~262000 (int64
# headroom), i.e. every timestamp either engine can represent in
# practice; biased values are < 10^19, fitting _TS_W = 20. event_id
# < 10^12 at any SF this repo sees. The widths are ENFORCED, not
# assumed: lpad silently truncates a wider value (corrupting the
# running-max order identically in both engines, so parity would stay
# green while the answer is wrong — the ADVICE finding), so the enc
# expression asserts both fields fit and fails the job loudly instead.
_TS_W = 20
_TS_BIAS = 10**18
_ID_W = 12
# Type field starts right after "<ts>|<id>|" — a FIXED offset, so the
# decode never counts pipes (an event_type containing '|' decodes
# intact, and the oracle uses the same substring, not split_part).
_TYPE_POS = _TS_W + _ID_W + 3

# Epoch-micros of a TIMESTAMP_NTZ: unix_micros() rejects NTZ, so use
# timestampdiff from the NTZ epoch — DuckDB's epoch_us(naive) twin.
_EPOCH_US_SQL = (
    "timestampdiff(MICROSECOND,"
    " TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
)


def _attributed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per purchase: (purchase_id, user_id, purchase_ts,
    value, attributed_type, attributed_event_id, gap_s)."""
    e = load_table(spark, sf_dir, "events")
    # Loud width guard: assert_true throws on the first out-of-range
    # row (evaluated via the when-condition trick so it stays in the
    # projection without changing any value).
    width_ok = F.assert_true(
        (F.col("event_id") >= 0)
        & (F.col("event_id") < F.lit(10**_ID_W).cast("bigint"))
        & (F.expr(_EPOCH_US_SQL) >= F.lit(-_TS_BIAS).cast("bigint"))
        & (F.expr(_EPOCH_US_SQL) <= F.lit(8 * 10**18).cast("bigint")),
        F.lit(
            f"attribution enc overflow: event_id must be in"
            f" [0, 10^{_ID_W}) and biased epoch-micros must fit"
            f" {_TS_W} digits"
        ),
    )
    enc = F.when(
        (F.col("event_type") != "purchase") & width_ok.isNull(),
        F.concat(
            F.lpad(
                F.expr(f"({_EPOCH_US_SQL}) + {_TS_BIAS}").cast("string"),
                _TS_W,
                "0",
            ),
            F.lit("|"),
            F.lpad(F.col("event_id").cast("string"), _ID_W, "0"),
            F.lit("|"),
            F.col("event_type"),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = e.select(
        "event_id", "user_id", "ts", "event_type", "value", enc.alias("enc")
    ).withColumn("last_enc", F.max("enc").over(w))
    purchases = flagged.where(F.col("event_type") == "purchase")
    # Both sides of the gap are biased, so the bias cancels exactly.
    gap_s = F.expr(
        f"(({_EPOCH_US_SQL}) + {_TS_BIAS}"
        f" - CAST(substring(last_enc, 1, {_TS_W})"
        f" AS BIGINT)) div 1000000"
    )
    in_window = F.col("last_enc").isNotNull() & (
        gap_s <= F.lit(ATTR_WINDOW_S)
    )
    return purchases.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
        "value",
        F.when(
            in_window,
            F.expr(f"substring(last_enc, {_TYPE_POS})"),
        )
        .otherwise(F.lit(DIRECT))
        .alias("attributed_type"),
        F.when(
            in_window,
            F.substring("last_enc", _TS_W + 2, _ID_W).cast("bigint"),
        )
        .otherwise(F.lit(None).cast("bigint"))
        .alias("attributed_event_id"),
        F.when(in_window, gap_s)
        .otherwise(F.lit(None).cast("bigint"))
        .alias("gap_s"),
    )


def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-purchase attribution table itself."""
    return _attributed(spark, sf_dir)


def events_attribution_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(attributed_type, n_purchases, sum_value_r, avg_gap_s_r): revenue
    credit by channel. The value sum folds a SORTED collected array
    (pinned association); the gap mean is one exact integer division
    pair."""
    a = _attributed(spark, sf_dir)
    # NULL-value semantics = SQL SUM (r9 NULL-corpus sweep): NULL revenue
    # rows are excluded from the fold (collect_list already skips them;
    # the oracle adds FILTER (value IS NOT NULL) since DuckDB's list()
    # KEEPS NULLs and one NULL poisons the whole reduce), and a group
    # with no non-NULL revenue sums to NULL, not 0.0.
    agg = a.groupBy("attributed_type").agg(
        F.count("*").cast("bigint").alias("n_purchases"),
        F.count("value").cast("bigint").alias("n_values"),
        F.aggregate(
            F.array_sort(F.collect_list("value")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sum_value"),
        F.sum("gap_s").cast("bigint").alias("gap_total"),
        F.sum(F.col("gap_s").isNotNull().cast("bigint"))
        .cast("bigint")
        .alias("gap_n"),
    )
    return agg.select(
        "attributed_type",
        "n_purchases",
        F.when(
            F.col("n_values") > 0, F.round("sum_value", 2)
        ).otherwise(F.lit(None).cast("double")).alias("sum_value_r"),
        F.when(
            F.col("gap_n") > 0,
            F.round(
                F.col("gap_total").cast("double")
                / F.col("gap_n").cast("double"),
                4,
            ),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("avg_gap_s_r"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_attribution": events_attribution,
    "events_attribution_rollup": events_attribution_rollup,
}

_ATTR_CTE = f"""
    flagged AS (
        SELECT event_id, user_id, ts, event_type, value,
               max(CASE WHEN event_type <> 'purchase'
                   THEN lpad(CAST(epoch_us(ts) + {_TS_BIAS} AS VARCHAR),
                             {_TS_W}, '0')
                        || '|' || lpad(CAST(event_id AS VARCHAR),
                                       {_ID_W}, '0')
                        || '|' || event_type
                   END) OVER (
                   PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS last_enc
        FROM events
    ),
    attributed AS (
        SELECT event_id AS purchase_id, user_id,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
               value,
               CASE WHEN last_enc IS NOT NULL
                         AND (epoch_us(ts) + {_TS_BIAS}
                              - CAST(substring(last_enc, 1, {_TS_W})
                                     AS BIGINT)) // 1000000
                             <= {ATTR_WINDOW_S}
                    THEN substring(last_enc, {_TYPE_POS})
                    ELSE '{DIRECT}' END AS attributed_type,
               CASE WHEN last_enc IS NOT NULL
                         AND (epoch_us(ts) + {_TS_BIAS}
                              - CAST(substring(last_enc, 1, {_TS_W})
                                     AS BIGINT)) // 1000000
                             <= {ATTR_WINDOW_S}
                    THEN CAST(substring(last_enc, {_TS_W} + 2, {_ID_W})
                              AS BIGINT)
                    ELSE NULL END AS attributed_event_id,
               CASE WHEN last_enc IS NOT NULL
                         AND (epoch_us(ts) + {_TS_BIAS}
                              - CAST(substring(last_enc, 1, {_TS_W})
                                     AS BIGINT)) // 1000000
                             <= {ATTR_WINDOW_S}
                    THEN (epoch_us(ts) + {_TS_BIAS}
                          - CAST(substring(last_enc, 1, {_TS_W})
                                 AS BIGINT)) // 1000000
                    ELSE NULL END AS gap_s
        FROM flagged WHERE event_type = 'purchase'
    )
"""

ORACLES: dict[str, str] = {
    "events_attribution": f"""
        WITH {_ATTR_CTE}
        SELECT * FROM attributed
    """,
    "events_attribution_rollup": f"""
        WITH {_ATTR_CTE}
        SELECT attributed_type,
               CAST(count(*) AS BIGINT) AS n_purchases,
               CASE WHEN count(value) > 0
                    THEN round(list_reduce(list_sort(
                             list(value) FILTER (value IS NOT NULL)),
                             (a, b) -> a + b), 2)
                    ELSE NULL END AS sum_value_r,
               CASE WHEN count(gap_s) > 0
                    THEN round(CAST(sum(gap_s) AS DOUBLE)
                               / CAST(count(gap_s) AS DOUBLE), 4)
                    ELSE NULL END AS avg_gap_s_r
        FROM attributed GROUP BY attributed_type
    """,
}
