"""The redundancy panel — ONE harmonized report across every
granularity the engine dedups at: whole documents (exact text),
synthetic lines (linededup.py), stride-1 token windows (substr.py,
ExactSubstr), and content-defined chunks (cdc.py). Per granularity:

  n_units          occurrence count of units at that granularity
  n_distinct       distinct unit keys
  excess           occurrences beyond each key's first (what content-
                   addressed storage / dedup would remove)
  excess_share     excess / n_units

A training-data pipeline publishes this table to decide WHERE its
redundancy lives before choosing a dedup level: high doc-level excess
calls for exact dedup, high window-level excess with low doc-level
calls for ExactSubstr scrubbing, line-level for boilerplate removal,
chunk-level for content-addressed storage. Every constituent census is
an already-certified subtree (the evalops composition pattern): docs
use the exact-dedup key, lines/windows/chunks reuse the respective
modules' shared builders — so the whole panel carries the full
value-hash gate.

Scale shape: each granularity is one map pass + one hash aggregation
whose output the final rollup reduces to a single row — four censuses,
four exchanges, 4-row result. (The substr window census is the
dominant cost, identical to substr_dup_stats.)

Reference scope: no analog in the reference engine; part of the
training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.operators.cdc import _chunks, _chunks_cte
from dic_a1_spark.operators.linededup import _LINES_CTE, _lines
from dic_a1_spark.operators.substr import _window_hashes, _wins_cte
from dic_a1_spark.sources.readers import load_table


def _level(units_keyed: DataFrame, name: str) -> DataFrame:
    """(granularity, n_units, n_distinct, excess, excess_share) from a
    one-column `k` frame of unit keys (with multiplicity)."""
    return (
        units_keyed.agg(
            F.count("*").alias("n_units"),
            F.countDistinct("k").alias("n_distinct"),
        )
        .select(
            F.lit(name).alias("granularity"),
            "n_units",
            "n_distinct",
            (F.col("n_units") - F.col("n_distinct")).alias("excess"),
            # try_divide: a granularity with ZERO units (e.g. no window
            # reaches the substr width on a tiny-doc corpus) is 0/0 —
            # ANSI `/` THROWS where DuckDB yields NULL (r9 sweep).
            F.round(
                F.try_divide(
                    (F.col("n_units") - F.col("n_distinct")).cast("double"),
                    F.col("n_units").cast("double"),
                ),
                4,
            ).alias("excess_share"),
        )
    )


def redundancy_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 4-row cross-granularity redundancy report. Unit keys:
    document = md5(text) (the exact-dedup key, dedup.py), line =
    line_text, window = xxhash64(window string) (substr.py), chunk =
    chunk content hash (cdc.py)."""
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(F.md5("text").alias("k"))
    lines = _lines(spark, sf_dir).select(F.col("line_text").alias("k"))
    wins = _window_hashes(d).select(F.col("h").alias("k"))
    chunks = _chunks(d).select(F.col("chunk_hash").alias("k"))
    return (
        _level(docs, "document")
        .unionByName(_level(lines, "line"))
        .unionByName(_level(wins, "window"))
        .unionByName(_level(chunks, "chunk"))
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "redundancy_panel": redundancy_panel,
}


def _level_sql(body: str, name: str) -> str:
    """Wrap a self-contained `(SELECT ... AS k ...)`-producing WITH-query
    into the harmonized level row. Each level's WITH is scoped inside
    its own subquery, so CTE names may repeat across levels."""
    return f"""
        SELECT '{name}' AS granularity,
               CAST(count(*) AS BIGINT) AS n_units,
               CAST(count(DISTINCT k) AS BIGINT) AS n_distinct,
               CAST(count(*) - count(DISTINCT k) AS BIGINT) AS excess,
               round(CAST(count(*) - count(DISTINCT k) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE), 4) AS excess_share
        FROM ({body})
    """


def _panel_oracle() -> str:
    # Tokenizer parity lives inside the reused module CTE fragments.
    doc_body = "SELECT md5(text) AS k FROM documents"
    line_body = _LINES_CTE + " SELECT line_text AS k FROM lines"
    win_body = _wins_cte() + " SELECT h AS k FROM wins"
    chunk_body = _chunks_cte() + " SELECT chunk_hash AS k FROM chunks"
    return " UNION ALL ".join(
        [
            _level_sql(doc_body, "document"),
            _level_sql(line_body, "line"),
            _level_sql(win_body, "window"),
            _level_sql(chunk_body, "chunk"),
        ]
    )


ORACLES: dict[str, str] = {
    "redundancy_panel": _panel_oracle(),
}
