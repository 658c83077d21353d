"""Corpus-level line deduplication over the `documents` table — the
CCNet / RefinedWeb pre-training scrub: a "line" that recurs across many
documents is boilerplate (headers, footers, cookie banners) and is
removed from EVERY document before training, preserving the order of the
surviving lines.

The driver's synthetic documents are single-line word salad, so the
operators run over DETERMINISTIC SYNTHETIC LINES: the shared tokenizer's
token array is chopped into consecutive LINE_LEN-token windows (the last
window may be short). With the driver's ~31-word vocabulary this yields a
real duplicate distribution at sf0.01 (34% of line instances recur across
>=2 docs) — both the kept and dropped branches are exercised, per the
Q11-vacuity rule. On a real corpus the same plan applies with
split(text, '\\n') as the line source.

Scale shape (the reason line dedup works at 100 TB):
  1. Line construction is a pure map over the scan — tokenize + slice are
     array expressions, zero shuffles (a posexplode widens rows but stays
     in the stage).
  2. The duplicate census is ONE hash aggregation keyed by line text —
     partial aggregation combines map-side, so the shuffle carries
     (line, partial count) not raw instances.
  3. The kept-filter is a shuffle join on the same key (both sides are
     corpus-proportional: NO broadcast hint — the lexical.py rule), and
     reassembly is one groupBy(doc_id) whose collect_list is bounded by
     the document length, not the corpus.
  Total: two shuffles, both on keys with no skew amplification (a hot
  boilerplate line aggregates to ONE census row before the join).

Reference scope: the reference engine (mrjob WordCount/ChiSquared,
src/wordCountJob.py) has no corpus-dedup surface; this module is part of
the training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# Tokens per synthetic line. 3 is calibrated to the driver vocabulary:
# 31^3 ~ 30K possible lines vs ~9K instances at sf0.01 keeps BOTH the
# kept and dropped branches populated (1-token lines would drop ~100%,
# 12-token lines ~0%).
LINE_LEN = 3
# A line is boilerplate when it appears in >= DUP_DOCS DISTINCT documents
# (within-document repeats alone never drop a line — the census is
# count(DISTINCT doc_id), the CCNet cross-document rule).
DUP_DOCS = 2
# Hot-line report size.
HOT_K = 20


def _doc_lines_of(docs: DataFrame) -> DataFrame:
    """(doc_id, toks, n_lines) from any (doc_id, text)-shaped frame —
    batch scan or stream alike (pure map, so the streaming twin in
    streaming/jobs.py reuses it unchanged)."""
    return docs.select(
        "doc_id", tokens_nonempty(F.col("text")).alias("toks")
    ).select(
        "doc_id",
        "toks",
        F.expr(f"(size(toks) + {LINE_LEN - 1}) div {LINE_LEN}").alias("n_lines"),
    )


def _doc_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, toks, n_lines): the pre-explode per-document frame.
    Map-only over the scan — reused by line_dedup_kept so per-doc
    n_lines never requires re-aggregating the exploded line frame."""
    return _doc_lines_of(load_table(spark, sf_dir, "documents"))


def _lines_of(docs: DataFrame) -> DataFrame:
    """(doc_id, line_pos, line_text) from any (doc_id, text) frame."""
    tok = _doc_lines_of(docs)
    return (
        tok.where(F.col("n_lines") > 0)
        .select(
            "doc_id",
            "n_lines",
            F.explode(F.sequence(F.lit(0), F.col("n_lines") - 1)).alias("line_pos"),
            "toks",
        )
        .select(
            "doc_id",
            "n_lines",
            "line_pos",
            F.array_join(
                F.slice(
                    F.col("toks"),
                    (F.col("line_pos") * LINE_LEN + 1).cast("int"),
                    LINE_LEN,
                ),
                " ",
            ).alias("line_text"),
        )
    )


def _lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, line_pos, line_text): the deterministic synthetic-line
    view over the batch scan. Map-only: tokenize -> window count ->
    slice, no shuffle."""
    return _lines_of(load_table(spark, sf_dir, "documents"))


def _census(lines: DataFrame) -> DataFrame:
    """Per-line duplicate census: (line_text, n_docs, n_inst). One hash
    aggregation; map-side combine collapses hot boilerplate lines before
    the shuffle, so skew cannot amplify."""
    return lines.groupBy("line_text").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_inst"),
    )


def line_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document cleaned text after corpus line dedup: lines occurring
    in >= DUP_DOCS distinct documents are removed everywhere; survivors
    are rejoined in original order. Documents whose every line was
    boilerplate survive with empty text_clean (they are downstream
    length-filter fodder, not silently dropped rows)."""
    lines = _lines(spark, sf_dir)
    kept = lines.join(
        _census(lines).where(F.col("n_docs") < DUP_DOCS).select("line_text"),
        "line_text",
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_pos", "line_text"))),
                lambda s: s["line_text"],
            ),
            " ",
        ).alias("text_clean"),
    )
    # Per-doc n_lines comes from the pre-explode frame: a map-only scan,
    # not a groupBy over the exploded lines (saves a corpus-sized shuffle).
    base = (
        _doc_lines(spark, sf_dir)
        .where(F.col("n_lines") > 0)
        .select("doc_id", "n_lines")
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
        )
    )


def line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level summary of the scrub: one row."""
    lines = _lines(spark, sf_dir)
    st = _census(lines)
    return st.agg(
        F.count("*").alias("distinct_lines"),
        F.sum((F.col("n_docs") >= DUP_DOCS).cast("long")).alias("dup_lines"),
        F.sum("n_inst").alias("total_instances"),
        F.sum(
            F.when(F.col("n_docs") >= DUP_DOCS, F.col("n_inst")).otherwise(0)
        ).alias("dropped_instances"),
        F.round(
            F.sum(
                F.when(F.col("n_docs") < DUP_DOCS, F.col("n_inst")).otherwise(0)
            ).cast("double")
            / F.sum("n_inst").cast("double"),
            4,
        ).alias("kept_ratio"),
    )


def line_dedup_hot_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HOT_K most widely shared lines — the boilerplate audit a
    curation run publishes alongside the scrub. Deterministic order:
    (n_docs desc, n_inst desc, line_text asc); line_text is unique so the
    cut at HOT_K is stable."""
    return (
        _census(_lines(spark, sf_dir))
        .where(F.col("n_docs") >= DUP_DOCS)
        .orderBy(F.desc("n_docs"), F.desc("n_inst"), F.asc("line_text"))
        .limit(HOT_K)
        .select("line_text", "n_docs", "n_inst")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "line_dedup_kept": line_dedup_kept,
    "line_dedup_stats": line_dedup_stats,
    "line_dedup_hot_lines": line_dedup_hot_lines,
}

_TOKS = duckdb_tokens_sql()

# Shared synthetic-line + census CTE fragment. list_slice bounds are
# 1-based inclusive (= Spark slice(start, LINE_LEN)); range() is 0-based
# exclusive (= Spark sequence(0, n_lines-1)).
_LINES_CTE = f"""
    WITH tok AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    numbered AS (
        SELECT doc_id, toks,
               (len(toks) + {LINE_LEN - 1}) // {LINE_LEN} AS n_lines
        FROM tok WHERE (len(toks) + {LINE_LEN - 1}) // {LINE_LEN} > 0
    ),
    exploded AS (
        SELECT doc_id, n_lines, toks, unnest(range(n_lines)) AS line_pos
        FROM numbered
    ),
    lines AS (
        SELECT doc_id, n_lines, line_pos,
               array_to_string(
                   list_slice(toks, line_pos * {LINE_LEN} + 1,
                              line_pos * {LINE_LEN} + {LINE_LEN}), ' '
               ) AS line_text
        FROM exploded
    ),
    census AS (
        SELECT line_text,
               count(DISTINCT doc_id) AS n_docs,
               count(*) AS n_inst
        FROM lines GROUP BY line_text
    )
"""

ORACLES: dict[str, str] = {
    "line_dedup_kept": _LINES_CTE
    + f"""
    , kept AS (
        SELECT l.doc_id, l.line_pos, l.line_text
        FROM lines l JOIN census c USING (line_text)
        WHERE c.n_docs < {DUP_DOCS}
    ),
    rebuilt AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_kept,
               string_agg(line_text, ' ' ORDER BY line_pos) AS text_clean
        FROM kept GROUP BY doc_id
    ),
    base AS (
        SELECT doc_id, CAST(max(n_lines) AS BIGINT) AS n_lines
        FROM lines GROUP BY doc_id
    )
    SELECT b.doc_id, b.n_lines,
           COALESCE(r.n_kept, 0) AS n_kept,
           COALESCE(r.text_clean, '') AS text_clean
    FROM base b LEFT JOIN rebuilt r USING (doc_id)
    """,
    "line_dedup_stats": _LINES_CTE
    + f"""
    SELECT CAST(count(*) AS BIGINT) AS distinct_lines,
           CAST(sum(CASE WHEN n_docs >= {DUP_DOCS} THEN 1 ELSE 0 END)
                AS BIGINT) AS dup_lines,
           CAST(sum(n_inst) AS BIGINT) AS total_instances,
           CAST(sum(CASE WHEN n_docs >= {DUP_DOCS} THEN n_inst ELSE 0 END)
                AS BIGINT) AS dropped_instances,
           round(
               CAST(sum(CASE WHEN n_docs < {DUP_DOCS} THEN n_inst ELSE 0 END)
                    AS DOUBLE)
               / CAST(sum(n_inst) AS DOUBLE), 4) AS kept_ratio
    FROM census
    """,
    "line_dedup_hot_lines": _LINES_CTE
    + f"""
    SELECT line_text, n_docs, n_inst
    FROM census
    WHERE n_docs >= {DUP_DOCS}
    ORDER BY n_docs DESC, n_inst DESC, line_text ASC
    LIMIT {HOT_K}
    """,
}
