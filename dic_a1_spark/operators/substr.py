"""Cross-document exact-substring span dedup over the `documents` table —
the "ExactSubstr" scrub of Lee et al. 2021 (Deduplicating Training Data
Makes Language Models Better): any run of SUBSTR_WIDTH consecutive tokens
that occurs in more than one document marks a duplicated SPAN, and
overlapping duplicated windows merge into maximal per-document intervals.
This catches verbatim passages that whole-document dedup (exact/MinHash/
SimHash, dedup.py) misses because the surrounding documents differ, and
that line dedup (linededup.py) misses when the copy is not line-aligned —
stride-1 overlapping windows, not disjoint chunks.

Scale shape (why this survives 100 TB):
  1. Window construction is a pure map over the scan: tokenize + slice +
     concat_ws + xxhash64 are array expressions — the string window never
     leaves its projection; only (doc_id, pos, h) rows of fixed width flow
     downstream (one row per token, ~24 bytes — the suffix-array form of
     ExactSubstr needs a global sort of the whole corpus; this windowed
     form needs one hash aggregation).
  2. The duplicate census is ONE hash aggregation on h with map-side
     partial aggregation; the shuffle carries (h, partial distinct-doc
     sketch), not raw windows.
  3. The probe joins the window stream against the census's surviving
     keys on the same key, hits-only (Zipf: duplicated keys are a
     vanishing fraction). NO broadcast hint — the dup-key frame is
     corpus-proportional in the worst case (the lexical.py rule); AQE
     picks broadcast when it actually fits.
  4. Interval merge is two window functions over (doc_id, pos) plus the
     island rollup — one exchange on doc_id (the rollup reuses the window
     partitioning), and it moves HIT rows only, not the corpus.

Oracle posture: Spark groups windows by xxhash64(window_string); the
DuckDB oracles recompute the SAME hash with the generated XXH64 SQL
(functions/xxh64_sql.py) over DISTINCT window strings, so grouping —
including any 64-bit collision — is engine-identical and every query
here carries the full value-hash gate.

Reference scope: the reference engine (mrjob WordCount/ChiSquared,
src/wordCountJob.py) has no dedup surface; this module is part of the
training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# Window width in tokens. Lee et al. use 50 BPE tokens; 10 is calibrated
# to the driver corpus (~54 tokens/doc, ~31-word vocabulary) so both the
# duplicated and clean branches are populated (969 duplicated keys /
# 21.6K distinct windows at sf0.01 — non-vacuous, per the Q11 rule).
SUBSTR_WIDTH = 10
# Hot-span report size.
HOT_K = 20


def _window_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h): xxhash64 of every stride-1 SUBSTR_WIDTH-token
    window. Map-only: the struct array is built in one projection and
    exploded with explode_OUTER — a plain explode's inferred
    size()>0/isnotnull filter would inline the whole tokenize+window
    chain into the predicate and re-run it per lambda element (the
    dedup.py _with_shingles lesson: 19 s -> 0.9 s at sf0.1). Outer is
    row-identical: docs with < SUBSTR_WIDTH tokens are dropped by the
    size filter, so every surviving array has >= 1 window."""
    w = SUBSTR_WIDTH
    toks = docs.select(
        "doc_id", tokens_nonempty(F.col("text")).alias("toks")
    ).where(F.size("toks") >= w)
    wins = F.expr(
        f"transform(sequence(1, size(toks) - {w - 1}),"
        f" i -> struct(CAST(i AS INT) AS pos,"
        f" xxhash64(concat_ws(' ', slice(toks, i, {w}))) AS h))"
    )
    return (
        toks.select("doc_id", wins.alias("ws"))
        .select("doc_id", F.explode_outer("ws").alias("w"))
        .select("doc_id", F.col("w.pos").alias("pos"), F.col("w.h").alias("h"))
    )


def _dup_hits(docs: DataFrame) -> DataFrame:
    """Window occurrences whose hash occurs in >= 2 DISTINCT documents
    (the cross-document rule — within-document repetition alone is
    boilerplate_profile's job, lexical.py). Hits-only: the census
    aggregates BEFORE the join, so a hot span costs one census row, and
    only duplicated occurrences reach the interval merge."""
    wins = _window_hashes(docs)
    # "occurs in >= 2 distinct docs" as min(doc_id) != max(doc_id): plain
    # partial-aggregable min/max instead of a distinct aggregate's Expand
    # — one exchange on h, map-side combined.
    dup = (
        wins.groupBy("h")
        .agg(F.min("doc_id").alias("mn"), F.max("doc_id").alias("mx"))
        .where(F.col("mn") != F.col("mx"))
        .select("h")
    )
    return wins.join(dup, "h")


# Position encoder for the keep-first rule: one BIGINT per occurrence,
# ordered like (doc_id, pos). 2^21 positions per doc is far above any
# real document's token count and keeps doc_id < 2^42 overflow-free.
_POS_ENC = 1 << 21


def _merge_spans(hits: DataFrame) -> DataFrame:
    """(doc_id, pos) hit rows -> maximal merged per-doc intervals
    (classic interval union via running-max window functions: a window
    starts a new island iff its start exceeds every previous window's
    end); adjacent-but-disjoint spans stay separate."""
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max(F.col("pos") + SUBSTR_WIDTH - 1).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.select(
        "doc_id",
        "pos",
        F.when(prev_end.isNull() | (F.col("pos") > prev_end), 1)
        .otherwise(0)
        .alias("ni"),
    )
    islands = flagged.select(
        "doc_id",
        "pos",
        F.sum("ni")
        .over(w_ord.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island"),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + SUBSTR_WIDTH - 1).cast("int").alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


def substr_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows): maximal merged intervals
    of cross-document duplicated SUBSTR_WIDTH-token windows, per document
    (token positions, 1-based inclusive). The removal worklist of the
    scrub-ALL policy: every occurrence of a duplicated window is marked
    (see substr_dup_spans_keepfirst for the keep-one-copy policy)."""
    d = load_table(spark, sf_dir, "documents")
    return _merge_spans(_dup_hits(d))


def substr_dup_spans_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-copy removal worklist (the Lee et al. policy — scrubbing
    ALL occurrences deletes the passage from the corpus entirely): the
    canonical occurrence of each duplicated window — lowest (doc_id, pos)
    — is preserved; spans merge over the remaining occurrences only.
    The census carries one extra BIGINT per key (min of the encoded
    (doc_id, pos) order — plain partial-aggregable min, same single
    exchange as the scrub-all census)."""
    d = load_table(spark, sf_dir, "documents")
    wins = _window_hashes(d)
    enc = F.col("doc_id") * _POS_ENC + F.col("pos")
    cen = wins.groupBy("h").agg(
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
        F.min(enc).alias("own_key"),
    )
    hits = (
        wins.join(cen, "h")
        .where(F.col("mn") != F.col("mx"))
        .where(enc != F.col("own_key"))
        .select("doc_id", "pos")
    )
    return _merge_spans(hits)


def substr_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus census: total window occurrences, distinct window
    keys, duplicated keys (>= 2 docs), duplicated occurrences, documents
    affected, and the duplicated-occurrence share — the number a pipeline
    publishes to decide whether ExactSubstr scrubbing pays for itself."""
    d = load_table(spark, sf_dir, "documents")
    wins = _window_hashes(d)
    # nd >= 2 as min != max (see _dup_hits) — no distinct-agg Expand.
    census = wins.groupBy("h").agg(
        F.count("*").alias("cnt"),
        (F.min("doc_id") != F.max("doc_id")).alias("is_dup"),
    )
    totals = census.agg(
        F.sum("cnt").alias("n_windows"),
        F.count("*").alias("n_distinct"),
        F.sum(F.when(F.col("is_dup"), F.col("cnt")).otherwise(0)).alias(
            "n_dup_occurrences"
        ),
        F.sum(F.col("is_dup").cast("long")).alias("n_dup_keys"),
    )
    affected = (
        _dup_hits(d)
        .agg(F.countDistinct("doc_id").alias("n_docs_affected"))
    )
    return totals.crossJoin(affected).select(
        "n_windows",
        "n_distinct",
        "n_dup_keys",
        "n_dup_occurrences",
        "n_docs_affected",
        F.round(
            F.col("n_dup_occurrences").cast("double")
            / F.col("n_windows").cast("double"),
            4,
        ).alias("dup_share"),
    )


def substr_hot_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-HOT_K duplicated windows by occurrence count: (h, n_occurrences,
    n_docs), ordered by count desc then hash — the boilerplate-passage
    report (h is the span's stable 64-bit id; the span text stays in its
    map stage and never shuffles). Deterministic: h is the group key, so
    (n_occurrences, h) is a total order."""
    d = load_table(spark, sf_dir, "documents")
    return (
        _window_hashes(d)
        .groupBy("h")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_occurrences"), F.asc("h"))
        .limit(HOT_K)
    )


def substr_scrub_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Applies the span worklist: for every AFFECTED document, the text
    with all duplicated spans removed — (doc_id, n_tokens, n_removed,
    kept_text). Works in token space (kept_text re-joins the surviving
    tokens with single spaces; unaffected documents pass through a real
    pipeline untouched via anti-join, so they are not re-emitted here).
    The per-doc span list is bounded by document length, so the
    collect_list and the per-token exists() probe are O(doc), never
    corpus-shaped."""
    d = load_table(spark, sf_dir, "documents")
    spans = substr_dup_spans(spark, sf_dir).groupBy("doc_id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("sp")
    )
    toks = d.select("doc_id", tokens_nonempty(F.col("text")).alias("toks"))
    kept = F.expr(
        "filter(toks, (x, i) -> NOT exists(sp,"
        " s -> i + 1 >= s.span_start AND i + 1 <= s.span_end))"
    )
    return (
        toks.join(spans, "doc_id")
        .select(
            "doc_id",
            F.size("toks").cast("long").alias("n_tokens"),
            kept.alias("kept"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.size("kept")).alias("n_removed"),
            F.concat_ws(" ", F.col("kept")).alias("kept_text"),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "substr_dup_spans": substr_dup_spans,
    "substr_dup_spans_keepfirst": substr_dup_spans_keepfirst,
    "substr_dup_stats": substr_dup_stats,
    "substr_hot_spans": substr_hot_spans,
    "substr_scrub_text": substr_scrub_text,
}


def _wins_cte() -> str:
    """Shared oracle prefix: (doc_id, pos, h) for every stride-1 window,
    with h the generated XXH64 of the window string computed once per
    DISTINCT window (the decontam_fast oracle pattern — the expensive
    generated hash never runs per occurrence)."""
    from dic_a1_spark.functions.xxh64_sql import xxh64_str_sql

    w = SUBSTR_WIDTH
    toks = duckdb_tokens_sql()
    return f"""
        WITH toks AS (SELECT doc_id, {toks} AS a FROM documents),
        pos AS (SELECT doc_id, a, generate_subscripts(a, 1) AS i FROM toks),
        tw AS MATERIALIZED (
            SELECT doc_id, CAST(i AS INTEGER) AS pos,
                   array_to_string(a[i:i+{w - 1}], ' ') AS win
            FROM pos WHERE i + {w - 1} <= len(a)
        ),
        dwh AS MATERIALIZED (
            SELECT win, {xxh64_str_sql('win')} AS h
            FROM (SELECT DISTINCT win FROM tw)
        ),
        wins AS MATERIALIZED (
            SELECT t.doc_id, t.pos, d.h FROM tw t JOIN dwh d USING (win)
        )
    """


def _hits_chain() -> str:
    """CTE chain `wins` -> `hits` for the scrub-ALL policy."""
    return """,
        dup AS (
            SELECT h FROM wins GROUP BY h
            HAVING count(DISTINCT doc_id) >= 2
        ),
        hits AS (SELECT w.doc_id, w.pos FROM wins w JOIN dup USING (h))"""


def _keepfirst_hits_chain() -> str:
    """CTE chain `wins` -> `hits` for the keep-one-copy policy: the
    canonical occurrence (min encoded (doc_id, pos)) of each duplicated
    window is excluded from the hit stream."""
    return f""",
        cen AS (
            SELECT h, min(doc_id) AS mn, max(doc_id) AS mx,
                   min(doc_id * {_POS_ENC} + pos) AS own_key
            FROM wins GROUP BY h
        ),
        hits AS (
            SELECT w.doc_id, w.pos
            FROM wins w JOIN cen c USING (h)
            WHERE c.mn <> c.mx
              AND w.doc_id * {_POS_ENC} + w.pos <> c.own_key
        )"""


def _merge_chain() -> str:
    """CTE chain `hits` -> `islands` — the interval-merge window
    functions, shared by every spans/scrub oracle."""
    w = SUBSTR_WIDTH
    return f""",
        flagged AS (
            SELECT doc_id, pos,
                   CASE WHEN max(pos + {w - 1}) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        ) IS NULL
                        OR pos > max(pos + {w - 1}) OVER (
                            PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                        )
                   THEN 1 ELSE 0 END AS ni
            FROM hits
        ),
        islands AS (
            SELECT doc_id, pos,
                   sum(ni) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS island
            FROM flagged
        )"""


def _spans_select() -> str:
    w = SUBSTR_WIDTH
    return f"""
        SELECT doc_id, min(pos) AS span_start,
               CAST(max(pos) + {w - 1} AS INTEGER) AS span_end,
               count(*) AS n_windows
        FROM islands GROUP BY doc_id, island
    """


def _spans_oracle() -> str:
    return _wins_cte() + _hits_chain() + _merge_chain() + _spans_select()


def _keepfirst_oracle() -> str:
    return (
        _wins_cte() + _keepfirst_hits_chain() + _merge_chain() + _spans_select()
    )


def _scrub_oracle() -> str:
    w = SUBSTR_WIDTH
    return (
        _wins_cte()
        + _hits_chain()
        + _merge_chain()
        + f""",
        spans AS (
            SELECT doc_id, min(pos) AS s,
                   CAST(max(pos) + {w - 1} AS INTEGER) AS e
            FROM islands GROUP BY doc_id, island
        ),
        per_doc AS (
            SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp
            FROM spans GROUP BY doc_id
        )
        SELECT t.doc_id, len(t.a) AS n_tokens,
               len(t.a) - len(list_filter(t.a, (x, i) ->
                   len(list_filter(p.sp, z -> i >= z.s AND i <= z.e)) = 0
               )) AS n_removed,
               coalesce(array_to_string(list_filter(t.a, (x, i) ->
                   len(list_filter(p.sp, z -> i >= z.s AND i <= z.e)) = 0
               ), ' '), '') AS kept_text
        FROM toks t JOIN per_doc p USING (doc_id)
    """
    )


def _stats_oracle() -> str:
    return (
        _wins_cte()
        + """,
        census AS (
            SELECT h, count(*) AS cnt, count(DISTINCT doc_id) AS nd
            FROM wins GROUP BY h
        ),
        totals AS (
            SELECT CAST(sum(cnt) AS BIGINT) AS n_windows,
                   count(*) AS n_distinct,
                   CAST(sum(CASE WHEN nd >= 2 THEN cnt ELSE 0 END) AS BIGINT)
                       AS n_dup_occurrences,
                   CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_dup_keys
            FROM census
        ),
        affected AS (
            SELECT count(DISTINCT w.doc_id) AS n_docs_affected
            FROM wins w JOIN (SELECT h FROM census WHERE nd >= 2) d USING (h)
        )
        SELECT n_windows, n_distinct, n_dup_keys, n_dup_occurrences,
               n_docs_affected,
               round(CAST(n_dup_occurrences AS DOUBLE)
                     / CAST(n_windows AS DOUBLE), 4) AS dup_share
        FROM totals, affected
    """
    )


def _hot_oracle() -> str:
    return (
        _wins_cte()
        + f"""
        SELECT h, count(*) AS n_occurrences,
               count(DISTINCT doc_id) AS n_docs
        FROM wins GROUP BY h
        HAVING count(DISTINCT doc_id) >= 2
        ORDER BY n_occurrences DESC, h ASC
        LIMIT {HOT_K}
    """
    )


ORACLES: dict[str, str] = {
    "substr_dup_spans": _spans_oracle(),
    "substr_dup_spans_keepfirst": _keepfirst_oracle(),
    "substr_dup_stats": _stats_oracle(),
    "substr_hot_spans": _hot_oracle(),
    "substr_scrub_text": _scrub_oracle(),
}
