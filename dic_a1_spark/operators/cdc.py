"""Content-defined chunking over the `documents` table — Rabin-style
CDC (Rabin fingerprinting; Muthitacharoen et al. 2001 LBFS; FastCDC,
Xia et al. USENIX ATC 2016), the storage-dedup primitive a corpus lake
uses to dedupe near-identical document revisions at sub-document
granularity. A token position is a chunk BOUNDARY iff the hash of the
CDC_K-token window ending there satisfies hash ≡ 0 (mod CDC_D); chunks
are the intervals between boundaries (plus the document tail). Because
the test depends only on a LOCAL window, inserting or deleting text
early in a document does not shift the identity of later chunks — the
property that makes CDC dedup robust where fixed-size chunking
(doc_chunk_windows, curation.py) resynchronizes never.

Expected chunk length is CDC_D tokens (geometric with p = 1/D).

Scale shape:
  1. Chunk construction is ZERO-exchange: boundary detection, interval
     assembly, and chunk-content hashing all happen in the token-array
     domain of one projection (filter/transform/slice/concat_ws/
     xxhash64), then a single explode_outer emits chunk rows. No window
     functions, no shuffle — a 100 TB corpus chunks at scan speed.
  2. The duplicate-chunk census is ONE hash aggregation on chunk_hash
     with map-side combine (the substr.py census argument); `>= 2
     docs` is min(doc_id) != max(doc_id) — no distinct-agg Expand.
  3. The stats rollup aggregates census rows, never chunk instances.

Oracle posture: the DuckDB twins recompute BOTH hash layers (boundary
window hashes and chunk-content hashes) with the generated XXH64 SQL
over DISTINCT strings and mirror the interval assembly with window
functions — every query carries the full value-hash gate. The
boundary predicate pmod(h, D) = 0 is mirrored as h % D = 0: the two
conventions agree exactly on zero remainders.

Reference scope: the reference engine (mrjob WordCount/ChiSquared) has
no chunking surface; this module is part of the training-data-pipeline
extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# Rolling-window width in tokens (the locality radius of the boundary
# test).
CDC_K = 4
# Boundary divisor: expected chunk length in tokens. 16 gives ~3-4
# chunks per ~54-token driver document — both the multi-chunk and the
# duplicate-chunk branches are populated at sf0.01 (the Q11 rule).
CDC_D = 16


def _chunks(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_start, chunk_end, n_tokens, chunk_hash): the CDC
    chunk rows, 1-based inclusive token intervals. Entirely map-side —
    see module docstring."""
    k, d = CDC_K, CDC_D
    toks = docs.select(
        "doc_id", tokens_nonempty(F.col("text")).alias("toks")
    ).where(F.size("toks") >= 1)
    # Boundary positions: window END indices e in [K, n] whose window
    # hash divides by D; the document end closes the final chunk.
    # IF-guard: sequence(K, n) DESCENDS when n < K.
    bounds = F.expr(
        f"array_distinct(concat("
        f" IF(size(toks) >= {k},"
        f"  filter(transform(sequence({k}, size(toks)),"
        f"   e -> IF(pmod(xxhash64(concat_ws(' ',"
        f"        slice(toks, e - {k} + 1, {k}))), {d}) = 0,"
        f"        e, CAST(NULL AS INT))),"
        f"   x -> x IS NOT NULL),"
        f"  array()),"
        f" array(CAST(size(toks) AS INT))))"
    )
    chunks = F.expr(
        "transform(bounds, (b, i) ->"
        " struct(IF(i = 0, 1, bounds[i-1] + 1) AS cstart, b AS cend))"
    )
    return (
        toks.select("doc_id", "toks", bounds.alias("bounds"))
        .select("doc_id", "toks", F.explode_outer(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.cstart").alias("chunk_start"),
            F.col("c.cend").alias("chunk_end"),
            (F.col("c.cend") - F.col("c.cstart") + 1)
            .cast("long")
            .alias("n_tokens"),
            F.xxhash64(
                F.expr(
                    "concat_ws(' ', slice(toks, c.cstart,"
                    " c.cend - c.cstart + 1))"
                )
            ).alias("chunk_hash"),
        )
    )


def cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The chunk table itself — what a corpus lake stores once per
    distinct chunk_hash and references per document."""
    return _chunks(load_table(spark, sf_dir, "documents"))


def cdc_dup_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(chunk_hash, n_tokens, n_occurrences, cross_doc): the duplicate-
    chunk census — chunks stored more than once, flagged when the
    copies span documents (cross_doc = 1) versus within-document
    repetition."""
    cen = (
        _chunks(load_table(spark, sf_dir, "documents"))
        .groupBy("chunk_hash")
        .agg(
            F.max("n_tokens").alias("n_tokens"),
            F.count("*").alias("n_occurrences"),
            (F.min("doc_id") != F.max("doc_id"))
            .cast("int")
            .alias("cross_doc"),
        )
        .where(F.col("n_occurrences") >= 2)
    )
    return cen.select("chunk_hash", "n_tokens", "n_occurrences", "cross_doc")


def cdc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row storage census: chunk instances, distinct chunks, token
    mass, mean chunk length, tokens saved by content-addressed storage
    (every instance beyond a chunk's first), and the dedup ratio — the
    number that decides whether CDC-addressing the corpus pays."""
    cen = (
        _chunks(load_table(spark, sf_dir, "documents"))
        .groupBy("chunk_hash")
        .agg(F.max("n_tokens").alias("tok"), F.count("*").alias("cnt"))
    )
    return cen.agg(
        F.sum("cnt").alias("n_chunks"),
        F.count("*").alias("n_distinct_chunks"),
        F.sum(F.col("tok") * F.col("cnt")).alias("n_tokens"),
        F.round(
            F.sum(F.col("tok") * F.col("cnt")).cast("double")
            / F.sum("cnt").cast("double"),
            4,
        ).alias("avg_chunk_tokens"),
        F.sum((F.col("cnt") - 1) * F.col("tok")).alias("tokens_saved"),
        F.round(
            F.sum((F.col("cnt") - 1) * F.col("tok")).cast("double")
            / F.sum(F.col("tok") * F.col("cnt")).cast("double"),
            4,
        ).alias("dedup_ratio"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_chunks": cdc_chunks,
    "cdc_dup_chunks": cdc_dup_chunks,
    "cdc_stats": cdc_stats,
}


def _chunks_cte() -> str:
    """Shared oracle prefix -> `chunks` (doc_id, chunk_start, chunk_end,
    n_tokens, chunk_hash). Both hash layers run the generated XXH64
    over DISTINCT strings (the substr.py pattern); interval assembly
    uses a lag window (the Spark side does it in the array domain —
    same intervals)."""
    from dic_a1_spark.functions.xxh64_sql import xxh64_str_sql

    k, d = CDC_K, CDC_D
    toks = duckdb_tokens_sql()
    return f"""
        WITH toks AS (
            SELECT doc_id, {toks} AS a FROM documents
        ),
        tk AS (SELECT doc_id, a FROM toks WHERE len(a) >= 1),
        posd AS (SELECT doc_id, a, generate_subscripts(a, 1) AS e FROM tk),
        tw AS MATERIALIZED (
            SELECT doc_id, CAST(e AS INTEGER) AS e,
                   array_to_string(a[e-{k}+1:e], ' ') AS win
            FROM posd WHERE e >= {k}
        ),
        dwh AS MATERIALIZED (
            SELECT win, {xxh64_str_sql('win')} AS h
            FROM (SELECT DISTINCT win FROM tw)
        ),
        bnd AS (
            SELECT t.doc_id, t.e AS bpos
            FROM tw t JOIN dwh w USING (win)
            WHERE w.h % {d} = 0
            UNION
            SELECT doc_id, CAST(len(a) AS INTEGER) AS bpos FROM tk
        ),
        iv AS (
            SELECT doc_id,
                   CAST(coalesce(lag(bpos) OVER (
                       PARTITION BY doc_id ORDER BY bpos
                   ), 0) + 1 AS INTEGER) AS chunk_start,
                   bpos AS chunk_end
            FROM bnd
        ),
        cs AS MATERIALIZED (
            SELECT i.doc_id, i.chunk_start, i.chunk_end,
                   CAST(i.chunk_end - i.chunk_start + 1 AS BIGINT)
                       AS n_tokens,
                   array_to_string(
                       t.a[i.chunk_start:i.chunk_end], ' ') AS ctext
            FROM iv i JOIN tk t USING (doc_id)
        ),
        dch AS MATERIALIZED (
            SELECT ctext, {xxh64_str_sql('ctext')} AS chunk_hash
            FROM (SELECT DISTINCT ctext FROM cs)
        ),
        chunks AS MATERIALIZED (
            SELECT c.doc_id, c.chunk_start, c.chunk_end, c.n_tokens,
                   d2.chunk_hash
            FROM cs c JOIN dch d2 USING (ctext)
        )
    """


def _chunks_oracle() -> str:
    return (
        _chunks_cte()
        + """
        SELECT doc_id, chunk_start, chunk_end, n_tokens, chunk_hash
        FROM chunks
    """
    )


def _dup_oracle() -> str:
    return (
        _chunks_cte()
        + """,
        cen AS (
            SELECT chunk_hash,
                   CAST(max(n_tokens) AS BIGINT) AS n_tokens,
                   CAST(count(*) AS BIGINT) AS n_occurrences,
                   CAST(CASE WHEN min(doc_id) <> max(doc_id)
                        THEN 1 ELSE 0 END AS INTEGER) AS cross_doc
            FROM chunks GROUP BY chunk_hash
        )
        SELECT chunk_hash, n_tokens, n_occurrences, cross_doc
        FROM cen WHERE n_occurrences >= 2
    """
    )


def _stats_oracle() -> str:
    return (
        _chunks_cte()
        + """,
        cen AS (
            SELECT chunk_hash, max(n_tokens) AS tok, count(*) AS cnt
            FROM chunks GROUP BY chunk_hash
        )
        SELECT CAST(sum(cnt) AS BIGINT) AS n_chunks,
               CAST(count(*) AS BIGINT) AS n_distinct_chunks,
               CAST(sum(tok * cnt) AS BIGINT) AS n_tokens,
               round(CAST(sum(tok * cnt) AS DOUBLE)
                     / CAST(sum(cnt) AS DOUBLE), 4) AS avg_chunk_tokens,
               CAST(sum((cnt - 1) * tok) AS BIGINT) AS tokens_saved,
               round(CAST(sum((cnt - 1) * tok) AS DOUBLE)
                     / CAST(sum(tok * cnt) AS DOUBLE), 4) AS dedup_ratio
        FROM cen
    """
    )


ORACLES: dict[str, str] = {
    "cdc_chunks": _chunks_oracle(),
    "cdc_dup_chunks": _dup_oracle(),
    "cdc_stats": _stats_oracle(),
}
