"""Winnowing document fingerprints over the `documents` table — the
local-minimum k-gram selection of Schleimer, Wilkerson & Aiken 2003
("Winnowing: Local Algorithms for Document Fingerprinting", the MOSS
scheme). Every window of WINNOW_W consecutive k-gram hashes contributes
its minimal hash (rightmost on ties); the union of selections is the
document's fingerprint set. The guarantee: any shared token run of at
least WINNOW_W + WINNOW_K - 1 tokens between two documents yields at
least one SHARED fingerprint — so fingerprint overlap is a sound
candidate generator for partial-copy detection, at ~2/(W+1) the cost of
keeping every k-gram (the stored-fraction bound from the paper).

This complements the ExactSubstr ladder (operators/substr.py): substr
keeps EVERY duplicated window occurrence to build exact scrub spans;
winnowing keeps a guaranteed-coverage SAMPLE of all windows to build a
compact per-document sketch you can store, index, and join at corpus
scale.

Scale shape (why this survives 100 TB):
  1. k-gram hashing is the substr.py map-only projection: tokenize +
     slice + concat_ws + xxhash64 inside one transform(); only
     (doc_id, pos, h) rows leave the scan.
  2. Selection is ONE window pass per document: min() over a
     (W-1 PRECEDING, CURRENT ROW) frame on an ENCODED key
     h42 * 2^21 + (2^21 - 1 - pos) — lexicographic (min hash, max pos)
     as a single BIGINT min, so the rightmost-min tiebreak costs no
     second window function. One exchange on doc_id.
  3. Per-doc distinct selections are collected INSIDE the same doc_id
     partitioning (groupBy(doc_id) after a doc_id window reuses the
     exchange — no second shuffle); fingerprints re-emerge via explode.
  4. Candidate pairs run the inverted-index shape of lexical.py: census
     on the fingerprint key first, df ceiling against viral boilerplate
     keys, pairs generated from surviving postings only.

Encoding bounds: h is folded to 42 bits (pmod 2^42 — fingerprint
resolution, collisions are the scheme's currency), positions to 21 bits
(2M tokens per document; documents beyond that are chunked upstream by
doc_chunk_windows). 42 + 21 = 63 bits — no BIGINT overflow in either
engine.

Oracle posture: the DuckDB twins recompute xxhash64 with the generated
XXH64 SQL (functions/xxh64_sql.py) over DISTINCT k-gram strings, then
run the IDENTICAL window-min selection arithmetic — every query here
carries the full value-hash gate.

Reference scope: the reference engine (mrjob WordCount/ChiSquared) has
no fingerprinting surface; this module is part of the
training-data-pipeline extension mandated by the build brief.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# k-gram width in tokens. 5 is calibrated like substr.SUBSTR_WIDTH: the
# driver corpus (~54 tokens/doc, 31-word vocabulary) has 24K distinct
# 5-grams at sf0.01 with 1.1K duplicated across documents — both the
# shared and unshared fingerprint branches are populated (the Q11
# non-vacuity rule).
WINNOW_K = 5
# Window width in k-gram positions. Guarantee threshold t = W + K - 1
# = 8 tokens; expected stored fraction 2 / (W + 1) = 0.4.
WINNOW_W = 4
# Fingerprint keys present in more than this many documents are dropped
# from candidate generation (the lexical.py df ceiling — boilerplate
# keys would otherwise contribute O(df^2) pairs).
WINNOW_DF_CEILING = 64

_H_MOD = 1 << 42  # fingerprint hash folded to 42 bits
_POS_ENC = 1 << 21  # position field width in the encoded key
_MAXP = _POS_ENC - 1


def _kgram_hashes(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, h42): 42-bit xxhash64 of every stride-1 WINNOW_K-token
    gram, 1-based positions. Map-only; explode_outer for the same
    filter-inlining reason as substr._window_hashes."""
    k = WINNOW_K
    toks = docs.select(
        "doc_id", tokens_nonempty(F.col("text")).alias("toks")
    ).where(F.size("toks") >= k)
    grams = F.expr(
        f"transform(sequence(1, size(toks) - {k - 1}),"
        f" i -> struct(CAST(i AS INT) AS pos,"
        f" pmod(xxhash64(concat_ws(' ', slice(toks, i, {k}))),"
        f" {_H_MOD}L) AS h))"
    )
    return (
        toks.select("doc_id", grams.alias("gs"))
        .select("doc_id", F.explode_outer("gs").alias("g"))
        .select("doc_id", F.col("g.pos").alias("pos"), F.col("g.h").alias("h"))
    )


def _selected_arrays(docs: DataFrame) -> DataFrame:
    """(doc_id, es): the DISTINCT winnowing selections per document as
    one encoded array (enc = h42 * 2^21 + (MAXP - pos); min(enc) over a
    window = minimal hash, rightmost position on ties). Windows ending
    before position WINNOW_W are partial and emit nothing. The
    collect/array_distinct happens inside the doc_id partitioning the
    window pass already established — one exchange total; both
    consumers (fingerprint rows, per-doc key sets) derive from this
    array without a second aggregation."""
    w = WINNOW_W
    enc = (F.col("h") * _POS_ENC + (F.lit(_MAXP) - F.col("pos"))).alias("e")
    win = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(w - 1), Window.currentRow)
    )
    sel = (
        _kgram_hashes(docs)
        .select("doc_id", "pos", enc)
        .select("doc_id", "pos", F.min("e").over(win).alias("se"))
        .where(F.col("pos") >= w)
    )
    return sel.groupBy("doc_id").agg(
        F.array_distinct(F.collect_list("se")).alias("es")
    )


def _selected_encoded(docs: DataFrame) -> DataFrame:
    """(doc_id, enc): _selected_arrays re-exploded to one selection per
    row."""
    return _selected_arrays(docs).select(
        "doc_id", F.explode("es").alias("enc")
    )


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, pos, h): the winnowing fingerprint set — for every window
    of WINNOW_W consecutive k-gram hashes, the minimal 42-bit hash
    (rightmost on ties), deduplicated per document. ~2/(W+1) of all
    k-gram positions survive; any cross-document token run of length
    >= W + K - 1 is guaranteed to surface as a shared h."""
    d = load_table(spark, sf_dir, "documents")
    return _selected_encoded(d).select(
        "doc_id",
        (F.lit(_MAXP) - F.col("enc") % _POS_ENC).cast("int").alias("pos"),
        F.expr(f"CAST(enc div {_POS_ENC} AS BIGINT)").alias("h"),
    )


def winnow_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc1, doc2, n_shared): document pairs sharing at least one
    winnowing fingerprint key, with the count of shared keys — the MOSS
    match-candidate report. Inverted-index shape: per-doc distinct keys,
    census with the WINNOW_DF_CEILING viral guard, pairs from surviving
    postings only (never all-pairs)."""
    d = load_table(spark, sf_dir, "documents")
    dockeys = _selected_arrays(d).select(
        "doc_id",
        F.explode(
            F.expr(f"array_distinct(transform(es, e -> e div {_POS_ENC}))")
        ).alias("h"),
    )
    census = (
        dockeys.groupBy("h")
        .agg(F.count("*").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= WINNOW_DF_CEILING))
        .select("h")
    )
    posting = dockeys.join(census, "h")
    return (
        posting.alias("a")
        .join(posting.alias("b"), "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count("*").alias("n_shared"))
    )


def winnow_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row census: total k-gram positions, selected fingerprints,
    documents with >= 1 fingerprint, and the selection density — the
    number the paper bounds at 2/(W+1) for random hashes; a density far
    above it means repetitive low-entropy text (few distinct hashes per
    window), which is itself a corpus-quality signal."""
    d = load_table(spark, sf_dir, "documents")
    grams = _kgram_hashes(d).agg(F.count("*").alias("n_grams"))
    fps = _selected_encoded(d).agg(
        F.count("*").alias("n_fingerprints"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return grams.crossJoin(fps).select(
        "n_grams",
        "n_fingerprints",
        "n_docs",
        # try_divide: a corpus whose docs are all shorter than the gram
        # width has n_grams = 0 — ANSI `/` THROWS where DuckDB yields
        # NULL (r9 NULL-corpus sweep).
        F.round(
            F.try_divide(
                F.col("n_fingerprints").cast("double"),
                F.col("n_grams").cast("double"),
            ),
            4,
        ).alias("density"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "winnow_fingerprints": winnow_fingerprints,
    "winnow_dup_candidates": winnow_dup_candidates,
    "winnow_stats": winnow_stats,
}


def _grams_cte() -> str:
    """Shared oracle prefix: (doc_id, pos, h42) per stride-1 k-gram, the
    generated XXH64 computed once per DISTINCT gram string (the
    substr.py oracle pattern), folded to 42 bits with the
    sign-correcting pmod."""
    from dic_a1_spark.functions.xxh64_sql import xxh64_str_sql

    k = WINNOW_K
    toks = duckdb_tokens_sql()
    m = _H_MOD
    return f"""
        WITH toks AS (SELECT doc_id, {toks} AS a FROM documents),
        posd AS (SELECT doc_id, a, generate_subscripts(a, 1) AS i FROM toks),
        tg AS MATERIALIZED (
            SELECT doc_id, CAST(i AS INTEGER) AS pos,
                   array_to_string(a[i:i+{k - 1}], ' ') AS gram
            FROM posd WHERE i + {k - 1} <= len(a)
        ),
        dgh AS MATERIALIZED (
            SELECT gram,
                   CAST((({xxh64_str_sql('gram')}) % {m} + {m}) % {m}
                        AS BIGINT) AS h
            FROM (SELECT DISTINCT gram FROM tg)
        ),
        grams AS MATERIALIZED (
            SELECT t.doc_id, t.pos, d.h FROM tg t JOIN dgh d USING (gram)
        )
    """


def _sel_cte() -> str:
    """CTE chain `grams` -> `sel` (doc_id, enc): the encoded-key window
    min, distinct per document — the Spark _selected_encoded mirror."""
    w = WINNOW_W
    return f""",
        enc AS (
            SELECT doc_id, pos,
                   h * {_POS_ENC} + ({_MAXP} - pos) AS e
            FROM grams
        ),
        winmin AS (
            SELECT doc_id, pos,
                   min(e) OVER (
                       PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN {w - 1} PRECEDING AND CURRENT ROW
                   ) AS se
            FROM enc
        ),
        sel AS (
            SELECT DISTINCT doc_id, se AS enc FROM winmin WHERE pos >= {w}
        )"""


def _fingerprints_oracle() -> str:
    return (
        _grams_cte()
        + _sel_cte()
        + f"""
        SELECT doc_id,
               CAST({_MAXP} - (enc % {_POS_ENC}) AS INTEGER) AS pos,
               CAST(enc // {_POS_ENC} AS BIGINT) AS h
        FROM sel
    """
    )


def _candidates_oracle() -> str:
    return (
        _grams_cte()
        + _sel_cte()
        + f""",
        dockeys AS (
            SELECT DISTINCT doc_id,
                   CAST(enc // {_POS_ENC} AS BIGINT) AS h
            FROM sel
        ),
        census AS (
            SELECT h FROM dockeys GROUP BY h
            HAVING count(*) >= 2 AND count(*) <= {WINNOW_DF_CEILING}
        ),
        posting AS (SELECT doc_id, h FROM dockeys JOIN census USING (h))
        SELECT a.doc_id AS doc1, b.doc_id AS doc2,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM posting a JOIN posting b USING (h)
        WHERE a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    """
    )


def _stats_oracle() -> str:
    return (
        _grams_cte()
        + _sel_cte()
        + """,
        g AS (SELECT CAST(count(*) AS BIGINT) AS n_grams FROM grams),
        f AS (
            SELECT CAST(count(*) AS BIGINT) AS n_fingerprints,
                   CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
            FROM sel
        )
        SELECT n_grams, n_fingerprints, n_docs,
               round(CAST(n_fingerprints AS DOUBLE)
                     / CAST(n_grams AS DOUBLE), 4) AS density
        FROM g, f
    """
    )


ORACLES: dict[str, str] = {
    "winnow_fingerprints": _fingerprints_oracle(),
    "winnow_dup_candidates": _candidates_oracle(),
    "winnow_stats": _stats_oracle(),
}
