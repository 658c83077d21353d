"""Cross-source overlap audit — the provenance panel of a corpus: which
sources share content with which (mirrors, scrapes-of-scrapes, shared
boilerplate). Computed on word-3-gram shingles (token-level overlap is
vacuous on this corpus — every source shares the whole 31-word
vocabulary; the lexical.py df lesson), as the per-source DISTINCT
shingle sets' pairwise intersection and Jaccard.

All integer counts plus one exact division — oracle parity by
construction.

Scale shape at 100 TB:
  1. One corpus-sized map (shingle transform inside a projection) into
     a distinct on (source, shingle) — a single partial-agg shuffle;
     the result is vocabulary×sources bounded.
  2. The overlap matrix self-joins the DISTINCT frame on shingle with a
     df ceiling (a shingle present in nearly every source contributes
     |S|^2 rows of no discriminative value — the docsim hot-term rule);
     output is |S|^2 bounded.
  3. Per-source set sizes join back as a dimension frame (AQE decides
     the strategy — source counts are unbounded in principle, so no
     hard broadcast hint; the docsim norms lesson).

Reference scope: no provenance surface in the reference; part of the
training-data-pipeline extension (dedup/contamination family — the
source-granularity cousin of decontam_ngram_overlap).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# Shingle width (words) and the source-frequency ceiling: shingles
# present in more than this many sources are ubiquitous boilerplate and
# carry no pairwise signal (they'd add a constant to every cell).
# Calibrated to the driver corpus (nsrc maxes at 7 over 20 sources at
# sf0.01) so BOTH ceiling branches are populated — Q11 non-vacuity.
PROV_SHINGLE_W = 3
PROV_MAX_SOURCES = 5


def _source_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, shingle) DISTINCT — PERSISTED: the frame is
    vocabulary×sources bounded and feeds the source-frequency census,
    both self-join sides, and the set sizes; without the persist each
    consumer re-tokenizes the corpus from the scan (measured 8-10 scans
    before, 1 after — the bm25 base-projection lesson)."""
    from pyspark import StorageLevel

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", tokens_nonempty(F.col("text")).alias("toks")
    ).where(F.size("toks") >= PROV_SHINGLE_W)
    return (
        toks.select(
            "source",
            F.explode(
                F.expr(
                    f"array_distinct(transform("
                    f"sequence(1, size(toks) - {PROV_SHINGLE_W - 1}),"
                    f" i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))"
                )
            ).alias("shingle"),
        )
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _kept_sets(ss: DataFrame) -> DataFrame:
    """Ceiling-surviving shingles GROUPED to their sorted source array
    (shingle, srcs), persisted — read by the set sizes and the pair
    census. r13 restructure (guide §2.3 "aggregate before you shuffle"):
    the pair census used to SELF-JOIN the ceiling-filtered
    (source, shingle) frame on the shingle STRING — both sides shuffled
    by a ~30-byte key. Grouping once and generating each shingle's
    source pairs locally ships the posting stream across the wire ONCE,
    and the groupBy reuses the ceiling join's shingle partitioning
    wherever that join runs as sort-merge (at 100 TB), so no extra
    exchange appears. The collect runs AFTER the nsrc ceiling, so an
    array holds <= PROV_MAX_SOURCES entries (the two-pass viral-shingle
    guard is unchanged)."""
    from pyspark import StorageLevel

    sf_tbl = ss.groupBy("shingle").agg(
        F.count("*").cast("bigint").alias("nsrc")
    )
    return (
        ss.join(sf_tbl.where(F.col("nsrc") <= PROV_MAX_SOURCES), "shingle")
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src1, src2, n_shared, n1, n2, jaccard_r) for src1 < src2:
    pairwise distinct-shingle overlap under the PROV_MAX_SOURCES
    ceiling. Jaccard uses the CEILING-FILTERED sets on both sides, so
    the ratio is internally consistent (stated, not hidden)."""
    ss = _source_shingles(spark, sf_dir)
    kept = _kept_sets(ss)
    sizes = (
        kept.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count("*").cast("bigint").alias("n_set"))
    )
    # Each shingle's source pairs, generated locally from the sorted
    # array: src1 < src2 by construction, same (shingle, pair) hits as
    # the former self-join, exact integer count.
    pairs = (
        kept.select(
            F.explode(
                F.expr(
                    "flatten(transform(srcs, (x, i) ->"
                    " transform(slice(srcs, i + 2, size(srcs)),"
                    " y -> named_struct('src1', x, 'src2', y))))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.src1").alias("src1"), F.col("p.src2").alias("src2"))
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("source", "src1"), "src1")
        .withColumnRenamed("n_set", "n1")
        .join(
            sizes.withColumnRenamed("source", "src2").withColumnRenamed(
                "n_set", "n2"
            ),
            "src2",
        )
        .select(
            "src1",
            "src2",
            "n_shared",
            "n1",
            "n2",
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_shared")).cast(
                    "double"
                ),
                6,
            ).alias("jaccard_r"),
        )
    )


def source_overlap_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-row audit: (n_sources, n_pairs, n_shingles_kept,
    n_shingles_ceiled, max_jaccard_r) — the panel's headline numbers."""
    ss = _source_shingles(spark, sf_dir)
    sf_tbl = ss.groupBy("shingle").agg(
        F.count("*").cast("bigint").alias("nsrc")
    )
    ceiling = sf_tbl.agg(
        F.sum((F.col("nsrc") <= PROV_MAX_SOURCES).cast("bigint"))
        .cast("bigint")
        .alias("n_shingles_kept"),
        F.sum((F.col("nsrc") > PROV_MAX_SOURCES).cast("bigint"))
        .cast("bigint")
        .alias("n_shingles_ceiled"),
    )
    m = source_overlap_matrix(spark, sf_dir)
    agg = m.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.max("jaccard_r").alias("max_jaccard_r"),
    )
    # countDistinct, not distinct().count(): a NULL source is unknown
    # provenance, not a source — SQL count(DISTINCT) skips it while the
    # distinct-rows count kept it (r9 NULL-corpus sweep).
    nsrc = (
        load_table(spark, sf_dir, "documents")
        .agg(F.countDistinct("source").cast("bigint").alias("n_sources"))
    )
    return (
        nsrc.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(ceiling))
        .select(
            "n_sources",
            "n_pairs",
            "n_shingles_kept",
            "n_shingles_ceiled",
            "max_jaccard_r",
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "source_overlap_matrix": source_overlap_matrix,
    "source_overlap_summary": source_overlap_summary,
}

_TOKS = duckdb_tokens_sql()

_KEPT_CTE = f"""
    ss AS (
        SELECT DISTINCT source,
               unnest(list_distinct(list_transform(
                   range(1, len(toks) - {PROV_SHINGLE_W - 2}),
                   i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]
               ))) AS shingle
        FROM (SELECT source, {_TOKS} AS toks FROM documents)
        WHERE len(toks) >= {PROV_SHINGLE_W}
    ),
    sfreq AS (
        SELECT shingle, CAST(count(*) AS BIGINT) AS nsrc
        FROM ss GROUP BY shingle
    ),
    kept AS (
        SELECT s.source, s.shingle
        FROM ss s JOIN sfreq f USING (shingle)
        WHERE f.nsrc <= {PROV_MAX_SOURCES}
    ),
    sizes AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_set
        FROM kept GROUP BY source
    ),
    mat AS (
        SELECT a.source AS src1, b.source AS src2,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM kept a JOIN kept b USING (shingle)
        WHERE a.source < b.source
        GROUP BY a.source, b.source
    ),
    matrix AS (
        SELECT m.src1, m.src2, m.n_shared,
               s1.n_set AS n1, s2.n_set AS n2,
               round(CAST(m.n_shared AS DOUBLE)
                     / CAST(s1.n_set + s2.n_set - m.n_shared AS DOUBLE),
                     6) AS jaccard_r
        FROM mat m
        JOIN sizes s1 ON m.src1 = s1.source
        JOIN sizes s2 ON m.src2 = s2.source
    )
"""

ORACLES: dict[str, str] = {
    "source_overlap_matrix": f"""
        WITH {_KEPT_CTE}
        SELECT * FROM matrix
    """,
    "source_overlap_summary": f"""
        WITH {_KEPT_CTE}
        SELECT (SELECT CAST(count(DISTINCT source) AS BIGINT)
                FROM documents) AS n_sources,
               (SELECT CAST(count(*) AS BIGINT) FROM matrix) AS n_pairs,
               (SELECT CAST(sum(CASE WHEN nsrc <= {PROV_MAX_SOURCES}
                                     THEN 1 ELSE 0 END) AS BIGINT)
                FROM sfreq) AS n_shingles_kept,
               (SELECT CAST(sum(CASE WHEN nsrc > {PROV_MAX_SOURCES}
                                     THEN 1 ELSE 0 END) AS BIGINT)
                FROM sfreq) AS n_shingles_ceiled,
               (SELECT max(jaccard_r) FROM matrix) AS max_jaccard_r
    """,
}
