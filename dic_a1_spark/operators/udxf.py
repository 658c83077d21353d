"""User-defined function surface beyond scalar UDFs (SURVEY.md §2.9).

The reference's whole 'UDF mechanism' is arbitrary Python mapper/reducer
callables (mrjob MRStep, src/wordCountJob.py:101-119). Spark splits that
generality into typed extension points, each demonstrated and
oracle-gated here or elsewhere in the engine:

  scalar pandas UDF      -> operators/goldens.py (exact-int chi2)
  mapInPandas            -> operators/multimodal.py (decode batches)
  grouped applyInPandas  -> operators/textstats.py (quartiles)
  applyInPandasWithState -> streaming/jobs.py (running stats)
  Python UDTF (lateral)  -> split_sentences below: one row in, N typed
                            rows out, used via LATERAL join in SQL
  pandas UDAF            -> geo_mean below: a custom aggregate usable in
                            groupBy().agg(...)

Both additions are deliberately SQL-expressible so the DuckDB oracle
gates the UDTF/UDAF machinery itself, not just the logic inside it.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from dic_a1_spark.sources.readers import load_table


def make_split_sentences():
    """Sentence-ish splitter UDTF: one input string -> (position, segment)
    rows. The segmentation rule ('. ' literal) is chosen for engine
    neutrality; swap in a real segmenter without touching the plumbing.
    Built lazily: UDF registration requires an active SparkSession."""

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text: str):  # noqa: D102 - UDTF contract
            if text is None:
                return
            for i, s in enumerate(text.split(". ")):
                yield i + 1, s

    return SplitSentences


def make_geo_mean():
    """Geometric mean as a custom pandas aggregate (UDAF). Values are
    sorted before the log-sum so the result is deterministic under
    Spark's arbitrary within-group row order (floating addition isn't
    commutative-associative at the ulp level).

    A zero member makes the geometric mean exactly 0.0 — stated as an
    explicit branch (r9 degenerate-corpus sweep): numpy's ln(0) = -inf
    happens to flow to exp(-inf) = 0.0 anyway but warns, while DuckDB's
    ln(0) is a hard Out of Range error, so the oracle needs the same
    branch and the contract belongs in code, not in float accident."""

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float | None:
        import numpy as np

        # NULL members arrive as NaN in the float64 view; aggregates skip
        # NULLs in both engines (r9 NULL-corpus sweep), so drop them
        # before the log fold instead of letting NaN poison the mean.
        a = v.dropna().to_numpy(dtype="float64")
        if len(a) == 0:
            return None
        if (a == 0.0).any():
            return 0.0
        return float(np.exp(np.log(np.sort(a)).mean()))

    return geo_mean


def text_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF via LATERAL join: every document exploded to its sentence
    segments with positions. The UDTF runs Arrow-batched per partition —
    map-only, scales with input splits."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.udtf.register("split_sentences", make_split_sentences())
    return spark.sql(
        """
        SELECT doc_id, s.pos, s.sentence
        FROM documents, LATERAL split_sentences(text) AS s
        """
    )


def lang_chars_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom pandas UDAF in a standard groupBy: per-language geometric
    mean of document lengths, rounded to absorb cross-engine summation
    order in the log domain."""
    d = load_table(spark, sf_dir, "documents")
    geo_mean = make_geo_mean()
    # A group-aggregate pandas UDF can't share an agg with built-in
    # aggregates (INVALID_PANDAS_UDF_PLACEMENT); counts join back in.
    gm = d.groupBy("lang").agg(
        F.round(geo_mean("n_chars"), 6).alias("geomean_chars")
    )
    counts = d.groupBy("lang").agg(F.count("*").alias("n_docs"))
    # eqNullSafe: both engines keep the NULL lang GROUP, but a plain
    # equi-join drops the NULL-key row (r9 NULL-corpus sweep).
    return gm.join(
        counts, gm["lang"].eqNullSafe(counts["lang"])
    ).select(gm["lang"], "geomean_chars", "n_docs")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_sentences": text_sentences,
    "lang_chars_geomean": lang_chars_geomean,
}

ORACLES: dict[str, str] = {
    "text_sentences": """
        WITH arr AS (
            SELECT doc_id, string_split(text, '. ') AS a FROM documents
        ),
        pos AS (
            SELECT doc_id, a, generate_subscripts(a, 1) AS i FROM arr
        )
        SELECT doc_id, CAST(i AS INTEGER) AS pos, a[i] AS sentence FROM pos
    """,
    "lang_chars_geomean": """
        SELECT lang,
               -- any zero member -> geomean exactly 0.0 (udxf.make_geo_mean
               -- branches the same way; DuckDB's ln(0) is a hard error, and
               -- a CASE AROUND the aggregate does not stop the aggregate's
               -- argument from evaluating on every row — the zero must be
               -- nulled out INSIDE via nullif)
               CASE WHEN min(n_chars) = 0 THEN 0.0
                    ELSE round(exp(avg(ln(CAST(nullif(n_chars, 0) AS DOUBLE)))), 6)
               END AS geomean_chars,
               count(*) AS n_docs
        FROM documents GROUP BY lang
    """,
}
