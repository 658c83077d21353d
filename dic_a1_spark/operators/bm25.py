"""BM25 lexical retrieval over the `documents` table — the ranking
function behind classic search engines (Robertson & Spärck Jones;
Robertson et al., TREC-3 Okapi) and the standard first-stage retriever
of RAG / retrieval-augmented training pipelines. A training-data
pipeline runs this to pull topical slices out of a web-scale corpus
("give me the top documents for each seed query") before expensive
model-based filtering.

Scoring. For query term t and document d with term frequency tf and
token length dl:

  score(d, Q) = sum_{t in Q}  idf_w(t) * tf * (k1 + 1)
                              -------------------------------------
                              tf + k1 * (1 - b + b * dl / avgdl)

with the repo's INTEGER staircase idf — idf_w(t) = bits(N div df(t)),
bits(v) = len(bin(v)) ~ floor(log2)+1 — instead of the textbook
ln((N-df+.5)/(df+.5)): bits() is exact BIGINT in both engines (the
lexical.py / colloc.py trick), so the only doubles are the tf
normalization (one expression, identical association both sides) and
the per-document sum of <= |Q| term contributions, which is PINNED by
sorting the contribution array before a sequential fold (the mixing.py
`_w_total` rule) — Spark's aggregate seeds 0.0 and 0.0 + x == x
bit-exact for the positive contributions, matching DuckDB's seedless
list_reduce.

Scale shape at 100 TB:
  1. Per-document (term, tf) extraction is MAP-ONLY: the query is a
     tiny LITERAL array, so tf per query term is a transform over the
     token array inside one projection — no corpus explode, no shuffle.
  2. The df census groups the per-doc hits by term: the result is
     |Q|-sized; map-side combine collapses the corpus before the
     exchange. avgdl is a 1-row aggregate.
  3. Scoring joins each doc against the |Q|-row stats frame — an
     explicit broadcast (query-sized BY CONSTRUCTION, never
     corpus-proportional — the docsim norms lesson does not apply).
  4. Top-K is TakeOrdered (per-partition heads, K-row merge on the
     driver). The batch variant pays ONE corpus fold for the whole
     batch: contrib rows are tagged with their query_ids via a
     broadcast-literal term->queries map and folded once on
     (query_id, doc_id) — batch fan-out scales the map literal and the
     group count, never the number of corpus shuffles.

Reference scope: the reference engine (mrjob WordCount/ChiSquared,
src/wordCountJob.py, src/chiSquaredJob.py) has no retrieval surface;
BM25 is part of the training-data-pipeline extension mandated by the
build brief (similarity-search family, lexical counterpart of
similarity.py's dense kNN).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dic_a1_spark.config import duckdb_tokens_sql
from dic_a1_spark.functions.text import tokens_nonempty
from dic_a1_spark.sources.readers import load_table

# Okapi constants (textbook defaults).
BM25_K1 = 1.2
BM25_B = 0.75
# The headline query: three viral terms plus the corpus' one rare term
# ("dup", df ~ 5% — the idf staircase actually separates it).
BM25_QUERY: tuple[str, ...] = ("dup", "join", "vector", "window")
BM25_TOP_K = 20
# The batch variant: named queries scored in one pass.
BM25_BATCH: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("q_dedup", ("dup", "hash", "key")),
    ("q_exec", ("scan", "filter", "merge")),
    ("q_stream", ("stream", "batch", "window")),
)
BM25_BATCH_K = 5


def _contrib() -> F.Column:
    """The per-(doc, term) BM25 contribution — ONE double expression,
    written with the identical shape in the oracle SQL."""
    tf = F.col("tf").cast("double")
    dl = F.col("dl").cast("double")
    return (
        F.col("idf_w").cast("double")
        * (tf * F.lit(BM25_K1 + 1.0))
        / (
            tf
            + F.lit(BM25_K1)
            * (
                F.lit(1.0 - BM25_B)
                + F.lit(BM25_B) * dl / F.col("avgdl")
            )
        )
    )


def _base(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """(doc_id, dl, hits array) for EVERY document (zero-hit docs carry
    an empty array) — the single corpus projection every downstream
    frame reads. PERSISTED: corpus stats, the df census, and per-query
    scoring all consume it, and without the persist each consumer
    re-tokenizes the corpus from the scan (the docsim_tfidf_topk
    lesson; measured 4 scans for bm25_topk / 12 for the batch before
    this refactor, 1 after)."""
    from pyspark import StorageLevel

    qlit = ", ".join("'" + t + "'" for t in terms)
    return (
        docs.select(
            "doc_id", tokens_nonempty(F.col("text")).alias("toks")
        )
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("dl"),
            F.expr(
                f"filter(transform(array({qlit}),"
                f" t -> struct(t AS term, CAST(size(filter(toks, w -> w = t))"
                f" AS BIGINT) AS tf)), s -> s.tf > 0)"
            ).alias("hits"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def _pipeline(
    docs: DataFrame, terms: tuple[str, ...]
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(stats 1-row, tstats |terms|-row, contrib corpus-row) — all from
    ONE persisted base projection."""
    base = _base(docs, terms)
    stats = base.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        (
            F.sum("dl").cast("double") / F.count("*").cast("double")
        ).alias("avgdl"),
    )
    hits = base.select(
        "doc_id", "dl", F.explode("hits").alias("h")
    ).select(
        "doc_id", "dl", F.col("h.term").alias("term"), F.col("h.tf").alias("tf")
    )
    tstats = (
        hits.groupBy("term")
        .agg(F.count("*").cast("bigint").alias("df"))
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            "df",
            F.length(F.bin(F.expr("n_docs div df"))).cast("bigint").alias(
                "idf_w"
            ),
        )
    )
    contrib = (
        hits.join(F.broadcast(tstats), "term")
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .select("doc_id", "dl", "term", "tf", _contrib().alias("c"))
    )
    return stats, tstats, contrib


def _fold_scores(contrib: DataFrame, *extra_keys: str) -> DataFrame:
    """(*extra_keys, doc_id, dl, n_hit_terms, score): the pinned
    sorted-fold sum. The sort-before-fold pins the double-addition
    order so Spark's aggregate and DuckDB's list_reduce are bit-equal
    regardless of how the group's rows arrive."""
    return contrib.groupBy(*extra_keys, "doc_id", "dl").agg(
        F.count("*").cast("bigint").alias("n_hit_terms"),
        F.aggregate(
            F.array_sort(F.collect_list("c")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("score"),
    )


def _scored(docs: DataFrame, terms: tuple[str, ...]) -> DataFrame:
    """Single-query scoring — a batch of one."""
    _, _, contrib = _pipeline(docs, terms)
    return _fold_scores(contrib)


def _scored_batch(
    docs: DataFrame, batch: tuple[tuple[str, tuple[str, ...]], ...]
) -> DataFrame:
    """(query_id, doc_id, dl, score): every query scored from ONE
    shared pipeline over the union of the batch's terms AND one tagged
    fold — df/idf/avgdl are query-independent, and each contrib row is
    exploded by the (broadcast-literal) term -> query_ids map, so the
    whole batch costs a single groupBy(query_id, doc_id) exchange
    instead of one corpus fold per query (the r7 B-fold shape: 13
    exchanges for the 3-query batch, vs a constant ~3 here; at a real
    thousand-query fan-out the old shape is B corpus shuffles).

    Bit-parity note: the per-(query, doc) contribution SET is identical
    to the per-query filter's (a term's contribution does not depend on
    which query asked for it), and the fold still sorts before summing,
    so scores stay bit-equal to the per-query oracle CTEs."""
    union_terms = tuple(sorted({t for _, ts in batch for t in ts}))
    _, _, contrib = _pipeline(docs, union_terms)
    qids_by_term: dict[str, list[str]] = {}
    for qid, terms in batch:
        for t in set(terms):
            qids_by_term.setdefault(t, []).append(qid)
    def _q(s: str) -> str:  # SQL single-quote literal, quote-safe
        return "'" + s.replace("'", "''") + "'"

    map_lit = ", ".join(
        "{}, array({})".format(
            _q(t), ", ".join(_q(q) for q in sorted(qids))
        )
        for t, qids in sorted(qids_by_term.items())
    )
    tagged = contrib.select(
        F.explode(
            F.element_at(F.expr(f"map({map_lit})"), F.col("term"))
        ).alias("query_id"),
        "doc_id",
        "dl",
        "c",
    )
    return _fold_scores(tagged, "query_id").select(
        "query_id", "doc_id", "dl", "score"
    )


def bm25_term_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, df, idf_w, tf_total) for the headline query's terms —
    certifies the statistics layer under the driver's value hash."""
    docs = load_table(spark, sf_dir, "documents")
    _, tstats, contrib = _pipeline(docs, BM25_QUERY)
    tf_tot = contrib.groupBy("term").agg(
        F.sum("tf").cast("bigint").alias("tf_total")
    )
    return tstats.join(tf_tot, "term").select(
        "term", "df", "idf_w", "tf_total"
    )


def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-BM25_TOP_K documents for BM25_QUERY: (rank, doc_id, dl,
    n_hit_terms, score_r). Total order (score desc, doc_id asc) — the
    scores are bit-equal across engines, so the cut is deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    scored = _scored(docs, BM25_QUERY)
    ranked = scored.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(F.desc("score"), F.asc("doc_id"))
        ).cast("bigint"),
    )
    return (
        ranked.where(F.col("rank") <= BM25_TOP_K)
        .select(
            "rank",
            "doc_id",
            "dl",
            "n_hit_terms",
            F.round("score", 4).alias("score_r"),
        )
    )


def bm25_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-BM25_BATCH_K per named query: (query_id, rank, doc_id,
    score_r) — the batch-retrieval shape: every query scored in ONE
    corpus pass (the hit extraction transforms over the union of the
    batch's term lists), ranks cut per query_id."""
    docs = load_table(spark, sf_dir, "documents")
    allq = _scored_batch(docs, BM25_BATCH)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        allq.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= BM25_BATCH_K)
        .select("query_id", "rank", "doc_id", F.round("score", 4).alias("score_r"))
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "bm25_term_stats": bm25_term_stats,
    "bm25_topk": bm25_topk,
    "bm25_batch_topk": bm25_batch_topk,
}

_TOKS = duckdb_tokens_sql()


def _hits_cte(terms: tuple[str, ...], name: str = "hits") -> str:
    qlit = ", ".join("'" + t + "'" for t in terms)
    return f"""
        {name} AS (
            SELECT d.doc_id, CAST(len(d.toks) AS BIGINT) AS dl,
                   q.term,
                   CAST(len(list_filter(d.toks, w -> w = q.term))
                        AS BIGINT) AS tf
            FROM (SELECT doc_id, {_TOKS} AS toks FROM documents) d
            CROSS JOIN (SELECT unnest([{qlit}]) AS term) q
            WHERE len(list_filter(d.toks, w -> w = q.term)) > 0
        )
    """


_STATS_CTE = f"""
        cstats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(len({_TOKS})) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE) AS avgdl
            FROM documents
        )
"""


def _tstats_cte(name: str = "tstats", hits: str = "hits") -> str:
    return f"""
        {name} AS (
            SELECT h.term, CAST(count(*) AS BIGINT) AS df,
                   CAST(length(bin(s.n_docs // CAST(count(*) AS BIGINT)))
                        AS BIGINT) AS idf_w
            FROM {hits} h CROSS JOIN cstats s
            GROUP BY h.term, s.n_docs
        )
    """


def _scored_sql(hits: str, tstats: str) -> str:
    """Per-doc pinned-fold score subquery body (identical contribution
    expression shape as `_contrib`)."""
    return f"""
        SELECT h.doc_id, h.dl,
               CAST(count(*) AS BIGINT) AS n_hit_terms,
               list_reduce(list_sort(list(
                   CAST(t.idf_w AS DOUBLE)
                   * (CAST(h.tf AS DOUBLE) * {BM25_K1 + 1.0!r})
                   / (CAST(h.tf AS DOUBLE)
                      + {BM25_K1!r} * ({1.0 - BM25_B!r}
                        + {BM25_B!r} * CAST(h.dl AS DOUBLE) / s.avgdl))
               )), (a, b) -> a + b) AS score
        FROM {hits} h
        JOIN {tstats} t USING (term)
        CROSS JOIN cstats s
        GROUP BY h.doc_id, h.dl
    """


ORACLES: dict[str, str] = {
    "bm25_term_stats": f"""
        WITH {_hits_cte(BM25_QUERY)}, {_STATS_CTE}, {_tstats_cte()}
        SELECT t.term, t.df, t.idf_w,
               (SELECT CAST(sum(h.tf) AS BIGINT) FROM hits h
                WHERE h.term = t.term) AS tf_total
        FROM tstats t
    """,
    "bm25_topk": f"""
        WITH {_hits_cte(BM25_QUERY)}, {_STATS_CTE}, {_tstats_cte()},
        scored AS ({_scored_sql("hits", "tstats")}),
        ranked AS (
            SELECT *, CAST(row_number() OVER (
                ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM scored
        )
        SELECT rank, doc_id, dl, n_hit_terms, round(score, 4) AS score_r
        FROM ranked WHERE rank <= {BM25_TOP_K}
    """,
}


def _batch_oracle() -> str:
    parts = []
    selects = []
    for qid, terms in BM25_BATCH:
        h = f"hits_{qid}"
        t = f"tstats_{qid}"
        parts.append(_hits_cte(terms, h))
        parts.append(_tstats_cte(t, h))
        selects.append(
            f"SELECT '{qid}' AS query_id, doc_id, score FROM"
            f" ({_scored_sql(h, t)})"
        )
    union = "\nUNION ALL\n".join(selects)
    return f"""
        WITH {_STATS_CTE}, {', '.join(parts)},
        allq AS ({union}),
        ranked AS (
            SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
            FROM allq
        )
        SELECT query_id, rank, doc_id, round(score, 4) AS score_r
        FROM ranked WHERE rank <= {BM25_BATCH_K}
    """


ORACLES["bm25_batch_topk"] = _batch_oracle()
