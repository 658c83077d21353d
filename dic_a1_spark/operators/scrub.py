"""PII scrubbing and URL/domain analytics over the `documents` table.

Web-scale training corpora are scrubbed of personally identifiable
information (emails, URLs, IP addresses) before training; the scrub is a
pure map pass — regex detection + replacement per document — which is
exactly the shape Spark executes best (codegen'd string expressions, no
shuffle, linear in input splits at 100 TB).

The driver's synthetic `documents.text` is tokenizer word-salad with no
real PII, so a scrub over the raw column would be vacuous (zero matches —
the Q11-vacuity trap from round 3). Instead the operators run over a
DETERMINISTICALLY DECORATED view: a doc_id-derived email / URL / IPv4 is
appended to fixed residue classes of doc_id, with byte-identical
derivation in Spark and in the DuckDB oracle (pure integer modulo +
string concat). That keeps every query non-vacuous and fully
value-hash-verifiable while still being driven by the driver's tables —
the same derived-view pattern as curation.py's benchmark stand-in.

Regex portability: patterns below are restricted to the syntax subset
Java `java.util.regex` (Spark) and RE2 (DuckDB) implement identically —
character classes, bounded repetition, alternation-free — no lookaround,
no backreferences, no \\b. DuckDB's regexp_replace needs the explicit
'g' flag to match Spark's replace-all default.

Scale notes: detection + replacement + counting all fuse into one
WholeStageCodegen map over the scan (PLANS.md shows 0 exchanges for the
scrub); the domain rollup shuffles only (domain, count) partials.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dic_a1_spark.sources.readers import load_table

# Residue classes that receive injected PII (overlapping on purpose:
# doc_id 0 mod 35 carries an email AND a url, etc.).
EMAIL_MOD = 5
URL_MOD = 7
IP_MOD = 11

# Java-regex / RE2 common-subset patterns.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
URL_RE = "https?://[A-Za-z0-9._/-]+"
IP_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
# Capture group 1 = the host part of a URL.
DOMAIN_RE = "https?://([A-Za-z0-9._-]+)"


def _decorated(docs: DataFrame) -> DataFrame:
    """Append doc_id-derived PII to fixed residue classes — the
    engine-neutral decorated view both the Spark queries and the DuckDB
    oracles are defined over."""
    d = F.col("doc_id")
    s = d.cast("string")
    email = F.when(
        d % EMAIL_MOD == 0,
        F.concat(
            F.lit(" contact user"), s,
            F.lit("@mail"), (d % 7).cast("string"), F.lit(".example.com"),
        ),
    ).otherwise(F.lit(""))
    url = F.when(
        d % URL_MOD == 0,
        F.concat(
            F.lit(" see https://site"), (d % 13).cast("string"),
            F.lit(".example.org/p"), s,
        ),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % IP_MOD == 0,
        F.concat(
            F.lit(" from 10."), (d % 256).cast("string"),
            F.lit("."), ((d * 7) % 256).cast("string"),
            F.lit("."), ((d * 13) % 251).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.withColumn("text", F.concat("text", email, url, ip))


def _count(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document PII detection + redaction: match counts per category
    and the scrubbed text. Redaction is staged URL -> email -> IP, and
    each count is computed on ITS stage's input, so n_urls/n_emails/n_ips
    are exactly the substitutions each stage performs (counting every
    pattern on the raw text instead double-counts overlaps — an email
    inside a URL's userinfo would be reported as scrubbed while the URL
    stage already consumed part of it and left the rest in clean_text)."""
    docs = _decorated(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    after_url = F.regexp_replace(t, URL_RE, "<URL>")
    after_email = F.regexp_replace(after_url, EMAIL_RE, "<EMAIL>")
    clean = F.regexp_replace(after_email, IP_RE, "<IP>")
    return docs.select(
        "doc_id",
        "source",
        _count(after_url, EMAIL_RE).alias("n_emails"),
        _count(t, URL_RE).alias("n_urls"),
        _count(after_email, IP_RE).alias("n_ips"),
        clean.alias("clean_text"),
    )


def text_pii_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level scrub report, per source: documents touched, matches
    per category — the audit table a scrub job publishes next to its
    output."""
    per_doc = text_pii_scrub(spark, sf_dir)
    any_pii = (
        (F.col("n_emails") + F.col("n_urls") + F.col("n_ips")) > 0
    ).cast("long")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(any_pii).alias("docs_with_pii"),
            F.sum("n_emails").alias("total_emails"),
            F.sum("n_urls").alias("total_urls"),
            F.sum("n_ips").alias("total_ips"),
        )
    )


def text_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain frequency table from in-text URLs: extract host via the
    capture group, explode, aggregate. The per-domain rollup is the
    source-quality signal (block/allow lists) a web-corpus pipeline
    maintains; only (domain, partial-count) rows ever shuffle."""
    docs = _decorated(load_table(spark, sf_dir, "documents"))
    domains = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col("text"), F.lit(DOMAIN_RE), 1)
        ).alias("domain"),
    )
    return domains.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_pii_scrub": text_pii_scrub,
    "text_pii_summary": text_pii_summary,
    "text_url_domains": text_url_domains,
}

# Shared decorated-view CTE — byte-identical derivation of the injected
# PII (integer modulo + decimal-cast concat matches Spark exactly).
# Public: corpusops.py builds its domain-quota oracle over the same
# decorated view — ONE definition so the derivations cannot fork.
DECOR_CTE = f"""
    WITH decorated AS (
        SELECT doc_id, source,
               text
               || CASE WHEN doc_id % {EMAIL_MOD} = 0
                       THEN ' contact user' || CAST(doc_id AS VARCHAR)
                            || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                            || '.example.com'
                       ELSE '' END
               || CASE WHEN doc_id % {URL_MOD} = 0
                       THEN ' see https://site' || CAST(doc_id % 13 AS VARCHAR)
                            || '.example.org/p' || CAST(doc_id AS VARCHAR)
                       ELSE '' END
               || CASE WHEN doc_id % {IP_MOD} = 0
                       THEN ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                            || '.' || CAST((doc_id * 7) % 256 AS VARCHAR)
                            || '.' || CAST((doc_id * 13) % 251 AS VARCHAR)
                       ELSE '' END
               AS text
        FROM documents
    )
"""

# Staged texts: each count runs on its redaction stage's input (see
# text_pii_scrub docstring).
_AFTER_URL = f"regexp_replace(text, '{URL_RE}', '<URL>', 'g')"
_AFTER_EMAIL = f"regexp_replace({_AFTER_URL}, '{EMAIL_RE}', '<EMAIL>', 'g')"
_N_EMAILS = f"CAST(len(regexp_extract_all({_AFTER_URL}, '{EMAIL_RE}')) AS INTEGER)"
_N_URLS = f"CAST(len(regexp_extract_all(text, '{URL_RE}')) AS INTEGER)"
_N_IPS = f"CAST(len(regexp_extract_all({_AFTER_EMAIL}, '{IP_RE}')) AS INTEGER)"

ORACLES: dict[str, str] = {
    "text_pii_scrub": DECOR_CTE
    + f"""
    SELECT doc_id, source,
           {_N_EMAILS} AS n_emails,
           {_N_URLS} AS n_urls,
           {_N_IPS} AS n_ips,
           regexp_replace({_AFTER_EMAIL}, '{IP_RE}', '<IP>', 'g') AS clean_text
    FROM decorated
    """,
    "text_pii_summary": DECOR_CTE
    + f"""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN {_N_EMAILS} + {_N_URLS} + {_N_IPS} > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
           CAST(sum({_N_EMAILS}) AS BIGINT) AS total_emails,
           CAST(sum({_N_URLS}) AS BIGINT) AS total_urls,
           CAST(sum({_N_IPS}) AS BIGINT) AS total_ips
    FROM decorated
    GROUP BY source
    """,
    "text_url_domains": DECOR_CTE
    + f"""
    , hits AS (
        SELECT doc_id,
               unnest(regexp_extract_all(text, '{DOMAIN_RE}', 1)) AS domain
        FROM decorated
    )
    SELECT domain,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM hits
    GROUP BY domain
    """,
}
