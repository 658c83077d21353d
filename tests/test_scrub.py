"""Oracle + semantics checks for PII scrubbing / URL analytics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dic_a1_spark.operators import scrub
from dic_a1_spark.plans.explain import formatted_plan
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(scrub.ORACLES))
def test_scrub_oracle(spark, name):
    compare(spark, scrub.ORACLES[name], scrub.QUERIES[name], SF_CORRECT, name)


def test_scrub_nonvacuous_and_complete(spark):
    """Every decorated residue class is detected, and the scrubbed text
    has zero residual matches for any pattern."""
    df = scrub.text_pii_scrub(spark, SF_CORRECT)
    rows = df.collect()
    assert sum(r["n_emails"] for r in rows) > 0
    assert sum(r["n_urls"] for r in rows) > 0
    assert sum(r["n_ips"] for r in rows) > 0
    for r in rows:
        if r["doc_id"] % scrub.EMAIL_MOD == 0:
            assert r["n_emails"] >= 1, r["doc_id"]
        if r["doc_id"] % scrub.URL_MOD == 0:
            assert r["n_urls"] >= 1, r["doc_id"]
        if r["doc_id"] % scrub.IP_MOD == 0:
            assert r["n_ips"] >= 1, r["doc_id"]
    residual = df.where(
        (F.size(F.regexp_extract_all("clean_text", F.lit(scrub.EMAIL_RE), 0)) > 0)
        | (F.size(F.regexp_extract_all("clean_text", F.lit(scrub.URL_RE), 0)) > 0)
        | (F.size(F.regexp_extract_all("clean_text", F.lit(scrub.IP_RE), 0)) > 0)
    ).count()
    assert residual == 0


def test_scrub_is_map_only(spark):
    plan = formatted_plan(scrub.text_pii_scrub(spark, SF_CORRECT))
    assert "Exchange" not in plan


def test_domains_match_injection(spark):
    rows = scrub.text_url_domains(spark, SF_CORRECT).collect()
    assert rows
    assert all(r["domain"].endswith(".example.org") for r in rows)
    # 13 residues -> at most 13 distinct injected hosts
    assert len(rows) <= 13


def test_pii_regex_engine_parity_on_fuzz_corpus(spark):
    """The Java-regex/RE2 common-subset claim, tested beyond the derived
    corpus: hostile strings (nested addresses, trailing punctuation,
    IP-lookalikes, unicode neighbors) must produce byte-identical counts
    AND redactions in Spark and DuckDB."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    rng = random.Random(20260814)
    frags = [
        "a@b.co", "x.y+z%q@mail.example.com", "@nodomain", "user@",
        "https://a.b/c_d-e/f", "http://x.y", "https://", "ftp://a.b",
        "1.2.3.4", "255.255.255.255", "999.999.999.999", "1.2.3",
        "v1.2.3.4-rc", "10.0.0.1:8080", "a@b.c", "a@b.cde.",
        "müller@straße.de", "日本@例.テスト", "(paren@wrap.io)",
        "end.of.sentence. 8.8.8.8.", "a@b.co,c@d.io", " ", "",
        # URL with userinfo: URL_RE stops at '@'; the staged email pass
        # must pick up the remainder identically in both engines
        "visit https://user@example.com/profile now",
    ]
    docs = []
    for _ in range(150):
        docs.append(" ".join(rng.choice(frags) for _ in range(rng.randint(0, 6))))
    docs += frags

    df = spark.createDataFrame([(i, s) for i, s in enumerate(docs)], ["i", "t"])
    after_url = F.regexp_replace("t", scrub.URL_RE, "<URL>")
    after_email = F.regexp_replace(after_url, scrub.EMAIL_RE, "<EMAIL>")
    got = {
        r["i"]: (r["ne"], r["nu"], r["ni"], r["clean"])
        for r in df.select(
            "i",
            F.size(
                F.regexp_extract_all(after_url, F.lit(scrub.EMAIL_RE), 0)
            ).alias("ne"),
            F.size(F.regexp_extract_all("t", F.lit(scrub.URL_RE), 0)).alias("nu"),
            F.size(
                F.regexp_extract_all(after_email, F.lit(scrub.IP_RE), 0)
            ).alias("ni"),
            F.regexp_replace(after_email, scrub.IP_RE, "<IP>").alias("clean"),
        ).collect()
    }

    d_after_url = f"regexp_replace(t, '{scrub.URL_RE}', '<URL>', 'g')"
    d_after_email = (
        f"regexp_replace({d_after_url}, '{scrub.EMAIL_RE}', '<EMAIL>', 'g')"
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", list(enumerate(docs)))
    want = {
        row[0]: (row[1], row[2], row[3], row[4])
        for row in con.execute(
            f"""
            SELECT i,
                   CAST(len(regexp_extract_all({d_after_url},
                       '{scrub.EMAIL_RE}')) AS INTEGER),
                   CAST(len(regexp_extract_all(t, '{scrub.URL_RE}')) AS INTEGER),
                   CAST(len(regexp_extract_all({d_after_email},
                       '{scrub.IP_RE}')) AS INTEGER),
                   regexp_replace({d_after_email}, '{scrub.IP_RE}', '<IP>', 'g')
            FROM d
            """
        ).fetchall()
    }
    con.close()
    bad = [(i, docs[i], got[i], want[i]) for i in got if got[i] != want[i]]
    assert not bad, f"{len(bad)} engine mismatches; first: {bad[:2]}"
