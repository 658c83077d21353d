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
