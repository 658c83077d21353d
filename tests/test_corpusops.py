"""corpusops: DuckDB value-parity plus the semantic properties the
oracles can't express (Bloom superset guarantee, quota honoring,
both-branch liveness of every emitted flag)."""

from __future__ import annotations

import pytest

from dic_a1_spark.operators import corpusops, curation
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(corpusops.QUERIES))
def test_oracle_parity(spark, name):
    compare(spark, corpusops.ORACLES[name], corpusops.QUERIES[name], SF_CORRECT, name)


def test_bloom_never_misses_true_contamination(spark):
    """A Bloom filter admits false positives but NEVER false negatives:
    every doc the exact shingle-overlap decontamination flags must also
    be flagged by the Bloom path, and per-doc bloom hits dominate exact
    overlaps."""
    exact = {
        r["doc_id"]: r
        for r in curation.decontam_ngram_overlap(spark, SF_CORRECT).collect()
    }
    bloom = {
        r["doc_id"]: r for r in corpusops.decontam_bloom(spark, SF_CORRECT).collect()
    }
    assert set(exact) == set(bloom)  # same probe population
    for doc_id, e in exact.items():
        b = bloom[doc_id]
        assert b["n_shingles"] == e["n_shingles"]
        assert b["n_bloom_hits"] >= e["n_overlap"], doc_id
        if e["contaminated"]:
            assert b["bloom_contaminated"], doc_id
    # and the filter is selective enough to be useful on this data: the
    # false-positive surplus must not flag everything
    n_exact = sum(1 for e in exact.values() if e["contaminated"])
    n_bloom = sum(1 for b in bloom.values() if b["bloom_contaminated"])
    assert n_exact <= n_bloom < len(bloom)


def test_domain_quota_honored_and_live(spark):
    rows = corpusops.domain_quota_cap(spark, SF_CORRECT).collect()
    kept_by_domain: dict[str, int] = {}
    for r in rows:
        if r["domain"] == "(none)":
            assert r["kept"] and r["rnk"] == 0
            continue
        assert r["kept"] == (r["rnk"] <= corpusops.DOMAIN_QUOTA)
        if r["kept"]:
            kept_by_domain[r["domain"]] = kept_by_domain.get(r["domain"], 0) + 1
    assert kept_by_domain, "no URL-bearing docs — decorated view broken"
    assert all(v <= corpusops.DOMAIN_QUOTA for v in kept_by_domain.values())
    # both branches live (the Q11-vacuity rule)
    flags = {r["kept"] for r in rows}
    assert flags == {True, False}


def test_outlier_flag_both_branches_live(spark):
    rows = corpusops.quality_outlier_zscore(spark, SF_CORRECT).collect()
    flags = {r["outlier"] for r in rows}
    assert flags == {True, False}
    for r in rows:
        assert r["outlier"] == (abs(r["z_r"]) > corpusops.OUTLIER_Z) or (
            # rounding can flip the comparison only within half an ulp of
            # the threshold; allow the boundary band
            abs(abs(r["z_r"]) - corpusops.OUTLIER_Z) < 5e-5
        )


def test_surprisal_bounds(spark):
    rows = corpusops.text_unigram_surprisal(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        # every token carries at least 1 bit (floor(N/c) >= 1) and fewer
        # than 64 (c >= 1 so floor(N/c) <= N < 2^63)
        assert r["total_bits"] >= r["n_tokens"]
        assert 1.0 <= r["avg_bits"] < 64.0


def test_bloom_bits_side_broadcasts_and_probe_is_hits_only(spark):
    """Plan pins for the scale claims in SCALING.md: the bits frame (the
    CONSTANT-bounded Bloom positions) joins by broadcast, and the outlier
    stats join is a broadcast of the dimension-sized frame."""
    from dic_a1_spark.plans.explain import has_broadcast_join

    bloom = corpusops.decontam_bloom(spark, SF_CORRECT)
    assert has_broadcast_join(bloom)
    z = corpusops.quality_outlier_zscore(spark, SF_CORRECT)
    assert has_broadcast_join(z)


def test_quota_window_excludes_no_url_class(spark):
    """The corpus-sized no-URL class must never flow through the domain
    window (the skew design): its branch of the union carries no Window
    operator."""
    from dic_a1_spark.plans.explain import formatted_plan

    import re

    plan = formatted_plan(corpusops.domain_quota_cap(spark, SF_CORRECT))
    # exactly one Window operator in the whole plan — the
    # domain-partitioned one (each operator appears once in the tree as
    # "Window (N)" and once as its "(N) Window" detail header)
    assert len(re.findall(r"Window \(\d+\)", plan)) == 1


def test_hygiene_pipeline_is_conjunction_of_stage_gates(spark):
    """The composed pipeline's admitted flag must equal the conjunction
    of the three stage verdicts, row for row, over the Bloom probe
    population."""
    stages = {
        r["doc_id"]: r
        for r in corpusops.corpus_hygiene_pipeline(spark, SF_CORRECT).collect()
    }
    bloom = {
        r["doc_id"]: r["bloom_contaminated"]
        for r in corpusops.decontam_bloom(spark, SF_CORRECT).collect()
    }
    quota = {
        r["doc_id"]: r["kept"]
        for r in corpusops.domain_quota_cap(spark, SF_CORRECT).collect()
    }
    outlier = {
        r["doc_id"]: r["outlier"]
        for r in corpusops.quality_outlier_zscore(spark, SF_CORRECT).collect()
    }
    assert set(stages) == set(bloom)  # pipeline population = probe population
    for doc_id, r in stages.items():
        want = (not bloom[doc_id]) and quota[doc_id] and (not outlier[doc_id])
        assert r["admitted"] == want, doc_id
    verdicts = {r["admitted"] for r in stages.values()}
    assert verdicts == {True, False}


def test_vocab_oov_branches_and_bounds(spark):
    """Both OOV branches populated; rates consistent with counts; the
    vocabulary actually has VOCAB_V entries (corpus vocab is larger)."""
    rows = corpusops.vocab_topv_oov(spark, SF_CORRECT).collect()
    assert any(r["n_oov"] > 0 for r in rows)
    assert any(r["n_oov"] == 0 for r in rows)
    for r in rows:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        # Spark rounds HALF_UP, Python round() is banker's — compare to
        # the unrounded ratio within the rounding quantum instead.
        assert abs(r["oov_rate"] - r["n_oov"] / r["n_tokens"]) <= 5e-5 + 1e-12


def test_datacard_cross_checks_other_operators(spark):
    """The datacard's figures must agree with the operators they
    summarize: tokenset dup census vs dedup_tokenset_groups, distinct
    words vs the OOV census population."""
    from dic_a1_spark.operators.dedup import dedup_tokenset_groups

    card = corpusops.corpus_datacard(spark, SF_CORRECT).collect()[0]
    groups = dedup_tokenset_groups(spark, SF_CORRECT).collect()
    assert card["n_docs"] == sum(r["n_docs"] for r in groups)
    assert card["tokenset_dup_docs"] == sum(r["n_docs"] - 1 for r in groups)
    assert card["distinct_words"] > corpusops.VOCAB_V
    assert 0.0 < card["lexical_density"] < 1.0
