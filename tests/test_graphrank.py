"""Oracle + semantics checks for weighted PageRank (operators/graphrank.py)."""

from __future__ import annotations

import math

import pytest

from dic_a1_spark.operators import graphrank as g
from tests.conftest import SF_CORRECT
from tests.oracle_utils import compare


@pytest.mark.parametrize("name", sorted(g.ORACLES))
def test_matches_oracle(spark, name):
    compare(spark, g.ORACLES[name], g.QUERIES[name], SF_CORRECT, name)


def _edges(spark):
    return [
        (r["src"], r["dst"], r["n_lineitems"])
        for r in g.graph_nation_edges(spark, SF_CORRECT).collect()
    ]


def test_pagerank_matches_python_reference(spark):
    """Recompute weighted PageRank in plain Python (sorted-order
    contribution sums, same update expression) and require agreement
    within the rounding quantum."""
    edges = _edges(spark)
    nodes = sorted(
        {s for s, _, _ in edges} | {d for _, d, _ in edges}
    )
    n = len(nodes)
    ow = {}
    for s, _, w in edges:
        ow[s] = ow.get(s, 0) + w
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(g.PR_ITERS):
        contribs: dict[str, list[float]] = {v: [] for v in nodes}
        for s, d, w in edges:
            contribs[d].append(pr[s] * (w / ow[s]))
        nxt = {}
        for v in nodes:
            acc = 0.0
            for c in sorted(contribs[v]):
                acc += c
            nxt[v] = (1.0 - g.PR_D) / n + g.PR_D * acc
        pr = nxt
    got = {
        r["nation"]: r["rank_r"]
        for r in g.graph_pagerank(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(nodes)
    for v in nodes:
        assert math.isclose(got[v], pr[v], abs_tol=5e-9), (v, got[v], pr[v])


def test_mass_conservation_and_variation(spark):
    """No dangling nodes on this graph (the docstring's vacuity claim),
    so total rank mass must be ~1; the weighted formulation must
    actually separate the nations (the Q11 non-vacuity rule that killed
    the unweighted form)."""
    deg = g.graph_degree_census(spark, SF_CORRECT).collect()
    assert all(r["out_deg"] > 0 for r in deg), "dangling nation appeared"
    rows = g.graph_pagerank(spark, SF_CORRECT).collect()
    total = sum(r["rank_r"] for r in rows)
    assert math.isclose(total, 1.0, abs_tol=1e-6), total
    assert len({r["rank_r"] for r in rows}) > len(rows) // 2, (
        "ranks nearly uniform — weighted formulation degenerated"
    )


def test_degree_census_consistent_with_edges(spark):
    edges = _edges(spark)
    deg = {
        r["nation"]: r for r in g.graph_degree_census(spark, SF_CORRECT).collect()
    }
    for v, r in deg.items():
        assert r["out_deg"] == sum(1 for s, _, _ in edges if s == v)
        assert r["in_weight"] == sum(w for _, d, w in edges if d == v)
