from __future__ import annotations

import numpy as np
import pytest

from berkeley_entity_spark.operators.webgraph import domain_link_edges, pagerank


def _numpy_pagerank(nodes, edges, iterations=5, damping=0.85):
    """Dense replay of the operator's exact update rule (same formula,
    different engine) for hand-checkable graphs."""
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_w = np.zeros(n)
    for s, _, w in edges:
        out_w[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d, w in edges:
            contrib[idx[d]] += r[idx[s]] * w / out_w[idx[s]]
        dangling = r[out_w == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


@pytest.fixture()
def tiny_edges(spark):
    # a -> b (weight 2), a -> c (1), b -> c (3); c is DANGLING
    rows = [("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 3.0)]
    return rows, spark.createDataFrame(rows, "src string, dst string, w double")


def test_pagerank_matches_dense_replay(tiny_edges):
    rows, edges = tiny_edges
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, iterations=5, weight_col="w").collect()
    }
    want = _numpy_pagerank(["a", "b", "c"], rows, iterations=5)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_pagerank_mass_conserved(tiny_edges):
    # teleport + dangling redistribution keep total mass at exactly 1
    _, edges = tiny_edges
    for iters in (1, 3, 7):
        ranks = [
            r["rank"] for r in pagerank(edges, iterations=iters, weight_col="w").collect()
        ]
        assert sum(ranks) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_weight_sensitivity(spark):
    # all of a's mass goes to b when the a->b weight dominates
    heavy = spark.createDataFrame(
        [("a", "b", 99.0), ("a", "c", 1.0), ("b", "a", 1.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    got = {r["node"]: r["rank"] for r in pagerank(heavy, iterations=10, weight_col="w").collect()}
    assert got["b"] > got["c"] * 5


def test_pagerank_unweighted_default(spark):
    # weight_col=None counts each edge row once
    e = spark.createDataFrame(
        [("a", "b"), ("b", "a")], "src string, dst string"
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    assert got["a"] == pytest.approx(got["b"], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_domain_link_edges_aggregates_and_drops_self(spark):
    pages = spark.createDataFrame(
        [("x", "y"), ("x", "y"), ("x", "x"), ("y", "x")],
        "src_domain string, dst_domain string",
    )
    got = {
        (r["src"], r["dst"]): r["w"]
        for r in domain_link_edges(pages).collect()
    }
    assert got == {("x", "y"): 2, ("y", "x"): 1}
