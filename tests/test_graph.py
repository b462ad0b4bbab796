"""PageRank vs a NumPy power-iteration oracle (same formula,
dangling mass redistributed uniformly)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparvi_core_spark.operators.graph import domain_authority, pagerank


def np_pagerank(n, edges, damping=0.85, iters=100, weights=None):
    """edges: list[(src, dst)] over nodes 0..n-1."""
    out_w = np.zeros(n)
    ws = weights if weights is not None else [1.0] * len(edges)
    for (s, d), w in zip(edges, ws):
        out_w[s] += w
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1 - damping) / n)
        dm = r[out_w == 0].sum()
        nr += damping * dm / n
        for (s, d), w in zip(edges, ws):
            nr[d] += damping * r[s] * (w / out_w[s])
        r = nr
    return r


def _ranks_dict(df):
    return {r.node: r.rank for r in df.collect()}


def test_pagerank_matches_numpy_oracle(spark):
    rng = np.random.RandomState(7)
    n = 30
    edges = list(
        {
            (int(a), int(b))
            for a, b in zip(rng.randint(0, n, 150), rng.randint(0, n, 150))
        }
    )
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _ranks_dict(pagerank(df, max_iter=60, tol=1e-10))
    want = np_pagerank(n, edges, iters=200)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(n):
        if i in got:
            assert got[i] == pytest.approx(want[i], abs=1e-6), i


@pytest.mark.slow
def test_pagerank_dangling_nodes_exact(spark):
    # 0 -> 1 -> 2, node 2 dangling; classic closed-form check vs oracle
    edges = [(0, 1), (1, 2)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = _ranks_dict(pagerank(df, max_iter=100, tol=1e-12))
    want = np_pagerank(3, edges, iters=500)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for i in range(3):
        assert got[i] == pytest.approx(want[i], abs=1e-8)
    assert got[2] > got[1] > got[0]  # rank flows downstream


def test_pagerank_weighted_edges(spark):
    edges = [(0, 1), (0, 2), (1, 0), (2, 0)]
    weights = [3.0, 1.0, 1.0, 1.0]
    df = spark.createDataFrame(
        [(s, d, w) for (s, d), w in zip(edges, weights)],
        ["src", "dst", "w"],
    )
    # damping=0.5: same formula, faster mixing (the star graph
    # oscillates and converges only at damping^t)
    got = _ranks_dict(
        pagerank(df, weight_col="w", damping=0.5, max_iter=60, tol=1e-10)
    )
    want = np_pagerank(3, edges, damping=0.5, iters=200, weights=weights)
    for i in range(3):
        assert got[i] == pytest.approx(want[i], abs=1e-8)
    assert got[1] > got[2]  # heavier edge attracts more rank


def test_pagerank_unconverged_raises(spark):
    # open chain: uniform init is far from the fixed point (a ring
    # would already BE stationary at uniform ranks)
    edges = [(i, i + 1) for i in range(49)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(RuntimeError, match="converge"):
        pagerank(df, max_iter=1, tol=1e-15)
    # opt-out returns the partial result
    out = pagerank(df, max_iter=1, tol=1e-15, on_max_iter="return")
    assert out.count() == 50


def test_domain_authority_collapses_pages(spark):
    links = spark.createDataFrame(
        [
            ("https://a.com/1", "https://b.com/x"),
            ("https://a.com/2", "https://b.com/y"),
            ("https://www.a.com/3", "https://b.com/z"),
            ("https://b.com/x", "https://c.org/1"),
            ("https://c.org/1", "https://a.com/1"),
            ("https://c.org/2", "https://c.org/3"),  # self-domain, dropped
        ],
        ["src_url", "dst_url"],
    )
    out = _ranks_dict(
        domain_authority(links, damping=0.5, max_iter=60, tol=1e-10)
    )
    assert set(out) == {"a.com", "b.com", "c.org"}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    # b.com receives 3 weighted in-links → highest authority
    assert out["b.com"] == max(out.values())
