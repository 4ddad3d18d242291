"""PageRank: parity with a numpy reference of the same recurrence,
conservation/uniformity invariants, dangling-mass handling, and the
lineage-truncation time bound."""

from __future__ import annotations

import numpy as np
import pytest

from scardina_spark.operators.graphrank import pagerank


def _ref_pagerank(edges, n_iter=8, d=0.85):
    """(src, dst, w) triples -> {node: rank}, same recurrence."""
    from collections import defaultdict
    w = defaultdict(float)
    for s, t, ww in edges:
        w[(s, t)] += ww
    out = defaultdict(float)
    for (s, _), ww in w.items():
        out[s] += ww
    nodes = sorted({s for s, _ in w} | {t for _, t in w})
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(n_iter):
        dangling = sum(r for v, r in rank.items() if out[v] == 0.0)
        contrib = defaultdict(float)
        for (s, t), ww in w.items():
            contrib[t] += rank[s] * (ww / out[s])
        rank = {v: (1.0 - d) / n + d * (contrib[v] + dangling / n)
                for v in nodes}
    return rank


EDGES = [(0, 1, 1.0), (1, 2, 1.0), (2, 0, 2.0), (2, 1, 1.0),
         (0, 3, 1.0)]  # node 3 dangles


def test_pagerank_matches_reference(spark):
    df = spark.createDataFrame(EDGES, "src: long, dst: long, w: double")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, n_iter=8, weight="w").collect()}
    ref = _ref_pagerank(EDGES, n_iter=8)
    assert set(got) == set(ref)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-12), v


def test_pagerank_conserves_mass_and_handles_dangling(spark):
    df = spark.createDataFrame(EDGES, "src: long, dst: long, w: double")
    ranks = pagerank(df, n_iter=5, weight="w").collect()
    assert sum(r["rank"] for r in ranks) == pytest.approx(1.0, abs=1e-12)
    # the dangling node keeps a positive rank (it is reachable) and
    # its mass is redistributed, not lost
    assert {r["node"] for r in ranks} == {0, 1, 2, 3}
    assert all(r["rank"] > 0 for r in ranks)


def test_pagerank_uniform_on_cycle(spark):
    cyc = [(i, (i + 1) % 5) for i in range(5)]
    df = spark.createDataFrame(cyc, "src: long, dst: long")
    ranks = pagerank(df, n_iter=7).collect()
    for r in ranks:
        assert r["rank"] == pytest.approx(0.2, abs=1e-12)


def test_pagerank_unweighted_counts_parallel_edges(spark):
    # two parallel 0->1 edges vs one 0->2: 1 gets 2/3 of 0's vote
    df = spark.createDataFrame(
        [(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)], "src: long, dst: long")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=6).collect()}
    ref = _ref_pagerank([(0, 1, 2.0), (0, 2, 1.0), (1, 0, 1.0),
                         (2, 0, 1.0)], n_iter=6)
    for v in ref:
        assert got[v] == pytest.approx(ref[v], abs=1e-12)


def test_pagerank_validates_params(spark):
    df = spark.createDataFrame([(0, 1)], "src: long, dst: long")
    with pytest.raises(ValueError):
        pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)


def test_pagerank_iterations_stay_flat(spark):
    """Lineage-truncation pin (the connected_components lesson): 12
    iterations must not blow up Catalyst analysis time."""
    import time

    df = spark.createDataFrame(
        [(i, (i * 7 + 3) % 20) for i in range(40)], "src: long, dst: long")
    t0 = time.monotonic()
    pagerank(df, n_iter=12).collect()
    assert time.monotonic() - t0 < 120
