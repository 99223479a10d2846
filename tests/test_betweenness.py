"""Sampled Brandes betweenness vs a pure-Python transliteration."""

from __future__ import annotations

from collections import defaultdict, deque

import numpy as np
import pandas as pd

from pagerank_cuda_dynamic_spark.operators.centrality import betweenness

from .conftest import edges_df


def _sources(spark, vals):
    return spark.createDataFrame(pd.DataFrame({"s": np.asarray(vals, dtype=np.int64)}))


def _py_brandes(pairs, sources, max_depth=10**9):
    adj = defaultdict(list)
    for s, d in set(pairs):
        if s != d:
            adj[s].append(d)
    bc = defaultdict(float)
    for s in sources:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            if dist[v] >= max_depth:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
        delta = defaultdict(float)
        for v in reversed(order):
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if v != s:
                bc[v] += delta[v]
    return dict(bc)


def test_betweenness_path(spark):
    # 0→1→2: only pair routed through 1 is (0,2)
    got = {r.v: r.bc for r in betweenness(
        edges_df(spark, [0, 1], [1, 2]), _sources(spark, [0, 1, 2])
    ).collect()}
    assert got[1] == 1.0 and got[2] == 0.0


def test_betweenness_diamond_split_paths(spark):
    # 0→{1,2}→3: two shortest 0→3 paths, each middle carries 1/2
    got = {r.v: r.bc for r in betweenness(
        edges_df(spark, [0, 0, 1, 2], [1, 2, 3, 3]), _sources(spark, [0])
    ).collect()}
    assert abs(got[1] - 0.5) < 1e-12 and abs(got[2] - 0.5) < 1e-12
    assert got[3] == 0.0


def test_betweenness_matches_python_random(spark):
    rng = np.random.default_rng(12)
    src = rng.integers(0, 18, 90)
    dst = rng.integers(0, 18, 90)
    pairs = list(zip(src.tolist(), dst.tolist()))
    sources = [0, 3, 7, 11]
    got = {r.v: r.bc for r in betweenness(
        edges_df(spark, src, dst), _sources(spark, sources)
    ).collect()}
    want = _py_brandes(pairs, sources)
    for v, b in want.items():
        assert abs(got.get(v, 0.0) - b) < 1e-9, v
    for v, b in got.items():
        assert abs(b - want.get(v, 0.0)) < 1e-9, v


def test_betweenness_max_depth_cap(spark):
    # line 0→1→2→3 from source 0 capped at depth 2: pair (0,3) never
    # found, so bc(2) counts only (0,>=?)… with cap, order stops at dist 2
    got = {r.v: r.bc for r in betweenness(
        edges_df(spark, [0, 1, 2], [1, 2, 3]), _sources(spark, [0]), max_depth=2
    ).collect()}
    want = _py_brandes([(0, 1), (1, 2), (2, 3)], [0], max_depth=2)
    for v in set(got) | set(want):
        assert abs(got.get(v, 0.0) - want.get(v, 0.0)) < 1e-12, v
