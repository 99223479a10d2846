"""Katz centrality + structural statistics (reciprocity, assortativity,
average neighbor degree) vs NumPy recurrences and hand-computed values."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from pagerank_cuda_dynamic_spark.operators.centrality import katz
from pagerank_cuda_dynamic_spark.operators.graph import (
    avg_neighbor_degree,
    degree_assortativity,
    reciprocity,
)

from .conftest import edges_df


def _np_katz(n, src, dst, alpha, beta, iters):
    x = np.full(n, beta)
    pairs = {(s, d) for s, d in zip(src, dst) if s != d}
    for _ in range(iters - 1):
        acc = np.zeros(n)
        for s, d in pairs:
            acc[d] += x[s]
        x = beta + alpha * acc
    return x


def test_katz_matches_numpy(spark):
    rng = np.random.default_rng(2)
    src = rng.integers(0, 20, 100).tolist()
    dst = rng.integers(0, 20, 100).tolist()
    got = {r.v: r.katz for r in katz(edges_df(spark, src, dst), 0.05, 1.0, 10).collect()}
    want = _np_katz(20, src, dst, 0.05, 1.0, 10)
    pairs = {(s, d) for s, d in zip(src, dst) if s != d}
    verts = {v for e in pairs for v in e}
    assert set(got) == verts
    for v in verts:
        assert abs(got[v] - want[v]) < 1e-10


def test_katz_one_iteration_is_beta(spark):
    got = {r.v: r.katz for r in katz(edges_df(spark, [0, 1], [1, 2]), 0.5, 2.0, 1).collect()}
    assert got == {0: 2.0, 1: 2.0, 2: 2.0}


def test_katz_line_counts_walks(spark):
    # line 0→1→2: katz(2) after 3 iters = β(1 + α + α²) with β=1
    a = 0.1
    got = {r.v: r.katz for r in katz(edges_df(spark, [0, 1], [1, 2]), a, 1.0, 3).collect()}
    assert abs(got[0] - 1.0) < 1e-12
    assert abs(got[1] - (1 + a)) < 1e-12
    assert abs(got[2] - (1 + a + a * a)) < 1e-12


def test_reciprocity_values(spark):
    # 0↔1 mutual, 0→2 one-way, self-loop ignored
    row = reciprocity(edges_df(spark, [0, 1, 0, 2], [1, 0, 2, 2])).collect()[0]
    assert (row.n_edges, row.n_reciprocal) == (3, 2)
    assert abs(row.reciprocity - 2 / 3) < 1e-12


def test_assortativity_star_is_negative_one(spark):
    # star: every edge joins degree-1 to degree-5 → r = −1
    row = degree_assortativity(edges_df(spark, [1, 2, 3, 4, 5], [0] * 5)).collect()[0]
    assert row.m == 10
    assert abs(row.r - (-1.0)) < 1e-12


def test_assortativity_matches_numpy_corrcoef(spark):
    rng = np.random.default_rng(6)
    src = rng.integers(0, 15, 80)
    dst = rng.integers(0, 15, 80)
    row = degree_assortativity(edges_df(spark, src, dst)).collect()[0]
    und = {(s, d) for s, d in zip(src.tolist(), dst.tolist()) if s != d}
    und |= {(d, s) for s, d in und}
    deg: dict[int, int] = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    xs = [deg[s] for s, d in sorted(und)]
    ys = [deg[d] for s, d in sorted(und)]
    want = np.corrcoef(xs, ys)[0, 1]
    assert row.m == len(und)
    assert abs(row.r - want) < 1e-10


def test_avg_neighbor_degree(spark):
    # path 0–1–2 (undirected): knn(0)=2, knn(1)=1, knn(2)=2
    got = {r.v: (r.d, r.knn) for r in avg_neighbor_degree(edges_df(spark, [0, 1], [1, 2])).collect()}
    assert got == {0: (1, 2.0), 1: (2, 1.0), 2: (1, 2.0)}


def _np_eigen(n, src, dst, iters):
    pairs = {(s, d) for s, d in zip(src, dst) if s != d}
    verts = sorted({v for e in pairs for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    x = np.full(len(verts), 1.0 / np.sqrt(len(verts)))
    for _ in range(iters):
        acc = np.zeros(len(verts))
        for s, d in pairs:
            acc[idx[d]] += x[idx[s]]
        nrm = np.sqrt((acc * acc).sum())
        x = acc / nrm if nrm else acc
    return {v: x[idx[v]] for v in verts}


def test_eigenvector_matches_numpy(spark):
    from pagerank_cuda_dynamic_spark.operators.centrality import eigenvector_centrality

    rng = np.random.default_rng(9)
    src = np.concatenate([rng.integers(0, 12, 60), np.arange(12)]).tolist()
    dst = np.concatenate([rng.integers(0, 12, 60), (np.arange(12) + 1) % 12]).tolist()
    got = {r.v: r.score for r in eigenvector_centrality(edges_df(spark, src, dst), 15).collect()}
    want = _np_eigen(12, src, dst, 15)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-10


def test_closeness_line(spark):
    from pagerank_cuda_dynamic_spark.operators.graph import closeness_centrality

    import pandas as pd

    srcs = spark.createDataFrame(pd.DataFrame({"s": np.arange(5, dtype=np.int64)}))
    got = {
        r.v: (r.n_reached, r.closeness)
        for r in closeness_centrality(edges_df(spark, [0, 1, 2, 3], [1, 2, 3, 4]), srcs).collect()
    }
    # directed line: v reached from u<v at dist v-u
    for v in range(1, 5):
        total = sum(v - u for u in range(v))
        assert got[v] == (v, v / total)
    assert 0 not in got


def test_degree_powerlaw_python_oracle(spark):
    """α̂ vs a literal NumPy transcription of CSN eq. 3.1 on a random
    multigraph (dupes/self-loops/directions normalized away first)."""
    import numpy as np
    import pandas as pd

    from pagerank_cuda_dynamic_spark.operators.graph import degree_powerlaw

    rng = np.random.default_rng(17)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    e = spark.createDataFrame(pd.DataFrame({"src": src, "dst": dst}))
    row = degree_powerlaw(e, d_min=3).collect()[0]

    E = {tuple(sorted(p)) for p in zip(src.tolist(), dst.tolist()) if p[0] != p[1]}
    deg: dict = {}
    for a, b in E:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    ds = np.array([d for d in deg.values() if d >= 3], dtype=float)
    want = 1.0 + len(ds) / np.log(ds / 2.5).sum()
    assert row.n_vertices == len(deg)
    assert row.n_tail == len(ds)
    assert abs(row.alpha - want) < 1e-6


def test_degree_powerlaw_exact_star(spark):
    """Star with 6 leaves, d_min=2: only the hub is in the tail —
    α̂ = 1 + 1/ln(6/1.5) = 1 + 1/ln 4."""
    import math

    import pandas as pd

    from pagerank_cuda_dynamic_spark.operators.graph import degree_powerlaw

    e = spark.createDataFrame(
        pd.DataFrame({"src": ["h"] * 6, "dst": [f"l{i}" for i in range(6)]})
    )
    row = degree_powerlaw(e, d_min=2).collect()[0]
    assert (row.n_vertices, row.n_tail, row.d_min) == (7, 1, 2)
    assert abs(row.alpha - (1 + 1 / math.log(4.0))) < 1e-6
