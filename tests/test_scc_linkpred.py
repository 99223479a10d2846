"""SCC (FW-BW coloring) and link-prediction scores vs brute-force oracles."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from pagerank_cuda_dynamic_spark.operators.components import (
    strongly_connected_components,
)
from pagerank_cuda_dynamic_spark.operators.linkpred import link_prediction


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]).astype(str)
    )


def _np_scc(pairs):
    """Reachability-matrix SCC oracle: scc(v) = min u with v↔u."""
    verts = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    R = np.eye(n, dtype=bool)
    for u, v in pairs:
        R[idx[u], idx[v]] = True
    while True:
        R2 = R | (R @ R)
        if (R2 == R).all():
            break
        R = R2
    S = R & R.T
    return {v: verts[int(np.nonzero(S[i])[0].min())] for v, i in idx.items()}


def _scc_dict(df):
    pdf = df.toPandas()
    return dict(zip(pdf["v"], pdf["scc"]))


def test_scc_two_chained_cycles(spark):
    # cycle A {a1,a2,a3} -> cycle B {b1,b2,b3}: two SCCs, 2 peel rounds
    pairs = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
        ("a1", "b1"),
    ]
    got = _scc_dict(strongly_connected_components(_edges(spark, pairs)))
    assert got == _np_scc(pairs)
    assert got["b2"] == "b1" and got["a3"] == "a1"


def test_scc_dag_of_singletons(spark):
    pairs = [("v1", "v2"), ("v2", "v3"), ("v3", "v4")]
    got = _scc_dict(strongly_connected_components(_edges(spark, pairs)))
    assert got == {f"v{i}": f"v{i}" for i in range(1, 5)}


def test_scc_self_loop_only_vertex_kept(spark):
    pairs = [("a", "b"), ("b", "a"), ("z", "z")]
    got = _scc_dict(strongly_connected_components(_edges(spark, pairs)))
    assert got == {"a": "a", "b": "a", "z": "z"}


def test_scc_random_vs_oracle(spark):
    rng = np.random.default_rng(7)
    n, m = 25, 70
    pairs = [
        (f"n{int(a):02d}", f"n{int(b):02d}")
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
    ]
    got = _scc_dict(strongly_connected_components(_edges(spark, pairs)))
    assert got == _np_scc(pairs)


def test_scc_round_cap_raises(spark):
    # a 4-chain of singleton SCCs needs >2 peel rounds
    pairs = [("v1", "v2"), ("v2", "v3"), ("v3", "v4")]
    with pytest.raises(RuntimeError):
        strongly_connected_components(_edges(spark, pairs), max_outer_rounds=2)


# ---------------------------------------------------------------------------
# link prediction
# ---------------------------------------------------------------------------

BIPARTITE = [
    ("u1", "p1"), ("u1", "p2"), ("u1", "p3"),
    ("u2", "p1"), ("u2", "p2"), ("u2", "p4"),
    ("u3", "p2"), ("u3", "p3"), ("u3", "p4"), ("u3", "p5"),
    ("u4", "p5"),
]


def _np_linkpred(pairs, min_common):
    out_n: dict = {}
    in_n: dict = {}
    for a, p in set(pairs):
        out_n.setdefault(a, set()).add(p)
        in_n.setdefault(p, set()).add(a)
    rows = {}
    srcs = sorted(out_n)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            common = out_n[a] & out_n[b]
            if len(common) < min_common:
                continue
            cn = len(common)
            jac = cn / len(out_n[a] | out_n[b])
            aa = sum(1.0 / math.log(len(in_n[p])) for p in common)
            rows[(a, b)] = (cn, jac, aa)
    return rows


def test_linkpred_matches_numpy(spark):
    res = link_prediction(_edges(spark, BIPARTITE), min_common=1).toPandas()
    want = _np_linkpred(BIPARTITE, 1)
    got = {
        (r.a, r.b): (r.cn, r.jaccard, r.adamic_adar)
        for r in res.itertuples()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12
        assert abs(got[k][2] - want[k][2]) < 1e-12


def test_linkpred_min_common_bounds_output(spark):
    res2 = link_prediction(_edges(spark, BIPARTITE), min_common=2).toPandas()
    want2 = _np_linkpred(BIPARTITE, 2)
    assert {(r.a, r.b) for r in res2.itertuples()} == set(want2)
    # u4 shares only p5 with u3 -> excluded at min_common=2
    assert not any(r.a == "u4" or r.b == "u4" for r in res2.itertuples())


def test_linkpred_middle_cap_drops_hub_paths(spark):
    # p2 has indeg 3; capping at 2 removes its contribution everywhere
    res = link_prediction(
        _edges(spark, BIPARTITE), min_common=1, max_middle_indeg=2
    ).toPandas()
    filtered = [(a, p) for a, p in BIPARTITE if p != "p2"]
    want_cn = {
        k: v[0] for k, v in _np_linkpred(filtered, 1).items()
    }
    got_cn = {(r.a, r.b): r.cn for r in res.itertuples()}
    assert got_cn == want_cn


def test_linkpred_duplicate_edges_ignored(spark):
    res1 = link_prediction(_edges(spark, BIPARTITE), min_common=1).toPandas()
    res2 = link_prediction(
        _edges(spark, BIPARTITE + BIPARTITE[:4]), min_common=1
    ).toPandas()
    k = ["a", "b"]
    assert (
        res1.sort_values(k).reset_index(drop=True).round(9).equals(
            res2.sort_values(k).reset_index(drop=True).round(9)
        )
    )


def test_linkpred_rejects_bad_min_common(spark):
    with pytest.raises(ValueError):
        link_prediction(_edges(spark, BIPARTITE), min_common=0)
