"""local_clustering + sample_neighbors + propagate_features.

Ground truths: hand-computed coefficients on named micro-graphs, a
triangle_count cross-check (Σ tri(v) = 3·#triangles), a pure-Python
argsort reference for the sampler, and a NumPy mean-aggregation
recurrence for propagation.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pytest

from pagerank_cuda_dynamic_spark.operators.components import (
    local_clustering,
    triangle_count,
)
from pagerank_cuda_dynamic_spark.operators.features import (
    collect_features,
    explode_features,
    propagate_features,
)
from pagerank_cuda_dynamic_spark.operators.walks import md5_walk_hash, sample_neighbors

from .conftest import edges_df


def _lcc_map(df):
    return {r.v: (r.d, r.tri, r.lcc) for r in df.collect()}


def test_local_clustering_k4_minus_edge(spark):
    # K4 minus edge (2,3): triangles {0,1,2} and {0,1,3}
    got = _lcc_map(local_clustering(edges_df(spark, [0, 0, 0, 1, 1], [1, 2, 3, 2, 3])))
    assert got[0] == (3, 2, 2 * 2 / (3 * 2))
    assert got[1] == (3, 2, 2 * 2 / (3 * 2))
    assert got[2] == (2, 1, 1.0)
    assert got[3] == (2, 1, 1.0)


def test_local_clustering_star_and_degree1(spark):
    got = _lcc_map(local_clustering(edges_df(spark, [1, 2, 3], [0, 0, 0])))
    assert got[0] == (3, 0, 0.0)
    for leaf in (1, 2, 3):
        assert got[leaf] == (1, 0, 0.0)


def test_local_clustering_ignores_selfloops_and_direction(spark):
    base = local_clustering(edges_df(spark, [0, 0, 1], [1, 2, 2]))
    noisy = local_clustering(
        edges_df(spark, [0, 0, 1, 1, 2, 2, 0], [1, 2, 2, 0, 0, 2, 0])
    )
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, noisy.collect()))


def test_local_clustering_sums_to_triangle_count(spark):
    rng = np.random.default_rng(5)
    src = rng.integers(0, 25, 150)
    dst = rng.integers(0, 25, 150)
    e = edges_df(spark, src, dst)
    total = triangle_count(e).collect()[0]["n_triangles"]
    per_v = local_clustering(e).agg(F.sum("tri")).collect()[0][0]
    assert per_v == 3 * total


# ---------------------------------------------------------------------------
# sample_neighbors
# ---------------------------------------------------------------------------


def _py_md5(s, d, seed):
    return int(hashlib.md5(f"{s}#0#{d}#{seed}".encode()).hexdigest()[:15], 16)


def test_sample_neighbors_matches_python_reference(spark):
    rng = np.random.default_rng(3)
    src = rng.integers(0, 20, 200)
    dst = rng.integers(0, 20, 200)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    got = {
        (r.src, r.pos): r.dst
        for r in sample_neighbors(
            edges_df(spark, src, dst), k=3, seed=9, hash_fn=md5_walk_hash
        ).collect()
    }
    adj: dict[int, set[int]] = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        adj.setdefault(s, set()).add(d)
    want = {}
    for s, nbrs in adj.items():
        ranked = sorted(nbrs, key=lambda d: (_py_md5(s, d, 9), d))[:3]
        for i, d in enumerate(ranked, 1):
            want[(s, i)] = d
    assert got == want


def test_sample_neighbors_partition_invariant_and_bounded(spark):
    rng = np.random.default_rng(4)
    src = rng.integers(0, 30, 400)
    dst = rng.integers(0, 30, 400)
    e = edges_df(spark, src, dst)
    a = sorted(map(tuple, sample_neighbors(e, k=2, seed=1).collect()))
    b = sorted(map(tuple, sample_neighbors(e.repartition(17, "dst"), k=2, seed=1).collect()))
    assert a == b
    per_src = {}
    eset = set(zip(src.tolist(), dst.tolist()))
    for s, d, pos in a:
        assert (s, d) in eset and 1 <= pos <= 2
        per_src[s] = per_src.get(s, 0) + 1
    assert max(per_src.values()) <= 2


# ---------------------------------------------------------------------------
# propagate_features
# ---------------------------------------------------------------------------


def _feats_df(spark, x):
    rows = [
        (v, dim, float(val)) for v, vec in x.items() for dim, val in enumerate(vec)
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["v", "dim", "val"])
    )


def _np_hop(edges, x, include_self):
    nbrs: dict[int, list[int]] = {}
    for s, d in edges:
        nbrs.setdefault(d, []).append(s)
    verts = {v for e in edges for v in e}
    if include_self:
        for v in verts:
            nbrs.setdefault(v, []).append(v)
    out = {}
    for v, ins in nbrs.items():
        vecs = [x[u] for u in set(ins) if u in x]
        if vecs:
            out[v] = np.mean(vecs, axis=0)
    return out


def test_propagate_one_hop_matches_numpy(spark):
    edges = [(0, 2), (1, 2), (2, 3), (0, 3)]
    x = {0: np.array([1.0, 0.0]), 1: np.array([3.0, 4.0]), 2: np.array([5.0, -2.0])}
    got = propagate_features(
        edges_df(spark, [e[0] for e in edges], [e[1] for e in edges]),
        _feats_df(spark, x),
        hops=1,
    )
    want = _np_hop(edges, x, include_self=False)
    gm = {(r.v, r.dim): r.val for r in got.collect()}
    assert set(gm) == {(v, d) for v in want for d in range(2)}
    for (v, d), val in gm.items():
        assert abs(val - want[v][d]) < 1e-12


def test_propagate_two_hops_is_iterated_hop(spark):
    rng = np.random.default_rng(8)
    src = rng.integers(0, 15, 60)
    dst = rng.integers(0, 15, 60)
    keep = src != dst
    edges = list(set(zip(src[keep].tolist(), dst[keep].tolist())))
    x = {v: rng.normal(size=3) for v in range(15)}
    got = propagate_features(
        edges_df(spark, [e[0] for e in edges], [e[1] for e in edges]),
        _feats_df(spark, x),
        hops=2,
        include_self=True,
    )
    want = _np_hop(edges, _np_hop(edges, x, True), True)
    gm = {(r.v, r.dim): r.val for r in got.collect()}
    assert set(gm) == {(v, d) for v in want for d in range(3)}
    for (v, d), val in gm.items():
        assert abs(val - want[v][d]) < 1e-10


def test_explode_collect_roundtrip(spark):
    pdf = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]]}
    )
    df = spark.createDataFrame(pdf)
    rel = explode_features(df, "vec_id", "embedding")
    back = {r.v: list(r.x) for r in collect_features(rel).collect()}
    assert back == {1: [1.0, 2.0, 3.0], 2: [4.0, 5.0, 6.0]}


# ---------------------------------------------------------------------------
# fastrp_embeddings
# ---------------------------------------------------------------------------


def test_fastrp_matches_manual_recurrence(spark):
    """Recover R from the sign-hash expression directly (the hash is
    JVM-side, so one tiny Spark projection reads the sign decisions),
    then verify the two-hop weighted combination against a numpy
    in-neighbor mean-propagation replay."""
    import pyspark.sql.functions as F
    from pagerank_cuda_dynamic_spark.operators.features import fastrp_embeddings

    src = [0, 1, 2, 0, 3]
    dst = [2, 2, 3, 3, 1]
    e = edges_df(spark, src, dst)
    dims, s = 3, 3
    # reproduce R exactly as the operator builds it
    verts = sorted({*src, *dst})
    vdf = spark.createDataFrame(pd.DataFrame({"v": np.array(verts, dtype=np.int64)}))
    rows = (
        vdf.select("v", F.explode(F.sequence(F.lit(0), F.lit(dims - 1))).alias("dim"))
        .select(
            "v",
            "dim",
            F.pmod(
                F.xxhash64(F.concat_ws(":", F.col("v").cast("string"), F.col("dim"))),
                F.lit(2 * s),
            ).alias("m"),
        )
        .collect()
    )
    root = np.sqrt(float(s))
    R = np.zeros((max(verts) + 1, dims))
    for r in rows:
        R[r.v, r.dim] = root if r.m == 0 else (-root if r.m == 1 else 0.0)
    # in-neighbor mean with self-loops, twice
    nbrs = {v: [v] for v in verts}
    for u, w in zip(src, dst):
        nbrs[w].append(u)
    def hop(X):
        out = np.zeros_like(X)
        for v in verts:
            out[v] = np.mean([X[u] for u in sorted(set(nbrs[v]))], axis=0)
        return out
    H1 = hop(R)
    H2 = hop(H1)
    want = 0.25 * R + 0.5 * H1 + 1.0 * H2
    got = fastrp_embeddings(
        e, dims=dims, weights=(0.5, 1.0), self_weight=0.25, include_self=True
    ).collect()
    assert len(got) == len(verts) * dims
    for r in got:
        assert abs(r.val - want[r.v, r.dim]) < 1e-12, (r.v, r.dim)


def test_fastrp_normalize_unit_rows_and_layout_invariance(spark):
    from pagerank_cuda_dynamic_spark.operators.features import fastrp_embeddings

    rng = np.random.default_rng(5)
    src = rng.integers(0, 20, 80)
    dst = rng.integers(0, 20, 80)
    e = edges_df(spark, src, dst)
    emb = fastrp_embeddings(e, dims=8, weights=(0.5, 1.0), normalize=True)
    pdf = emb.toPandas()
    norms = pdf.groupby("v")["val"].apply(lambda s: np.sqrt((s**2).sum()))
    # every row is unit-norm or exactly zero (all-zero projection rows)
    assert ((np.abs(norms - 1.0) < 1e-9) | (norms == 0.0)).all()
    a = sorted(map(tuple, emb.collect()))
    b = sorted(map(tuple, fastrp_embeddings(
        e.repartition(7), dims=8, weights=(0.5, 1.0), normalize=True
    ).collect()))
    assert a == b


def test_fastrp_validates_args(spark):
    from pagerank_cuda_dynamic_spark.operators.features import fastrp_embeddings

    e = edges_df(spark, [0], [1])
    with pytest.raises(ValueError, match="weights"):
        fastrp_embeddings(e, weights=())
    with pytest.raises(ValueError, match="sparsity"):
        fastrp_embeddings(e, sparsity=0)
    # dims=0 would make F.sequence(0, -1) emit the DESCENDING [0, -1]
    # and silently return a bogus 2-dim embedding keyed by dim=-1
    with pytest.raises(ValueError, match="dims"):
        fastrp_embeddings(e, dims=0)
    # all-zero combination used to run every hop job then IndexError
    with pytest.raises(ValueError, match="zero"):
        fastrp_embeddings(e, weights=(0.0,), self_weight=0.0)
