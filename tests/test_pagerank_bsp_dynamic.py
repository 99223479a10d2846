"""BSP dynamic variants (ND/DT/DF/DF-P) match static recompute (main.cu
invariant) and the per-superstep csr implementations."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pagerank_cuda_dynamic_spark.operators.graph import tidy_batch
from pagerank_cuda_dynamic_spark.operators.pagerank import (
    pagerank_dynamic_frontier,
    pagerank_dynamic_frontier_prune,
)
from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import (
    pagerank_dynamic_frontier_bsp,
    pagerank_dynamic_frontier_prune_bsp,
    pagerank_dynamic_traversal_bsp,
    pagerank_static_bsp,
)
from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot

from .conftest import edges_df


@pytest.fixture(scope="module")
def bsp_batch_setup(spark):
    rng = np.random.default_rng(29)
    n = 150
    src = rng.integers(0, n, 700)
    dst = rng.integers(0, n, 700)
    keep = src != dst
    g0 = GraphSnapshot.build(edges_df(spark, src[keep], dst[keep]), n=n)
    base = pagerank_static_bsp(g0)
    ins_pdf = pd.DataFrame(
        {"src": rng.integers(0, n, 40), "dst": rng.integers(0, n, 40)}
    )
    ins_pdf = ins_pdf[ins_pdf.src != ins_pdf.dst]
    pool = np.stack([src[keep], dst[keep]], axis=1)
    pick = rng.choice(len(pool), 25, replace=False)
    del_pdf = pd.DataFrame({"src": pool[pick, 0], "dst": pool[pick, 1]})
    dels, ins = tidy_batch(
        g0.edges, spark.createDataFrame(del_pdf), spark.createDataFrame(ins_pdf)
    )
    dels, ins = dels.persist(), ins.persist()
    g1 = g0.with_batch(dels, ins)
    oracle = pagerank_static_bsp(g1)
    return g0, g1, dels, ins, base.ranks, oracle.ranks


def test_bsp_dt_matches_static(bsp_batch_setup):
    g0, g1, dels, ins, q, want = bsp_batch_setup
    res = pagerank_dynamic_traversal_bsp(g0, g1, dels, ins, q)
    assert res.affected_initial > 0
    assert np.allclose(res.ranks, want, atol=1e-6)


def test_bsp_df_matches_static_and_csr(bsp_batch_setup):
    g0, g1, dels, ins, q, want = bsp_batch_setup
    res = pagerank_dynamic_frontier_bsp(g0, g1, dels, ins, q)
    assert np.allclose(res.ranks, want, atol=1e-6)
    csr = pagerank_dynamic_frontier(g0, g1, dels, ins, q)
    assert np.allclose(res.ranks, csr.ranks, atol=1e-9)
    assert res.iterations == csr.iterations


def test_bsp_dfp_matches_static_and_csr(bsp_batch_setup):
    g0, g1, dels, ins, q, want = bsp_batch_setup
    res = pagerank_dynamic_frontier_prune_bsp(g0, g1, dels, ins, q)
    assert np.allclose(res.ranks, want, atol=1e-6)
    csr = pagerank_dynamic_frontier_prune(g0, g1, dels, ins, q)
    assert np.allclose(res.ranks, csr.ranks, atol=1e-9)


def test_delta_pack_matches_full_pack(spark):
    """with_batch children of a packed parent take the incremental
    delta-pack path (packed DataFrame slot is None) and must produce
    IDENTICAL graph state to a from-scratch pack: same ranks, same
    out-degree array, same edge set on the fast (non-repartitioned)
    child.  Covers deletions + insertions, salted hubs (forced via a
    low hub_factor), and a chained second batch."""
    rng = np.random.default_rng(11)
    n = 600
    src = rng.integers(0, n, 6000)
    dst = (rng.zipf(1.3, 6000) % n).astype(np.int64)
    keep = src != dst
    g0 = GraphSnapshot.build(edges_df(spark, src[keep], dst[keep]), n=n)
    _, _, n_stripes, hubs = g0.bsp_packed(hub_factor=0.3)
    assert hubs.size > 0, "test graph must exercise the salted-hub route"
    base = pagerank_static_bsp(g0)
    ex = g0.edges.limit(120).toPandas()
    del_pdf = ex[ex.src != ex.dst].head(40)
    hub_dst = np.resize(hubs, 20)  # target hubs so hub inserts are covered
    ins_pdf = pd.DataFrame(
        {
            "src": rng.integers(0, n, 60),
            "dst": np.concatenate([hub_dst, rng.integers(0, n, 40)]),
        }
    )
    dels, ins = tidy_batch(
        g0.edges, spark.createDataFrame(del_pdf), spark.createDataFrame(ins_pdf)
    )
    dels, ins = dels.persist(), ins.persist()
    g1 = g0.with_batch(dels, ins, repartition=False)
    g1c = g0.with_batch(dels, ins)
    g1c._delta = None  # control: force the full from-scratch pack
    r1 = pagerank_static_bsp(g1)
    r1c = pagerank_static_bsp(g1c)
    assert g1._bsp_packed[0] is None, "delta path not taken"
    assert g1c._bsp_packed[0] is not None
    assert np.allclose(r1.ranks, r1c.ranks, atol=1e-12)
    assert np.array_equal(g1._outdeg_np, g1c.outdeg_array())
    a = g1.edges.toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    b = g1c.edges.toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert a.equals(b)
    # chained batch: the delta child is itself a valid delta parent
    ins2 = spark.createDataFrame(
        pd.DataFrame({"src": rng.integers(0, n, 15), "dst": rng.integers(0, n, 15)})
    )
    empty = spark.createDataFrame(
        pd.DataFrame({"src": [], "dst": []}).astype("int64"),
        schema="src long, dst long",
    )
    dels2, ins2 = tidy_batch(g1.edges, empty, ins2)
    dels2, ins2 = dels2.persist(), ins2.persist()
    g2 = g1.with_batch(dels2, ins2, repartition=False)
    g2c = g1c.with_batch(dels2, ins2)
    g2c._delta = None
    r2 = pagerank_static_bsp(g2)
    r2c = pagerank_static_bsp(g2c)
    assert g2._bsp_packed[0] is None
    assert np.allclose(r2.ranks, r2c.ranks, atol=1e-12)
    # DF-P on the delta child matches its own static recompute
    dfp = pagerank_dynamic_frontier_prune_bsp(g0, g1, dels, ins, base.ranks)
    assert np.allclose(dfp.ranks, r1.ranks, atol=1e-6)
    for x in (g0, g1, g1c, g2, g2c):
        x.unpersist()


def test_mover_bitmap_path_bit_equals_idlist_path(bsp_batch_setup, monkeypatch):
    """The two mover-exchange encodings (id-list walk vs bitmap gather —
    chosen per consumer stripe by size in auto mode) must be exact
    equivalents: same eidx sets in the same src-sorted order, so the
    frontier marks, iteration counts and every float op are identical.
    Pinned by forcing each path via SPARK_GRAFT_MOVER_BM and asserting
    bit-equal ranks on DF and DF-P (the expand modes that exchange
    movers)."""
    g0, g1, dels, ins, q, _ = bsp_batch_setup
    runs = {}
    for force in ("0", "1"):
        monkeypatch.setenv("SPARK_GRAFT_MOVER_BM", force)
        runs[force] = (
            pagerank_dynamic_frontier_bsp(g0, g1, dels, ins, q),
            pagerank_dynamic_frontier_prune_bsp(g0, g1, dels, ins, q),
        )
    monkeypatch.delenv("SPARK_GRAFT_MOVER_BM", raising=False)
    for i in range(2):
        a, b = runs["0"][i], runs["1"][i]
        assert a.iterations == b.iterations
        assert np.array_equal(a.ranks, b.ranks)  # bit-equal, not allclose
