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
