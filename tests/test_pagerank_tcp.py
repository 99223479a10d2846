"""TCP ring-exchange BSP parity — the cross-node execution path (no shared
filesystem; rendezvous + peer sockets only)."""

from __future__ import annotations

import numpy as np
import pytest

from pagerank_cuda_dynamic_spark.operators.pagerank import (
    PagerankOptions,
    pagerank_static,
)
from pagerank_cuda_dynamic_spark.operators.pagerank_tcp import pagerank_static_tcp
from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot

from .conftest import MICRO_GRAPHS, edges_df


def test_tcp_matches_csr(spark):
    rng = np.random.default_rng(53)
    n, m = 2000, 14000
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    g = GraphSnapshot.build(edges_df(spark, src, dst), n=n)
    a = pagerank_static_tcp(g)
    b = pagerank_static(g, PagerankOptions(mode="csr"))
    assert np.allclose(a.ranks, b.ranks, atol=1e-10)
    assert a.iterations == b.iterations
    assert a.state.get("exchange") == "tcp-ring"
    g.unpersist()


def test_tcp_salted_hubs_parity(spark):
    """Force hub salting on a star-heavy graph; the TCP ring's two-phase
    (partial-allreduce + rank-allgather) must match the csr path exactly."""
    from pagerank_cuda_dynamic_spark.operators import pagerank_tcp as PT
    from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import bsp_pack

    rng = np.random.default_rng(59)
    n = 300
    src = np.concatenate([rng.integers(2, n, 150), rng.integers(2, n, 120),
                          rng.integers(0, n, 400)])
    dst = np.concatenate([np.zeros(150, np.int64), np.ones(120, np.int64),
                          rng.integers(0, n, 400)])
    g = GraphSnapshot.build(edges_df(spark, src, dst), n=n)
    orig = PT.bsp_pack
    PT.bsp_pack = lambda gr: bsp_pack(gr, hub_factor=0.05)  # force salting
    try:
        a = pagerank_static_tcp(g)
    finally:
        PT.bsp_pack = orig
    b = pagerank_static(g, PagerankOptions(mode="csr"))
    assert np.allclose(a.ranks, b.ranks, atol=1e-10)
    assert a.iterations == b.iterations
    g.unpersist()


def test_tcp_warm_start(spark):
    n, src, dst = MICRO_GRAPHS["diamond"]
    g = GraphSnapshot.build(edges_df(spark, src, dst), n=n)
    base = pagerank_static_tcp(g)
    warm = pagerank_static_tcp(g, q=base.ranks)
    assert warm.iterations <= 2
    assert np.allclose(warm.ranks, base.ranks, atol=1e-9)
    g.unpersist()
