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


def test_tcp_warm_start(spark):
    n, src, dst = MICRO_GRAPHS["diamond"]
    g = GraphSnapshot.build(edges_df(spark, src, dst), n=n)
    base = pagerank_static_tcp(g)
    warm = pagerank_static_tcp(g, q=base.ranks)
    assert warm.iterations <= 2
    assert np.allclose(warm.ranks, base.ranks, atol=1e-9)
    g.unpersist()
