"""Round-2 scale-out twins: joinagg CC/LPA and DataFrame-state DT must match
the driver-resident kernels exactly (same algorithms, zero driver state)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pagerank_cuda_dynamic_spark.operators.components import (
    connected_components_joinagg,
    connected_components_np,
    label_propagation_joinagg,
    label_propagation_np,
    triangle_count,
)
from pagerank_cuda_dynamic_spark.operators.graph import tidy_batch
from pagerank_cuda_dynamic_spark.operators.pagerank import (
    pagerank_dynamic_traversal,
    pagerank_dynamic_traversal_joinagg,
)
from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import pagerank_static_bsp
from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot

from .conftest import edges_df


@pytest.fixture(scope="module")
def random_graph(spark):
    rng = np.random.default_rng(43)
    n, m = 600, 2200
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    return n, edges_df(spark, src, dst)


def test_cc_joinagg_matches_np(spark, random_graph):
    n, e = random_graph
    want = connected_components_np(e, n)
    got = connected_components_joinagg(e, n).toPandas().sort_values("v")
    assert np.array_equal(got["component"].to_numpy(), want)


def test_cc_joinagg_islands(spark):
    # disjoint cycles: exact component ids = min member
    src = [0, 1, 2, 3, 4, 5, 7, 8]
    dst = [1, 2, 0, 4, 5, 3, 8, 7]
    got = (
        connected_components_joinagg(edges_df(spark, src, dst), 9)
        .toPandas()
        .sort_values("v")["component"]
        .to_numpy()
    )
    assert np.array_equal(got, np.array([0, 0, 0, 3, 3, 3, 6, 7, 7]))


def test_lpa_joinagg_matches_np(spark, random_graph):
    n, e = random_graph
    want = label_propagation_np(e, n, max_rounds=10)
    got = (
        label_propagation_joinagg(e, n, max_rounds=10)
        .toPandas()
        .sort_values("v")["label"]
        .to_numpy()
    )
    assert np.array_equal(got, want)


def test_dt_joinagg_matches_csr(spark):
    rng = np.random.default_rng(47)
    n = 150
    src = rng.integers(0, n, 700)
    dst = rng.integers(0, n, 700)
    keep = src != dst
    g0 = GraphSnapshot.build(edges_df(spark, src[keep], dst[keep]), n=n)
    base = pagerank_static_bsp(g0)
    ins_pdf = pd.DataFrame(
        {"src": rng.integers(0, n, 25), "dst": rng.integers(0, n, 25)}
    )
    empty = spark.createDataFrame(
        pd.DataFrame({"src": [], "dst": []}).astype("int64"),
        schema="src long, dst long",
    )
    dels, ins = tidy_batch(g0.edges, empty, spark.createDataFrame(ins_pdf))
    g1 = g0.with_batch(dels, ins)
    a = pagerank_dynamic_traversal_joinagg(g0, g1, dels, ins, base.ranks)
    b = pagerank_dynamic_traversal(g0, g1, dels, ins, base.ranks)
    assert np.allclose(a.ranks, b.ranks, atol=1e-9)
    assert a.iterations == b.iterations
    g0.unpersist()
    g1.unpersist()


def test_triangle_degree_oriented_exact(spark):
    # K4 has 4 triangles; plus a pendant and a hub star (stars add none)
    src = [0, 0, 0, 1, 1, 2, 4, 9, 9, 9, 9]
    dst = [1, 2, 3, 2, 3, 3, 5, 6, 7, 8, 0]
    got = triangle_count(edges_df(spark, src, dst)).collect()[0]["n_triangles"]
    assert got == 4
