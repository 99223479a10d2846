"""Dynamic-equivalence tests — mirrors the reference experiment harness
(main.cu:79–147): apply batches of insertions+deletions; assert ND/DT/DF/DF-P
each match a full static recompute on the updated graph within tolerance
(the L1-err-vs-oracle check at main.cu:55, here as allclose)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pagerank_cuda_dynamic_spark.operators.graph import tidy_batch
from pagerank_cuda_dynamic_spark.operators.pagerank import (
    PagerankOptions,
    pagerank_dynamic_frontier,
    pagerank_dynamic_frontier_prune,
    pagerank_dynamic_traversal,
    pagerank_naive_dynamic,
    pagerank_static,
)
from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import pagerank_static_bsp
from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot

from .conftest import edges_df


def _random_graph(rng: np.random.Generator, n: int, m: int):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return src[keep], dst[keep]


def _random_batch(rng, n, existing_pairs, k_ins, k_del):
    """Seeded insert+delete batch (batch.hxx:30–139 analog)."""
    ins = pd.DataFrame(
        {"src": rng.integers(0, n, k_ins), "dst": rng.integers(0, n, k_ins)}
    )
    ins = ins[ins.src != ins.dst]
    pool = existing_pairs[existing_pairs[:, 0] != existing_pairs[:, 1]]
    pick = rng.choice(len(pool), size=min(k_del, len(pool)), replace=False)
    dels = pd.DataFrame({"src": pool[pick, 0], "dst": pool[pick, 1]})
    return dels, ins


@pytest.fixture(scope="module")
def batch_setup(spark):
    rng = np.random.default_rng(7)
    n = 120
    src, dst = _random_graph(rng, n, 600)
    g0 = GraphSnapshot.build(edges_df(spark, src, dst), n=n)
    base = pagerank_static_bsp(g0)
    pairs = np.stack([src, dst], axis=1)
    dels_pdf, ins_pdf = _random_batch(rng, n, pairs, k_ins=30, k_del=20)
    dels, ins = tidy_batch(
        g0.edges, spark.createDataFrame(dels_pdf), spark.createDataFrame(ins_pdf)
    )
    dels = dels.persist()
    ins = ins.persist()
    g1 = g0.with_batch(dels, ins)
    oracle = pagerank_static_bsp(g1)  # full recompute on updated graph = ground truth
    return g0, g1, dels, ins, base.ranks, oracle.ranks


def test_batch_apply_changes_graph(batch_setup):
    g0, g1, dels, ins, _, _ = batch_setup
    assert ins.count() > 0 and dels.count() > 0
    assert g1.edges.count() == g0.edges.count() + ins.count() - dels.count()


def test_naive_dynamic_matches_static(batch_setup):
    _, g1, _, _, q, want = batch_setup
    res = pagerank_naive_dynamic(g1, q)
    assert np.allclose(res.ranks, want, atol=1e-6)


def test_dynamic_traversal_matches_static(batch_setup):
    g0, g1, dels, ins, q, want = batch_setup
    res = pagerank_dynamic_traversal(g0, g1, dels, ins, q)
    assert res.affected_initial > 0
    assert np.allclose(res.ranks, want, atol=1e-6)


def test_dynamic_frontier_matches_static(batch_setup):
    g0, g1, dels, ins, q, want = batch_setup
    res = pagerank_dynamic_frontier(g0, g1, dels, ins, q)
    assert res.affected_initial > 0
    assert np.allclose(res.ranks, want, atol=1e-6)


def test_dynamic_frontier_prune_matches_static(batch_setup):
    g0, g1, dels, ins, q, want = batch_setup
    res = pagerank_dynamic_frontier_prune(g0, g1, dels, ins, q)
    assert np.allclose(res.ranks, want, atol=1e-6)


def test_empty_batch_converges_immediately(spark):
    """DF with an empty batch: nothing affected → 1 superstep, ranks kept."""
    rng = np.random.default_rng(3)
    src, dst = _random_graph(rng, 40, 150)
    g = GraphSnapshot.build(edges_df(spark, src, dst), n=40)
    q = pagerank_static(g).ranks
    empty = spark.createDataFrame(
        pd.DataFrame({"src": [], "dst": []}).astype("int64"),
        schema="src long, dst long",
    )
    res = pagerank_dynamic_frontier(g, g, empty, empty, q)
    assert res.iterations == 1
    assert np.allclose(res.ranks, q, atol=1e-12)
    g.unpersist()


def test_joinagg_frontier_matches_csr_fixed_iters(spark):
    """Distributed-state DF path vs the csr kernel, superstep-for-superstep
    (fixed iteration count — full convergence is covered by the csr/bsp
    tests; the joinagg path costs several Spark jobs per superstep)."""
    from pagerank_cuda_dynamic_spark.operators.pagerank import (
        PagerankOptions,
        pagerank_dynamic_frontier,
        pagerank_dynamic_frontier_joinagg,
        pagerank_static,
    )
    from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot

    rng = np.random.default_rng(53)
    n = 60
    src = rng.integers(0, n, 250)
    dst = rng.integers(0, n, 250)
    keep = src != dst
    g0 = GraphSnapshot.build(edges_df(spark, src[keep], dst[keep]), n=n)
    q = pagerank_static(g0).ranks
    ins_pdf = pd.DataFrame({"src": rng.integers(0, n, 10), "dst": rng.integers(0, n, 10)})
    empty = spark.createDataFrame(
        pd.DataFrame({"src": [], "dst": []}).astype("int64"), schema="src long, dst long"
    )
    dels, ins = tidy_batch(g0.edges, empty, spark.createDataFrame(ins_pdf))
    g1 = g0.with_batch(dels, ins)
    opts = PagerankOptions(tolerance=0.0, max_iterations=5)
    ja = pagerank_dynamic_frontier_joinagg(g0, g1, dels, ins, q, opts)
    csr = pagerank_dynamic_frontier(g0, g1, dels, ins, q, opts)
    assert ja.iterations == csr.iterations == 5
    assert np.allclose(ja.ranks, csr.ranks, atol=1e-12)
    g0.unpersist()
    g1.unpersist()


def test_seeded_batch_generators(spark):
    """Hash-based sampling is deterministic and tidy-compatible (G8/G9)."""
    from pagerank_cuda_dynamic_spark.sources.batches import (
        sample_deletions,
        sample_insertions,
    )
    from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot

    rng = np.random.default_rng(61)
    n = 100
    src = rng.integers(0, n, 800)
    dst = rng.integers(0, n, 800)
    g = GraphSnapshot.build(edges_df(spark, src, dst), n=n)
    dels1 = sample_deletions(g.edges, 0.05, seed=9).toPandas()
    dels2 = sample_deletions(g.edges, 0.05, seed=9).toPandas()
    assert sorted(map(tuple, dels1.values.tolist())) == sorted(map(tuple, dels2.values.tolist()))
    assert 0 < len(dels1) < 200
    assert not any(s == d for s, d in dels1.values.tolist())
    ins = sample_insertions(spark, n, 50, seed=9)
    dels_t, ins_t = tidy_batch(g.edges, spark.createDataFrame(dels1), ins)
    assert dels_t.count() == len(dels1)  # all sampled deletions exist
    g2 = g.with_batch(dels_t, ins_t)
    assert g2.edges.count() == g.edges.count() - dels_t.count() + ins_t.count()
    g.unpersist(); g2.unpersist()
