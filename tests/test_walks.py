"""Deterministic walks + multi-source distances + harmonic centrality.

Walk ground truth is a ≤30-line pure-Python transliteration of the
hash-argmin rule (hashlib.md5 for the cross-engine hash), so the Spark
plan is checked value-for-value, not just structurally.  Distances /
harmonic are checked against hand-computed closures on the golden
micro-graphs (FIXTURES.md F5).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from pagerank_cuda_dynamic_spark.operators.graph import (
    harmonic_centrality,
    multi_source_distances,
)
from pagerank_cuda_dynamic_spark.operators.walks import (
    deterministic_walks,
    md5_walk_hash,
)

from .conftest import MICRO_GRAPHS, edges_df


def _sources(spark, vals):
    return spark.createDataFrame(pd.DataFrame({"s": np.asarray(vals, dtype=np.int64)}))


def _dist_map(df):
    return {(r.s, r.v): r.dist for r in df.collect()}


def test_multi_source_distances_line(spark):
    n, src, dst = MICRO_GRAPHS["line5"]
    d = _dist_map(multi_source_distances(edges_df(spark, src, dst), _sources(spark, [0])))
    assert d == {(0, k): k for k in range(n)}


def test_multi_source_distances_multi_seed_min(spark):
    _, src, dst = MICRO_GRAPHS["line5"]
    d = _dist_map(
        multi_source_distances(edges_df(spark, src, dst), _sources(spark, [0, 3]))
    )
    # v=4 is dist 1 from seed 3 and dist 4 from seed 0 — both pairs kept
    assert d[(3, 4)] == 1 and d[(0, 4)] == 4
    assert d[(3, 3)] == 0 and (3, 0) not in d  # line is directed


def test_multi_source_distances_max_depth(spark):
    _, src, dst = MICRO_GRAPHS["line5"]
    d = _dist_map(
        multi_source_distances(
            edges_df(spark, src, dst), _sources(spark, [0]), max_depth=2
        )
    )
    assert d == {(0, 0): 0, (0, 1): 1, (0, 2): 2}


def test_multi_source_distances_cycle_terminates(spark):
    _, src, dst = MICRO_GRAPHS["cycle4"]
    d = _dist_map(multi_source_distances(edges_df(spark, src, dst), _sources(spark, [0])))
    assert d == {(0, 0): 0, (0, 1): 1, (0, 2): 2, (0, 3): 3}


def test_harmonic_line5_exact(spark):
    n, src, dst = MICRO_GRAPHS["line5"]
    got = {
        r.v: r.harmonic
        for r in harmonic_centrality(
            edges_df(spark, src, dst), _sources(spark, range(n))
        ).collect()
    }
    # directed line: v is reached from each u<v at dist v-u
    want = {v: sum(1.0 / (v - u) for u in range(v)) for v in range(1, n)}
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12


def test_harmonic_unreachable_contribute_zero(spark):
    # two directed 3-cycles: each vertex reached only by its own island
    n, src, dst = MICRO_GRAPHS["two_islands"]
    got = {
        r.v: r.harmonic
        for r in harmonic_centrality(
            edges_df(spark, src, dst), _sources(spark, range(n))
        ).collect()
    }
    assert got == {v: 1.0 / 1 + 1.0 / 2 for v in range(n)}


# ---------------------------------------------------------------------------
# deterministic walks
# ---------------------------------------------------------------------------


def _py_md5_hash(walk_id, step, dst, seed) -> int:
    return int(hashlib.md5(f"{walk_id}#{step}#{dst}#{seed}".encode()).hexdigest()[:15], 16)


def _py_walks(src, dst, starts, steps, seed):
    """Pure-Python transliteration of the hash-argmin walk rule."""
    adj: dict[int, list[int]] = {}
    for s, d in set(zip(src, dst)):
        adj.setdefault(s, []).append(d)
    rows = []
    for w in starts:
        cur = w
        rows.append((w, 0, w))
        for t in range(1, steps + 1):
            nbrs = adj.get(cur)
            if not nbrs:
                break
            cur = min(nbrs, key=lambda v: (_py_md5_hash(w, t, v, seed), v))
            rows.append((w, t, cur))
    return sorted(rows)


def _rand_graph(rng, n, m):
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    return src[keep], dst[keep]


def test_walks_match_python_reference(spark):
    rng = np.random.default_rng(7)
    src, dst = _rand_graph(rng, 30, 120)
    starts = list(range(30))
    got = sorted(
        (r.walk_id, r.step, r.v)
        for r in deterministic_walks(
            edges_df(spark, src, dst),
            _sources(spark, starts),
            steps=5,
            seed=3,
            hash_fn=md5_walk_hash,
        ).collect()
    )
    assert got == _py_walks(src, dst, starts, 5, 3)


def test_walks_edges_valid_and_partition_invariant(spark):
    rng = np.random.default_rng(11)
    src, dst = _rand_graph(rng, 40, 200)
    e = edges_df(spark, src, dst)
    starts = _sources(spark, range(40))
    w1 = deterministic_walks(e, starts, steps=6, seed=1)
    rows1 = sorted((r.walk_id, r.step, r.v) for r in w1.collect())
    # same input, adversarial partitioning → byte-identical corpus
    w2 = deterministic_walks(e.repartition(13, "dst"), starts.repartition(3), steps=6, seed=1)
    rows2 = sorted((r.walk_id, r.step, r.v) for r in w2.collect())
    assert rows1 == rows2
    # every consecutive step follows a real edge
    eset = set(zip(src.tolist(), dst.tolist()))
    walk: dict[int, dict[int, int]] = {}
    for wid, t, v in rows1:
        walk.setdefault(wid, {})[t] = v
    for wid, path in walk.items():
        assert path[0] == wid
        for t in range(1, max(path) + 1):
            assert (path[t - 1], path[t]) in eset


def test_walks_end_at_sink(spark):
    _, src, dst = MICRO_GRAPHS["line5"]
    rows = sorted(
        (r.walk_id, r.step, r.v)
        for r in deterministic_walks(
            edges_df(spark, src, dst), _sources(spark, [0, 3]), steps=10
        ).collect()
    )
    # forced path on a line; vertex 4 is a sink so walks stop there
    assert rows == [(0, t, t) for t in range(5)] + [(3, 0, 3), (3, 1, 4)]


def test_walks_steps_zero(spark):
    _, src, dst = MICRO_GRAPHS["line5"]
    rows = deterministic_walks(
        edges_df(spark, src, dst), _sources(spark, [1, 2]), steps=0
    ).collect()
    assert sorted((r.walk_id, r.step, r.v) for r in rows) == [(1, 0, 1), (2, 0, 2)]


def test_negative_samples_matches_python_replica(spark):
    import pandas as pd

    from pagerank_cuda_dynamic_spark.operators.walks import negative_samples

    n = 12
    pairs = [(0, 1), (0, 5), (1, 2), (2, 3), (5, 9), (9, 0), (3, 1)]
    e = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"])
    )
    got = {
        (r.src, r.dst, r.attempt)
        for r in negative_samples(e, n, k=2, attempts=6).collect()
    }
    eset = set(pairs)
    want = set()
    for s in sorted({a for a, _ in pairs}):
        kept = 0
        for j in range(6):
            d = (s * 2654435761 + j * 40503 + 12345) % n
            if d == s or (s, d) in eset:
                continue
            want.add((s, d, j))
            kept += 1
            if kept == 2:
                break
    assert got == want
    # no sampled pair is a real edge or a self loop
    for s, d, _ in got:
        assert (s, d) not in eset and s != d
    # layout invariance
    got2 = {
        (r.src, r.dst, r.attempt)
        for r in negative_samples(e.repartition(5), n, k=2, attempts=6).collect()
    }
    assert got2 == got


def test_negative_samples_validates_args(spark):
    import pandas as pd
    import pytest

    from pagerank_cuda_dynamic_spark.operators.walks import negative_samples

    e = spark.createDataFrame(pd.DataFrame({"src": [0], "dst": [1]}))
    with pytest.raises(ValueError):
        negative_samples(e, 10, k=0)
    with pytest.raises(ValueError):
        negative_samples(e, 10, k=4, attempts=3)
