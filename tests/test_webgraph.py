"""Web-graph structure ops: contraction, bow-tie regions, heavy hitters,
weighted Bernoulli sampling — each vs a brute-force in-process oracle."""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F

from pagerank_cuda_dynamic_spark.operators.sampling import weighted_sample
from pagerank_cuda_dynamic_spark.operators.sketches import heavy_hitters
from pagerank_cuda_dynamic_spark.operators.webgraph import (
    bowtie_decomposition,
    contract_graph,
    neighborhood_function,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]).astype(str)
    )


# ---------------------------------------------------------------------------
# contract_graph
# ---------------------------------------------------------------------------


def test_contract_collapses_groups_and_counts_weight(spark):
    # pages a1,a2 → host A; b1,b2 → host B; c stays unmapped
    pairs = [
        ("a1", "b1"),
        ("a2", "b1"),
        ("a2", "b2"),
        ("a1", "a2"),  # intra-group: dropped by default
        ("b1", "c"),
    ]
    mapping = spark.createDataFrame(
        pd.DataFrame(
            {"v": ["a1", "a2", "b1", "b2"], "g": ["A", "A", "B", "B"]}
        )
    )
    got = {
        (r.src, r.dst): r.weight
        for r in contract_graph(_edges(spark, pairs), mapping).collect()
    }
    assert got == {("A", "B"): 3, ("B", "c"): 1}


def test_contract_keep_selfloops_counts_internal_edges(spark):
    pairs = [("a1", "a2"), ("a2", "a1"), ("a1", "b1")]
    mapping = spark.createDataFrame(
        pd.DataFrame({"v": ["a1", "a2", "b1"], "g": ["A", "A", "B"]})
    )
    got = {
        (r.src, r.dst): r.weight
        for r in contract_graph(
            _edges(spark, pairs), mapping, drop_selfloops=False
        ).collect()
    }
    assert got == {("A", "A"): 2, ("A", "B"): 1}


def test_contract_dedups_parallel_source_edges(spark):
    # duplicate raw edges collapse BEFORE weighting (weight counts
    # distinct underlying edges, matching the deduped entity graph)
    pairs = [("a1", "b1"), ("a1", "b1"), ("a2", "b1")]
    mapping = spark.createDataFrame(
        pd.DataFrame({"v": ["a1", "a2", "b1"], "g": ["A", "A", "B"]})
    )
    got = contract_graph(_edges(spark, pairs), mapping).collect()
    assert {(r.src, r.dst): r.weight for r in got} == {("A", "B"): 2}


# ---------------------------------------------------------------------------
# bowtie_decomposition
# ---------------------------------------------------------------------------


def _regions(df):
    pdf = df.toPandas()
    return dict(zip(pdf["v"], pdf["region"]))


def test_bowtie_all_five_regions(spark):
    # core cycle k1→k2→k3→k1; i1→i2→k1 (IN chain); k2→o1→o2 (OUT chain);
    # i1→t1 makes t1 a TENDRIL (weakly connected, but t1 neither reaches
    # the core nor is reached by it); d1→d2 is a separate weak component
    # (DISCONNECTED).
    pairs = [
        ("k1", "k2"),
        ("k2", "k3"),
        ("k3", "k1"),
        ("i1", "i2"),
        ("i2", "k1"),
        ("k2", "o1"),
        ("o1", "o2"),
        ("i1", "t1"),
        ("d1", "d2"),
    ]
    got = _regions(bowtie_decomposition(_edges(spark, pairs)))
    assert got == {
        "k1": "core",
        "k2": "core",
        "k3": "core",
        "i1": "in",
        "i2": "in",
        "o1": "out",
        "o2": "out",
        "t1": "tendril",
        "d1": "disconnected",
        "d2": "disconnected",
    }


def test_bowtie_largest_scc_tiebreak_is_min_label(spark):
    # two disjoint 2-cycles, equal size → core is the one with min scc
    # label ('a1'); the other cycle is outside the core's weak component.
    pairs = [("a1", "a2"), ("a2", "a1"), ("z1", "z2"), ("z2", "z1")]
    got = _regions(bowtie_decomposition(_edges(spark, pairs)))
    assert got == {
        "a1": "core",
        "a2": "core",
        "z1": "disconnected",
        "z2": "disconnected",
    }


def test_bowtie_dag_core_is_min_vertex(spark):
    # pure DAG: every SCC is a singleton; the deterministic core pick is
    # the min vertex id, the rest classify relative to it.
    pairs = [("a", "b"), ("b", "c")]
    got = _regions(bowtie_decomposition(_edges(spark, pairs)))
    assert got == {"a": "core", "b": "out", "c": "out"}


# ---------------------------------------------------------------------------
# neighborhood_function
# ---------------------------------------------------------------------------


def _balls(pairs, t):
    """Exact ≤t-hop out-balls (including self) by brute force."""
    verts = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    adj = {v: set() for v in verts}
    for u, v in pairs:
        adj[u].add(v)
    balls = {v: {v} for v in verts}
    for _ in range(t):
        balls = {v: b | {w for u in b for w in adj[u]} for v, b in balls.items()}
    return balls


def test_neighborhood_function_exact_regime(spark):
    # |ball| < k everywhere → estimate is the EXACT ball size
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "a")]
    got = {
        r.v: (r.n_sketch, r.estimate)
        for r in neighborhood_function(_edges(spark, pairs), rounds=2, k=32).collect()
    }
    want = _balls(pairs, 2)
    assert set(got) == set(want)
    for v, (n_sketch, est) in got.items():
        assert n_sketch == len(want[v])
        assert est == float(len(want[v]))


def test_neighborhood_function_register_is_kmin_of_true_ball(spark):
    # k smaller than the ball: the register must hold exactly the k
    # smallest md5-hashes of the TRUE ball (KMV merge is lossless), so
    # kth_hash matches the brute-force k-th smallest.
    import hashlib

    pairs = [("h", f"s{i}") for i in range(20)]  # star: ball(h,1) = 21 verts
    k = 8
    got = {
        r.v: (r.n_sketch, r.kth_hash)
        for r in neighborhood_function(_edges(spark, pairs), rounds=1, k=k).collect()
    }
    ball = _balls(pairs, 1)["h"]
    hashes = sorted(int(hashlib.md5(v.encode()).hexdigest()[:15], 16) for v in ball)
    assert got["h"] == (k, hashes[k - 1])


def test_neighborhood_function_sink_keeps_singleton_ball(spark):
    pairs = [("a", "b")]
    got = {
        r.v: r.n_sketch
        for r in neighborhood_function(_edges(spark, pairs), rounds=3, k=4).collect()
    }
    assert got == {"a": 2, "b": 1}


# ---------------------------------------------------------------------------
# heavy_hitters
# ---------------------------------------------------------------------------


def _items_df(spark, items, parts=4):
    return spark.createDataFrame(
        pd.DataFrame({"item": items})
    ).repartition(parts)


def test_heavy_hitters_exact_set_and_counts(spark):
    # n=100: 40×'a', 30×'b', 10×'c', 20 singletons. k=4 → threshold n/5=20:
    # exactly {a, b} qualify (c and singletons don't).
    items = ["a"] * 40 + ["b"] * 30 + ["c"] * 10 + [f"x{i}" for i in range(20)]
    got = {
        r.item: r.cnt
        for r in heavy_hitters(_items_df(spark, items), "item", k=4).collect()
    }
    assert got == {"a": 40, "b": 30}


def test_heavy_hitters_layout_invariant(spark):
    # MG candidate sets differ per partitioning, but the exact verify pass
    # makes the OUTPUT layout-independent.
    items = ["hh"] * 50 + [f"noise{i % 37}" for i in range(60)]
    outs = []
    for parts in (1, 3, 8):
        df = heavy_hitters(_items_df(spark, items, parts), "item", k=8)
        outs.append(sorted((r.item, r.cnt) for r in df.collect()))
    assert outs[0] == outs[1] == outs[2]
    assert ("hh", 50) in outs[0]


def test_heavy_hitters_boundary_is_strict(spark):
    # freq exactly n/(k+1) does NOT qualify (strict >): n=20, k=3 →
    # threshold 5; 'e' has exactly 5.
    items = ["e"] * 5 + ["f"] * 9 + [f"y{i}" for i in range(6)]
    got = {r.item for r in heavy_hitters(_items_df(spark, items), "item", k=3).collect()}
    assert got == {"f"}


# ---------------------------------------------------------------------------
# weighted_sample
# ---------------------------------------------------------------------------


def test_weighted_sample_matches_pure_predicate(spark):
    pdf = pd.DataFrame({"doc_id": range(1000), "w": [(i * 7) % 100 for i in range(1000)]})
    df = spark.createDataFrame(pdf)
    got = {
        r.doc_id
        for r in weighted_sample(df, F.col("w"), 1, 200, id_col="doc_id").collect()
    }
    want = {
        i
        for i, w in zip(pdf.doc_id, pdf.w)
        if (i * 2654435761 + 12345) % 1_000_000 * 200 < w * 1 * 1_000_000
    }
    assert got == want
    assert 0 < len(got) < 1000


def test_weighted_sample_zero_weight_never_sampled(spark):
    pdf = pd.DataFrame({"doc_id": range(500), "w": [0] * 500})
    df = spark.createDataFrame(pdf)
    assert weighted_sample(df, F.col("w"), 1, 2, id_col="doc_id").count() == 0


def test_weighted_sample_saturates_at_probability_one(spark):
    # w·num/den ≥ 1 → always kept
    pdf = pd.DataFrame({"doc_id": range(500), "w": [10] * 500})
    df = spark.createDataFrame(pdf)
    assert weighted_sample(df, F.col("w"), 1, 10, id_col="doc_id").count() == 500


def test_weighted_sample_layout_invariant(spark):
    pdf = pd.DataFrame({"doc_id": range(2000), "w": [(i * 13) % 50 for i in range(2000)]})
    a = {
        r.doc_id
        for r in weighted_sample(
            spark.createDataFrame(pdf), F.col("w"), 1, 100, id_col="doc_id"
        ).collect()
    }
    b = {
        r.doc_id
        for r in weighted_sample(
            spark.createDataFrame(pdf).repartition(16), F.col("w"), 1, 100, id_col="doc_id"
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# cocitation_graph
# ---------------------------------------------------------------------------


def test_cocitation_counts_common_citers(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import cocitation_graph

    pairs = [
        ("u1", "a"), ("u1", "b"),
        ("u2", "a"), ("u2", "b"),
        ("u3", "a"), ("u3", "c"),
        ("a", "a"),  # self-loop ignored
    ]
    got = {
        (r.a, r.b): r.w
        for r in cocitation_graph(_edges(spark, pairs)).collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1}


def test_coupling_is_cocitation_of_transpose(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import cocitation_graph

    pairs = [("a", "x"), ("b", "x"), ("b", "y"), ("c", "y"), ("a", "y")]
    rev = [(d, s) for s, d in pairs]
    got = sorted(
        map(tuple, cocitation_graph(_edges(spark, pairs), coupling=True)
            .toPandas().values.tolist())
    )
    want = sorted(
        map(tuple, cocitation_graph(_edges(spark, rev)).toPandas().values.tolist())
    )
    assert got == want and got  # non-empty


def test_cocitation_degree_cap_excludes_hub(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import cocitation_graph

    pairs = [("hub", f"t{i}") for i in range(5)] + [
        ("u", "t0"), ("u", "t1"), ("w", "t0"), ("w", "t1"),
    ]
    got = {
        (r.a, r.b): r.w
        for r in cocitation_graph(_edges(spark, pairs), max_degree=2).collect()
    }
    # hub (outdeg 5 > 2) contributes no pairs; u and w each co-cite t0,t1
    assert got == {("t0", "t1"): 2}


# ---------------------------------------------------------------------------
# rich_club
# ---------------------------------------------------------------------------


def _rich_club_oracle(pairs, max_k):
    E = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    deg: dict = {}
    for a, b in E:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    out = {}
    for k in range(1, max_k + 1):
        rich = {v for v, d in deg.items() if d > k}
        if len(rich) < 2:
            continue
        ek = sum(1 for a, b in E if a in rich and b in rich)
        out[k] = (len(rich), ek, 2.0 * ek / (len(rich) * (len(rich) - 1)))
    return out


def test_rich_club_star_plus_clique(spark):
    """K4 core {0,1,2,3} plus 6 spokes off vertex 0: hubs (deg > spoke
    degree) must show φ rising toward 1 as k climbs into the clique."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import rich_club

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    spokes = [(0, v) for v in range(4, 10)]
    pairs = k4 + spokes
    got = {
        r.k: (r.n_nodes, r.n_edges, r.phi)
        for r in rich_club(_edges(spark, [(str(a), str(b)) for a, b in pairs]), max_k=8).collect()
    }
    want = _rich_club_oracle([(str(a), str(b)) for a, b in pairs], 8)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k][:2] == want[k][:2], k
        assert abs(got[k][2] - want[k][2]) < 1e-12, k


def test_rich_club_oracle_random(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import rich_club

    import numpy as np

    rng = np.random.default_rng(13)
    pairs = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, 30, 200), rng.integers(0, 30, 200))
    ]
    got = {
        r.k: (r.n_nodes, r.n_edges, round(r.phi, 9))
        for r in rich_club(_edges(spark, pairs), max_k=20).collect()
    }
    want = {
        k: (n, e, round(phi, 9))
        for k, (n, e, phi) in _rich_club_oracle(pairs, 20).items()
    }
    assert got == want


def test_rich_club_ignores_direction_duplicates_selfloops(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import rich_club

    pairs = [("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("c", "a"), ("a", "b")]
    got = {r.k: (r.n_nodes, r.n_edges) for r in rich_club(_edges(spark, pairs), max_k=3).collect()}
    # triangle a-b-c: all degrees 2 → k=1 keeps all three and all edges
    assert got == {1: (3, 3)}


# ---------------------------------------------------------------------------
# distance_distribution
# ---------------------------------------------------------------------------


def test_distance_distribution_exact_regime_line(spark):
    """Directed line 0→1→2→3→4 with k large enough that no register
    saturates: pairs_milli must be EXACTLY 1000·Σ|ball(v,t)|."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import (
        distance_distribution,
    )

    e = _edges(spark, [(str(i), str(i + 1)) for i in range(4)])
    got = {
        r.t: (r.n_vertices, r.n_saturated, r.pairs_milli)
        for r in distance_distribution(e, rounds=3, k=32).collect()
    }
    # balls: t=0 → 5; t=1 → 5+4; t=2 → 9+3; t=3 → 12+2
    assert got == {0: (5, 0, 5000), 1: (5, 0, 9000), 2: (5, 0, 12000), 3: (5, 0, 14000)}


def test_distance_distribution_final_round_matches_anf(spark):
    """The t=rounds row must agree with neighborhood_function's per-vertex
    estimates (floored-milli sum) — same registers, different aggregation."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import (
        distance_distribution,
        neighborhood_function,
    )

    import numpy as np

    rng = np.random.default_rng(5)
    pairs = [
        (str(a), str(b))
        for a, b in zip(rng.integers(0, 40, 120), rng.integers(0, 40, 120))
    ]
    e = _edges(spark, pairs)
    dd = {r.t: r for r in distance_distribution(e, rounds=2, k=8).collect()}
    anf = neighborhood_function(e, rounds=2, k=8).collect()
    want_milli = sum(int(np.floor(r.estimate * 1000.0)) for r in anf)
    want_sat = sum(1 for r in anf if r.n_sketch >= 8)
    assert dd[2].pairs_milli == want_milli
    assert dd[2].n_saturated == want_sat
    assert dd[2].n_vertices == len(anf)
    # N(t) is monotone non-decreasing in t
    ts = sorted(dd)
    assert all(dd[a].pairs_milli <= dd[b].pairs_milli for a, b in zip(ts, ts[1:]))


# ---------------------------------------------------------------------------
# pseudo_diameter
# ---------------------------------------------------------------------------


def _pd_row(spark, pairs, **kw):
    from pagerank_cuda_dynamic_spark.operators.graph import pseudo_diameter

    return pseudo_diameter(_edges(spark, pairs), **kw).collect()[0]


def test_pseudo_diameter_path_is_exact(spark):
    r = _pd_row(spark, [(str(i), str(i + 1)) for i in range(5)])
    assert (r.start_v, r.far_v, r.ecc_start, r.diameter_lb) == ("0", "5", 5, 5)


def test_pseudo_diameter_star_second_sweep_finds_two(spark):
    """From the center ecc is 1; the second sweep from a leaf finds the
    true diameter 2 — the double-sweep's point."""
    r = _pd_row(spark, [("c", "l1"), ("c", "l2"), ("c", "l3")])
    assert (r.start_v, r.far_v, r.ecc_start, r.diameter_lb) == ("c", "l1", 1, 2)


def test_pseudo_diameter_tiebreak_min_id(spark):
    """Two vertices at max distance from the start: the pivot is the
    SMALLEST id, deterministically."""
    r = _pd_row(spark, [("a", "b"), ("a", "c")])
    assert r.far_v == "b" and r.diameter_lb == 2


def test_pseudo_diameter_disconnected_measures_start_component(spark):
    r = _pd_row(spark, [("a", "b"), ("y", "z")])
    assert (r.start_v, r.far_v, r.ecc_start, r.diameter_lb) == ("a", "b", 1, 1)


def test_pseudo_diameter_cap_contract(spark):
    """max_depth below the true eccentricity truncates BOTH sweeps — the
    capped value is the contract, exactly like the SQL oracle's unroll."""
    r = _pd_row(spark, [(str(i), str(i + 1)) for i in range(8)], max_depth=3)
    assert r.ecc_start == 3 and r.diameter_lb == 3


# ---------------------------------------------------------------------------
# densest_subgraph
# ---------------------------------------------------------------------------


def test_densest_subgraph_finds_planted_clique(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import densest_subgraph

    # sparse path background (density ~0.9) + K6 (density 2.5): the peel's
    # best iterate must be exactly the clique
    pairs = [(f"p{i}", f"p{i+1}") for i in range(9)]
    clique = [(f"k{i}", f"k{j}") for i in range(6) for j in range(i + 1, 6)]
    res = densest_subgraph(_edges(spark, pairs + clique)).toPandas()
    dense = set(res[res.in_densest]["v"])
    assert dense == {f"k{i}" for i in range(6)}
    # every vertex got a peel round
    assert len(res) == 10 + 6
    assert (res["peel_round"] >= 0).all()


def test_densest_subgraph_isolated_survivor_still_peels(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import densest_subgraph

    # 10 disjoint pendant edges drag the average degree to ~1.04, so at
    # ε=0.1 only degree-1 vertices peel in round 0; q (degree 2) survives,
    # becomes ISOLATED (its only neighbors peeled), and must still receive
    # a peel_round (= 1) rather than silently vanishing from the output
    pairs = [(f"a{i}", f"b{i}") for i in range(10)] + [("q", "l1"), ("q", "l2")]
    res = densest_subgraph(_edges(spark, pairs)).toPandas().set_index("v")
    assert len(res) == 23
    assert res.loc["q", "peel_round"] == 1
    assert (res["peel_round"] >= 0).all()
    # round 0 (density 12/23) beats round 1 (0/1): best iterate is round 0
    assert res["in_densest"].all()


def test_densest_subgraph_deterministic_under_relayout(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import densest_subgraph

    pairs = [(f"v{i}", f"v{(i * 7 + 3) % 20}") for i in range(40)]
    e = _edges(spark, pairs)
    a = sorted(map(tuple, densest_subgraph(e).collect()))
    b = sorted(map(tuple, densest_subgraph(e.repartition(7)).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# butterfly_count
# ---------------------------------------------------------------------------


def test_butterfly_count_complete_bipartite(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import butterfly_count

    # K(2,2): exactly one butterfly; one right pair sharing both lefts
    k22 = [(u, v) for u in ("u1", "u2") for v in ("v1", "v2")]
    row = butterfly_count(_edges(spark, k22)).collect()[0]
    assert (row.butterflies, row.wedge_pairs, row.shared_wedges) == (1, 1, 2)

    # K(3,4): C(3,2)·C(4,2) = 18 butterflies; C(4,2)=6 pairs each with c=3
    k34 = [(f"u{i}", f"v{j}") for i in range(3) for j in range(4)]
    row = butterfly_count(_edges(spark, k34)).collect()[0]
    assert (row.butterflies, row.wedge_pairs, row.shared_wedges) == (18, 6, 18)


def test_butterfly_count_no_shared_wedges(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import butterfly_count

    # star from one left vertex: pairs share exactly one left → c = 1,
    # C(1,2) = 0 butterflies but the pairs are still counted
    star = [("u", f"v{j}") for j in range(4)]
    row = butterfly_count(_edges(spark, star)).collect()[0]
    assert (row.butterflies, row.wedge_pairs, row.shared_wedges) == (0, 6, 6)

    # disjoint edges: no pair shares a left vertex at all
    disj = [(f"u{i}", f"v{i}") for i in range(4)]
    row = butterfly_count(_edges(spark, disj)).collect()[0]
    assert (row.butterflies, row.wedge_pairs, row.shared_wedges) == (0, 0, 0)


def test_butterfly_count_middle_cap_is_lower_bound(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import butterfly_count

    # K(2,2) plus a degree-4 hub left vertex wired to v1..v4: capping
    # out-degree at 3 removes the hub's wedges but keeps the K(2,2)
    pairs = [(u, v) for u in ("u1", "u2") for v in ("v1", "v2")]
    pairs += [("hub", f"v{j}") for j in range(1, 5)]
    full = butterfly_count(_edges(spark, pairs)).collect()[0]
    capped = butterfly_count(
        _edges(spark, pairs), max_left_outdeg=3
    ).collect()[0]
    # hub turns the (v1,v2) pair into c=3 (C(3,2)=3) and closes nothing
    # else (v3,v4 pairs have c=1): full = 3, capped = the K(2,2)'s 1
    assert full.butterflies == 3
    assert capped.butterflies == 1
    assert capped.wedge_pairs < full.wedge_pairs


def test_butterfly_count_deterministic_under_relayout(spark):
    from pagerank_cuda_dynamic_spark.operators.webgraph import butterfly_count

    pairs = [(f"u{i % 7}", f"v{(i * 3) % 11}") for i in range(60)]
    e = _edges(spark, pairs)
    a = butterfly_count(e).collect()[0]
    b = butterfly_count(e.repartition(5)).collect()[0]
    assert tuple(a) == tuple(b)
