"""Web-graph structure operators: contraction (page→host coarsening) and
Broder bow-tie decomposition.

These are the two classic link-graph analyses the reference's graph
family implies but does not ship (its graphs ARE web crawls — sk-2005,
uk-2005, it-2004): collapsing the page graph to the host/domain graph
before expensive analytics, and classifying every page into the bow-tie
regions (CORE / IN / OUT / TENDRIL / DISCONNECTED) of Broder et al.,
"Graph structure in the Web" (WWW 2000).

Scale posture:
  * contract_graph is two broadcast-or-shuffle joins + one groupBy —
    exactly the shape Catalyst optimizes (the mapping is usually tiny
    relative to the edges: #hosts ≪ #pages, so AQE broadcasts it).
  * bowtie_decomposition reuses the distributed SCC (FW-BW coloring) and
    the level-synchronous multi-source BFS — no new iterative machinery,
    no driver-side vertex state; the only driver scalar is the 1-row
    largest-SCC id.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    drop_selfloops: bool = True,
) -> DataFrame:
    """Coarsen a directed graph by a vertex→group mapping (page→host,
    url→domain, doc→cluster): every edge (u, v) becomes (g(u), g(v));
    parallel contracted edges collapse to one row with `weight` = the
    number of distinct underlying edges.

    `mapping` is a (v, g) DataFrame; vertices absent from it keep their
    own id (coalesce after a left join), so partial mappings are safe.
    Group self-loops (edges internal to a group) are dropped by default —
    pass drop_selfloops=False to keep them (their weight is the group's
    internal edge count, useful for modularity-style diagnostics).

    One plan: edges ⟕ mapping (on src) ⟕ mapping (on dst) → groupBy.
    The mapping side is small (hosts ≪ pages) — mark it broadcast so the
    edge table never shuffles for the joins; the single shuffle is the
    final groupBy on (src, dst) group keys.
    """
    m = F.broadcast(mapping.select("v", "g").distinct())
    e = edges.select("src", "dst").distinct()
    contracted = (
        e.join(m.withColumnRenamed("v", "src").withColumnRenamed("g", "gs"), "src", "left")
        .join(m.withColumnRenamed("v", "dst").withColumnRenamed("g", "gd"), "dst", "left")
        .select(
            F.coalesce("gs", "src").alias("src"),
            F.coalesce("gd", "dst").alias("dst"),
        )
    )
    if drop_selfloops:
        contracted = contracted.where(F.col("src") != F.col("dst"))
    return contracted.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("weight"))


def bowtie_decomposition(edges: DataFrame) -> DataFrame:
    """Broder bow-tie regions of a directed graph, per vertex:

      core          — member of the largest SCC (ties broken by min scc
                      label, so the choice is deterministic)
      in            — reaches the core but is not in it
      out           — reachable from the core but not in it
      tendril       — in the core's weakly connected component but
                      neither reaches nor is reached by the core
                      (Broder's TENDRILS + TUBES, unsplit)
      disconnected  — outside the core's weak component

    Composition of existing distributed primitives:
      1. strongly_connected_components (FW-BW coloring) → largest SCC;
      2. forward multi-source BFS from the core → out ∪ core;
      3. backward BFS (transposed edges) from the core → in ∪ core;
      4. undirected BFS from the core → the core's weak component.
    Classification is then three left-semi markers + one CASE — no
    per-vertex driver state.  Returns (v, region).
    """
    from pagerank_cuda_dynamic_spark.operators.components import (
        strongly_connected_components,
    )
    from pagerank_cuda_dynamic_spark.operators.graph import bfs_reachable
    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    e = edges.select("src", "dst").distinct().transform(materialize)
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
        .transform(materialize)
    )
    scc = strongly_connected_components(e)
    largest = (
        scc.groupBy("scc")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .limit(1)
        .select("scc")
    )
    core = (
        scc.join(F.broadcast(largest), "scc", "left_semi")
        .select("v")
        .transform(materialize)
    )
    e_t = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    und = e.union(e_t).distinct().transform(materialize)
    fwd = bfs_reachable(e, core).withColumnRenamed("v", "fv")
    bwd = bfs_reachable(e_t, core).withColumnRenamed("v", "bv")
    weak = bfs_reachable(und, core).withColumnRenamed("v", "wv")
    return (
        verts.join(core.withColumn("is_core", F.lit(1)), "v", "left")
        .join(fwd.withColumn("in_fwd", F.lit(1)), verts.v == fwd.fv, "left")
        .join(bwd.withColumn("in_bwd", F.lit(1)), verts.v == bwd.bv, "left")
        .join(weak.withColumn("in_weak", F.lit(1)), verts.v == weak.wv, "left")
        .select(
            "v",
            F.when(F.col("is_core") == 1, F.lit("core"))
            .when(F.col("in_bwd") == 1, F.lit("in"))
            .when(F.col("in_fwd") == 1, F.lit("out"))
            .when(F.col("in_weak") == 1, F.lit("tendril"))
            .otherwise(F.lit("disconnected"))
            .alias("region"),
        )
    )


def neighborhood_function(
    edges: DataFrame,
    rounds: int = 3,
    k: int = 32,
    hash_fn=None,
) -> DataFrame:
    """Approximate per-vertex neighborhood function — |{u : dist(v,u) ≤
    rounds}| — via iterated KMV registers: the ANF / HyperBall algorithm
    (Palmer et al. KDD 2002; Boldi & Vigna, HyperBall) with k-minimum-
    values registers instead of HyperLogLog ones.

    Why KMV and not HLL: the k smallest hashes of a set are a PURE
    FUNCTION of the set, and KMV merge is lossless (k-min of a union =
    k-min of the merged k-mins), so after t rounds each vertex's register
    is EXACTLY the k smallest hashes of its true ≤t-hop out-neighborhood
    — any engine can recompute it (the DuckDB oracle does, from a bounded
    recursive closure), where HLL register layouts are engine-private.

    sketch_0(v) = {h(v)};  sketch_{t+1}(v) = kmin_k(sketch_t(v) ∪
    ⋃_{(v,u)∈E} sketch_t(u)).  Estimate: exact count when the register
    holds < k hashes, else the KMV estimator (k-1)·2^60/h_k in one IEEE
    division (sketches.py convention).

    Scale posture: state is ≤ k·|V| (v, h) rows; each round is ONE
    edge⋈sketch shuffle + a v-PARTITIONED rank-k window (never global).
    The per-vertex estimates aggregate to the neighborhood function
    N(t) = Σ_v |ball(v,t)| — the effective-diameter statistic of Broder-
    style web-graph studies — without ever materializing a closure.

    Returns (v, n_sketch, kth_hash, estimate) at t = rounds.
    """
    for t, sk in _kmv_sketch_rounds(edges, rounds, k, hash_fn):
        pass  # the lossless merge means only the final register matters
    return _kmv_estimate(sk, k)


def _kmv_sketch_rounds(edges: DataFrame, rounds: int, k: int, hash_fn=None):
    """The shared ANF register iteration: yields (t, sketch) for
    t = 0..rounds, where sketch(v) is EXACTLY the k smallest hashes of
    the true ≤t-hop out-ball (lossless KMV merge — the invariant every
    oracle depends on, maintained in exactly one place).  Each round is
    ONE edge⋈sketch shuffle + a v-PARTITIONED rank-k window (never
    global); every yielded sketch is materialized."""
    from pyspark.sql import Window

    from pagerank_cuda_dynamic_spark.operators.sketches import _portable_hash64
    from pagerank_cuda_dynamic_spark.plans.barrier import broadcast_state, materialize

    if hash_fn is None:
        hash_fn = _portable_hash64
    e = edges.select("src", "dst").distinct().transform(materialize)
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    w = Window.partitionBy("v").orderBy("h")
    sk = verts.select("v", hash_fn(F.col("v")).alias("h")).transform(materialize)
    sk_rows = sk.count()
    yield 0, sk
    for t in range(1, rounds + 1):
        # the ≤ k·|V|-row register table broadcasts into the edge join
        # while executor-resident, so e never reshuffles per round (real
        # row counts: the materialized sketch is a LogicalRDD whose size
        # estimate would otherwise disable auto-broadcast)
        msgs = e.join(
            broadcast_state(
                sk.withColumnRenamed("v", "dst").withColumnRenamed("h", "hn"),
                sk_rows,
            ),
            "dst",
        ).select(F.col("src").alias("v"), F.col("hn").alias("h"))
        # dense_rank folds the set-dedup INTO the rank-k window: duplicate
        # hashes share a rank, so rank ≤ k keeps exactly the k smallest
        # DISTINCT values and the explicit dedup runs on the ≤ k·|V|-row
        # result instead of the |E|·k-row message stream (one |E|·k
        # shuffle per round, not two — measured plan: 2 Exchange → 1 on
        # the message path)
        sk = (
            sk.unionByName(msgs)
            .withColumn("rn", F.dense_rank().over(w))
            .where(F.col("rn") <= k)
            .drop("rn")
            .distinct()
            .transform(materialize)
        )
        sk_rows = sk.count()
        yield t, sk


def _kmv_estimate(sk: DataFrame, k: int) -> DataFrame:
    """Per-vertex register → (v, n_sketch, kth_hash, estimate): exact
    count below saturation, else the one-division KMV estimator."""
    from pagerank_cuda_dynamic_spark.operators.sketches import HASH_SPACE

    return sk.groupBy("v").agg(
        F.count(F.lit(1)).alias("n_sketch"),
        F.max("h").alias("kth_hash"),
    ).select(
        "v",
        "n_sketch",
        "kth_hash",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.lit(float((k - 1) * HASH_SPACE)) / F.col("kth_hash").cast("double")
        )
        .alias("estimate"),
    )


def cocitation_graph(
    edges: DataFrame,
    max_degree: int = 1000,
    min_weight: int = 1,
    coupling: bool = False,
) -> DataFrame:
    """Derived similarity graph over the link structure:

      * co-citation (Small 1973, default): w(a, b) = |{u : u→a ∧ u→b}| —
        pages cited together; the authority-side projection SALSA walks.
      * bibliographic coupling (Kessler 1963, coupling=True):
        w(a, b) = |{w : a→w ∧ b→w}| — pages citing the same targets;
        the hub-side projection.

    Returns (a, b, w) with a < b (each unordered pair once), w ≥
    `min_weight`.  Self-loops in the input are ignored (a page citing
    itself co-cites nothing).

    Scale posture: pair generation is a self-join keyed on the SHARED
    vertex, so a hub with degree d emits d·(d-1)/2 pairs — the exact d²
    blowup the dedup family's `max_shingle_df` caps (dedup.py).  The
    same contract applies here: shared vertices with degree >
    `max_degree` are EXCLUDED from pair generation (documented recall
    bound — a row co-cited by everyone carries no similarity signal,
    the IDF argument), making the worst-case output |V|·max_degree²/2
    instead of unbounded.  One aggregation to find heavy keys + one
    semi-filtered self-join + one groupBy; no Python, no windows.
    """
    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    # materialized once: the degree cap, and both legs of the pair
    # self-join, each re-ran the caller's edge derivation on the lazy frame
    e = materialize(
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    if coupling:
        shared, item = "dst", "src"
    else:
        shared, item = "src", "dst"
    deg = (
        e.groupBy(shared)
        .agg(F.count(F.lit(1)).alias("d"))
        .where(F.col("d") <= max_degree)
        .select(shared)
    )
    kept = e.join(deg, shared, "left_semi")
    left = kept.select(F.col(shared).alias("k"), F.col(item).alias("a"))
    right = kept.select(F.col(shared).alias("k"), F.col(item).alias("b"))
    return (
        left.join(right, "k")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .where(F.col("w") >= min_weight)
    )


__all__ = [
    "contract_graph",
    "bowtie_decomposition",
    "neighborhood_function",
    "cocitation_graph",
    "rich_club",
    "distance_distribution",
]


def rich_club(edges: DataFrame, max_k: int = 40) -> DataFrame:
    """Rich-club coefficient φ(k) (Zhou & Mondragón 2004; Colizza et al.
    2006, unnormalized): over the undirected simple graph, for each
    degree threshold k = 1..max_k let N_k = #vertices with degree > k
    and E_k = #edges whose BOTH endpoints have degree > k; then
    φ(k) = 2·E_k / (N_k·(N_k−1)) — how densely the hubs interconnect,
    the classic "do the rich link to the rich" web/citation statistic.

    Scale posture: everything after two histogram shuffles is tiny —
    (1) one degree count, (2) one per-edge min-endpoint-degree groupBy;
    both histograms have ≤ max-degree rows, so the k×histogram
    inequality joins (suffix sums) are broadcast nested loops over
    KB-sized inputs, never a per-edge pass per k.  No Python, no
    windows, no driver traffic.

    Returns (k, n_nodes, n_edges, phi) for thresholds with N_k ≥ 2
    (φ undefined below two members).
    """
    spark = edges.sparkSession
    e = (
        edges.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("v"))
        .unionByName(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ndh = deg.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    emh = (
        e.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
        .select(F.least("da", "db").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ks = spark.range(1, max_k + 1).select(F.col("id").alias("k"))
    n_k = (
        ks.join(F.broadcast(ndh), ndh["d"] > ks["k"])
        .groupBy("k")
        .agg(F.sum("n").alias("n_nodes"))
    )
    e_k = (
        ks.join(F.broadcast(emh), emh["m"] > ks["k"])
        .groupBy("k")
        .agg(F.sum("c").alias("n_edges"))
    )
    return (
        n_k.join(e_k, "k", "left")
        .where(F.col("n_nodes") >= 2)
        .select(
            "k",
            "n_nodes",
            F.coalesce("n_edges", F.lit(0)).alias("n_edges"),
            (
                2.0
                * F.coalesce("n_edges", F.lit(0))
                / (F.col("n_nodes") * (F.col("n_nodes") - F.lit(1.0)))
            ).alias("phi"),
        )
    )


def distance_distribution(
    edges: DataFrame,
    rounds: int = 3,
    k: int = 32,
    hash_fn=None,
) -> DataFrame:
    """The neighborhood function N(t) = Σ_v |ball_out(v, t)| for every
    t = 0..rounds — the distance-distribution / effective-diameter
    statistic of Broder-style web-graph studies — from the SAME iterated
    KMV registers as `neighborhood_function`, aggregated after every
    round instead of only the last.

    Cross-engine exactness: the per-vertex estimate (exact count below
    saturation, else the one-division KMV estimator) is floored to
    milli-units PER VERTEX before summing, so the per-t totals are
    BIGINT-exact on any engine / summation order — no float-sum
    tolerance needed in the oracle.

    Scale posture: identical to neighborhood_function (state ≤ k·|V|
    rows, one edge⋈sketch shuffle + one v-partitioned rank-k window per
    round); the per-round aggregates are lazy 1-row projections over the
    already-materialized sketches, unioned into ONE action.

    Returns (t, n_vertices, n_saturated, pairs_milli) — pairs_milli =
    Σ_v floor(1000·est_v); t = 0 is the |V| self-pair baseline.
    """
    from functools import reduce

    def round_agg(sk: DataFrame, t: int) -> DataFrame:
        return _kmv_estimate(sk, k).agg(
            F.lit(t).cast("long").alias("t"),
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum((F.col("n_sketch") >= k).cast("long")).alias("n_saturated"),
            F.sum(F.floor(F.col("estimate") * 1000.0)).alias("pairs_milli"),
        )

    aggs = [
        round_agg(sk, t) for t, sk in _kmv_sketch_rounds(edges, rounds, k, hash_fn)
    ]
    return reduce(lambda a, b: a.unionByName(b), aggs)


def densest_subgraph(
    edges: DataFrame,
    eps_num: int = 1,
    eps_den: int = 10,
    max_rounds: int = 64,
) -> DataFrame:
    """Greedy densest-subgraph peel — Bahmani, Kumar & Vassilvitskii
    (VLDB 2012), THE MapReduce densest-subgraph algorithm and the
    standard link-spam-farm / community-core detector: per round, over
    the live undirected simple graph, every vertex whose degree is at
    most (1+ε)·(2·|E|/|V|) (i.e. ≤ (1+ε)·average) is removed at once;
    the densest of the ~log_{1+ε}(n) iterates is a 2(1+ε)-approximation
    of the maximum-density subgraph (density = |E|/|V|, undirected).

    ε = eps_num/eps_den is kept RATIONAL so the peel predicate is pure
    integer arithmetic — deg(v)·|V|·eps_den·? … concretely
    deg·V·eps_den ≤ 2·E·(eps_den+eps_num) — and the best-round argmax
    compares densities by exact cross-multiplication (E_a·V_b vs
    E_b·V_a, ties → earliest round), so the result is identical on any
    engine/layout and the SQL oracle replays it verbatim.

    Per round: one degree aggregate + one broadcast-hinted anti-join
    over the shrinking live edge set; the driver sees two integer
    scalars per round (|V|, |E|).  A round that removes nothing removes
    everything next (the predicate is ≥ average for at least one vertex
    — when all degrees exceed (1+ε)·avg the set is final): the loop
    breaks when the live set is empty or unchanged; max_rounds is a
    backstop (raises — truncation would silently return a worse
    approximation).

    Returns (v, peel_round:int, in_densest:boolean): peel_round = round
    the vertex was removed (every vertex peels — min degree ≤ average,
    so each round removes ≥1 vertex and the loop runs to empty),
    in_densest = membership in the best iterate (peel_round ≥ best
    round index).
    """
    from pagerank_cuda_dynamic_spark.plans.barrier import broadcast_state, materialize

    e0 = edges.select("src", "dst").where(F.col("src") != F.col("dst"))
    und = (
        e0.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates(["a", "b"])
        .transform(materialize)
    )
    # the live VERTEX set is tracked explicitly (Bahmani's V_t): a vertex
    # isolated by its neighbors' removal stays in V_t at degree 0 (still
    # lowering the density denominator) until it peels itself — deriving
    # V_t from the live edges would silently drop it with no peel_round
    vlive = (
        und.select(F.col("a").alias("v"))
        .union(und.select(F.col("b").alias("v")))
        .distinct()
        .transform(materialize)
    )
    live = und
    n_e = live.count()
    stats = []  # (round, |V|, |E|) of each iterate, exact ints
    peeled = None
    r = 0
    while True:
        n_v = vlive.count()
        if n_v == 0:
            break
        stats.append((r, n_v, n_e))
        if r >= max_rounds:
            raise RuntimeError(
                f"densest_subgraph: max_rounds={max_rounds} exhausted with "
                f"{n_v} live vertices; raise the cap"
            )
        edeg = (
            live.select(F.col("a").alias("v"))
            .unionByName(live.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        degs = (
            vlive.join(edeg, "v", "left")
            .select("v", F.coalesce(F.col("deg"), F.lit(0)).alias("deg"))
            .transform(materialize)
        )
        # peel: deg·V·den ≤ 2·E·(den+num)  — pure integers
        thresh_lhs = n_v * eps_den
        thresh_rhs = 2 * n_e * (eps_den + eps_num)
        out_now = degs.where(
            F.col("deg") * F.lit(thresh_lhs) <= F.lit(thresh_rhs)
        ).select("v", F.lit(r).alias("peel_round"))
        out_now = out_now.transform(materialize)
        peeled = out_now if peeled is None else peeled.unionByName(out_now)
        bgone = broadcast_state(out_now.select("v"), n_v)
        vlive = vlive.join(bgone, "v", "left_anti").transform(materialize)
        live = (
            live.join(bgone.withColumnRenamed("v", "a"), "a", "left_anti")
            .join(bgone.withColumnRenamed("v", "b"), "b", "left_anti")
            .transform(materialize)
        )
        n_e = live.count()
        r += 1
    # exact argmax of E/V: no other round strictly denser; ties → earliest
    best_r, best_v, best_e = stats[0] if stats else (0, 0, 0)
    for rr, vv, ee in stats[1:]:
        if ee * best_v > best_e * vv:
            best_r, best_v, best_e = rr, vv, ee
    if peeled is None:
        return und.select(
            F.col("a").alias("v"),
            F.lit(-1).alias("peel_round"),
            F.lit(False).alias("in_densest"),
        ).limit(0)
    allv = peeled.select("v", "peel_round")
    return allv.select(
        "v",
        F.col("peel_round").cast("int").alias("peel_round"),
        (F.col("peel_round") >= F.lit(best_r)).alias("in_densest"),
    )


def butterfly_count(
    edges: DataFrame,
    max_left_outdeg: int | None = None,
) -> DataFrame:
    """Butterfly (bipartite 4-cycle) census of a directed src→dst table
    read as bipartite left=src-side, right=dst-side: a butterfly is
    {u1, u2} × {v1, v2} with all four edges present — the smallest unit
    of bipartite clustering (Sanei-Mehri, Sariyüce & Tirthapura, KDD
    2018), the standard cohesion metric for user→item / page→resource /
    doc→shingle graphs where triangles cannot exist.

    Counting identity: for every unordered right-pair (v1, v2) with
    c = |N⁻(v1) ∩ N⁻(v2)| shared left-neighbors, the pair closes
    C(c, 2) butterflies; summing over pairs counts each butterfly once.
    The per-pair c is exactly the link-prediction wedge aggregate
    (operators/linkpred.py), wedge-keyed on the shared LEFT vertex, so
    the whole census is: one self-join of the edge table on src +
    a (v1, v2) hash aggregate + one scalar sum.

    Returns one row: (butterflies, wedge_pairs, shared_wedges) —
    wedge_pairs = number of right-pairs with c ≥ 1, shared_wedges =
    Σ_pairs c (the total wedge count through shared left-neighbors,
    the denominator shape used by bipartite clustering coefficients).

    Scale shape: the d² blow-up lives at high-OUT-degree left vertices
    (a src linking k right vertices yields C(k,2) pair rows);
    `max_left_outdeg` caps the fan-out by dropping left vertices whose
    out-degree exceeds it BEFORE the self-join — the same honesty
    contract as link_prediction's `max_middle_indeg` (count becomes a
    lower bound, exact when no vertex exceeds the cap), but named for
    the distribution it actually caps: here the wedge pivot is the
    SHARED SRC, so the relevant skew is left OUT-degree, not middle
    in-degree.
    """
    e = edges.select("src", "dst").distinct()
    if max_left_outdeg is not None:
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_left_outdeg)
            .select("src")
        )
        e = e.join(keep, "src", "left_semi")
    a = e.select(F.col("src"), F.col("dst").alias("v1"))
    b = e.select(F.col("src"), F.col("dst").alias("v2"))
    pairs = (
        a.join(b, "src")
        .where(F.col("v1") < F.col("v2"))
        .groupBy("v1", "v2")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # integer `div`: C(c,2) terms and their sum stay exact longs — a
    # double sum would silently round past 2^53 at web-graph counts
    return pairs.agg(
        F.coalesce(
            F.sum(F.expr("(c * (c - 1)) div 2")), F.lit(0)
        ).alias("butterflies"),
        F.count(F.lit(1)).alias("wedge_pairs"),
        F.coalesce(F.sum("c"), F.lit(0)).alias("shared_wedges"),
    )
