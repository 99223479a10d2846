"""BSP (bulk-synchronous) PageRank — the high-throughput execution mode.

Why it exists: a Spark job that launches Python tasks costs ~0.3–0.5 s in
local mode regardless of data volume, so a loop that submits one job per
superstep is overhead-bound for any graph whose per-superstep compute is
below ~1 s (measured: null 32-partition mapInPandas job = 0.44 s).  The
reference never pays a per-iteration launch cost — its CSR lives on the
device and each iteration is one kernel + one scalar D2H sync
(pagerankCuda.hxx:676–692).  This mode reproduces that architecture on
Spark: ONE barrier-scheduled job runs the whole convergence loop; edge
stripes stay resident in the Python workers; iterations synchronize through
a shared scratch directory (/dev/shm locally; any shared FS on a cluster)
with flag-array spin barriers (BarrierTaskContext.barrier() itself polls at
1 Hz — too coarse).

Partitioning: contiguous dst stripes with boundaries chosen by cumulative
in-degree (each stripe owns ~E/P in-edges), so every vertex's pull sum is
complete within one stripe and the per-iteration exchange is exactly the
rank vector, written once, read mmap'd.

Skew (north rule "salted high-degree hubs"): vertices whose in-degree
exceeds hub_factor·E/P are SALTED — their in-edges are spread across
stripes by src hash, each stripe computes a partial sum per hub per
iteration (phase A), and the hub's home stripe combines the partials
(phase B).  This is the degree-partitioned kernel split of the reference
(thread- vs block-per-vertex at degree 64, pagerankCuda.hxx:470–481)
re-expressed as a two-phase BSP exchange.

O(affected) dynamic supersteps (round-2 rework): every stripe also packs a
src-sorted copy of its edges with a unique-src CSR index, so marking the
out-neighbors of rank movers costs O(Σ outdeg(movers) + |movers|·log U)
instead of an O(E) in-edge gather (the reference's frontier expansion walks
out-edge lists directly, pagerankCuda.hxx:96–117 / pagerank.hxx:700).
Movers are exchanged as per-stripe id lists (segment + count), and salted
hubs keep a shared `hubaff` bitmap so phase A computes partial sums only
for hubs that are actually affected.

Semantics identical to operators.pagerank mode="csr" (sync pull update,
L∞ convergence, universal self-loops); cross-checked in tests to 1e-9.
dangling="redistribute" adds a per-superstep global dangling-mass share
(one float per stripe per iteration through shared scratch), which also
powers weighted PageRank (w_bin blobs; rdiv = r/wdeg) with no self-loop
injection — semantics of pagerank_weighted_joinagg.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time
import uuid

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from pagerank_cuda_dynamic_spark.operators.pagerank import (
    PagerankOptions,
    PagerankResult,
)

from pagerank_cuda_dynamic_spark.operators import _stripe_pack
from pagerank_cuda_dynamic_spark.operators._stripe_pack import (
    _pack_stripe_raw,
    _raw_to_row,
    _spill_write,
    _stub_pack_row,
)

# Worker closures (pack_one, the delta merge) call these helpers; ship
# their CODE with the closure instead of a module reference — Spark Python
# workers do not see the driver's runtime sys.path edits (see
# _stripe_pack's module docstring).
from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_stripe_pack)

PACK_SCHEMA = (
    "stripe int, lo long, hi long, "
    "src_bin binary, src32 boolean, offsets_bin binary, "
    "usrc_bin binary, uoff_bin binary, dstloc_bin binary, "
    "hub_src_bin binary, hub_src32 boolean, hub_offsets_bin binary, "
    "husrc_bin binary, huoff_bin binary, hubcol_bin binary, "
    "w_bin binary, hub_w_bin binary, "
    "srcb_bin binary, runoff_bin binary, rundst_bin binary, rboff_bin binary"
)

_PACK_COLS = [
    "stripe", "lo", "hi",
    "src_bin", "src32", "offsets_bin",
    "usrc_bin", "uoff_bin", "dstloc_bin",
    "hub_src_bin", "hub_src32", "hub_offsets_bin",
    "husrc_bin", "huoff_bin", "hubcol_bin",
    "w_bin", "hub_w_bin",
    "srcb_bin", "runoff_bin", "rundst_bin", "rboff_bin",
]


def _scratch_dir() -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    path = os.path.join(base, f"pr_bsp_{uuid.uuid4().hex[:12]}")
    # Scratch (memmap exchange) and derived "_spill" (stripe-record) dirs
    # must not outlive the driver: snapshots built by oracle gates or the
    # driver's queries() calls are often never unpersist()ed, and a crashed
    # run skips cleanup entirely — on tmpfs the leaked stripes are RAM.
    # Reap at interpreter exit; GraphSnapshot.unpersist still removes
    # eagerly (rmtree on a missing path is a no-op).
    for p in (path, path + "_spill"):
        atexit.register(shutil.rmtree, p, ignore_errors=True)
    return path


def _indegrees(graph) -> np.ndarray:
    """Dense |V| in-degree histogram on the driver.  NOT on the perf path —
    bsp_pack derives bounds/hubs distributedly; this remains as the exact
    cross-check used by the pack parity tests."""
    pdf = (
        graph.edges.groupBy(F.col("dst").alias("v"))
        .agg(F.count(F.lit(1)).alias("indeg"))
        .toPandas()
    )
    indeg = np.zeros(graph.n, dtype=np.int64)
    indeg[pdf["v"].to_numpy()] = pdf["indeg"].to_numpy()
    return indeg


def _auto_block_width(p: int, n: int, env: str | None) -> int:
    """Gather-layout decision (measured on both sides, see bsp_pack):
    explicit env/param always wins (0 = force row order); otherwise
    block when the rank vector dwarfs LLC (|V|·8 B > 128 MB) AND the
    host core count is high enough to thrash the shared cache (≥ 16
    logical CPUs — os.cpu_count() counts SMT threads, so on SMT-2 hosts
    the gate means ≥ 8 physical cores; the nearest portable proxy).
    Host cores, not defaultParallelism: a session with inflated
    parallelism on a small box still has one LLC, and the blocking
    win/loss is a property of the cache, not the scheduler."""
    if env is not None:
        return int(env)
    cores = os.cpu_count() or p
    if min(cores, p) >= 16 and n * 8 > 128 * 2**20:
        return 1_000_000
    return 0


def bsp_pack(
    graph,
    p: int | None = None,
    hub_factor: float = 4.0,
    block_width: int | None = None,
    stripe_edges: int | None = None,
    spill_dir: str | None = None,
):
    """Stripe-packed CSR blobs + salted hub blocks, one row per dst stripe,
    repartitioned so each stripe is whole in one task.  Returns
    (packed_df, bounds, n_stripes, hubs).

    hubs: dst ids with indeg > hub_factor·E/p.  Their in-edges are assigned
    to stripes by pmod(src) (the salt) and packed as per-stripe hub CSR
    blocks over the full hub list; everything else is the regular
    contiguous-stripe CSR (csr.hxx:107–286 analog), built once.  Every
    blob also carries a src-sorted view (usrc/uoff/dstloc and
    husrc/huoff/hubcol) so mover-frontier extension is O(out-edges of
    movers).  If graph.edges has a `w` column, per-edge weights ride along
    (w_bin/hub_w_bin) for weighted PageRank.

    Exactly ONE row per stripe id 0..n_stripes-1 is guaranteed (stripes
    that receive no edges get an empty stub row) — the barrier loop waits
    on every stripe's flag, so a missing stripe would deadlock it.

    Cache-blocked gather layout (AUTO when |V|·8 B > 128 MB and p ≥ 16 —
    the regime it measurably wins; force via block_width / SPARK_GRAFT_
    BLOCK_WIDTH, 0 = row order): each stripe's regular edges are ALSO packed
    reordered by (src // block_width, dst) with run boundaries
    (srcb/runoff/rundst/rboff blobs); the static loop then gathers rdiv
    one block_width·8-byte rank-vector window at a time instead of
    random-accessing all |V|·8 bytes.  Per-(block,dst) runs reduce
    exactly like CSR rows; per-block partials accumulate with
    unique-index adds (1e-10-identical, summation regrouping only).
    MEASURED on the Zipf bench family this is ~35% SLOWER than row order
    (hot head keeps the gather cache-resident; see BENCH records r4 vs
    r4b), hence opt-in — it targets working sets that genuinely exceed
    LLC.  MEASURED WIN in that regime (BENCH_r4f_scale4x_blocked vs
    _scale4x): at 4× the bench graph (26.6 M vertices, 213 MB rank
    vector — pure DRAM) block_width=1e6 is +41% at local[32]
    (541 → 764 M edges/s) while ~7% slower at local[8] — enable it when
    |V|·8 B ≫ LLC and the core count is high enough to thrash the
    shared cache.

    Scale note: bounds and hubs are derived DISTRIBUTEDLY — hub detection
    is a `HAVING count > cut` aggregate that ships only the (tiny, ≤
    ~p/hub_factor) hub list to the driver, and stripe bounds are
    approxQuantile percentiles of non-hub edge dst values (≡ balancing
    cumulative non-hub in-degree).  Nothing O(|V|) touches the driver in
    the pack; the loop's own |V|-fits-one-node assumption (the reference
    assumes one GPU, pagerankCuda.hxx:798) is now the only one left."""
    spark = graph.edges.sparkSession
    if p is None:
        p = spark.sparkContext.defaultParallelism
    if stripe_edges is None:
        stripe_edges = int(os.environ.get("SPARK_GRAFT_STRIPE_EDGES", "150000"))
    if block_width is None:
        # Row-order gather while any of the rank vector is cache-resident
        # (blocking MEASURED SLOWER there: r4b record — the Zipf head keeps
        # hot entries in LLC and blocking only adds run-accumulation
        # overhead), AUTO-blocked in the regime blocking was built for and
        # MEASURED to win (+41% at local[32], scale4x_blocked record):
        # rank vector ≫ LLC (|V|·8 B > 128 MB) AND enough cores to thrash
        # the shared cache (p ≥ 16).  Env/param always override (0 = force
        # row order); forced-multi-block parity tests cover both layouts.
        block_width = _auto_block_width(
            p, graph.n, os.environ.get("SPARK_GRAFT_BLOCK_WIDTH")
        )
    weighted = "w" in graph.edges.columns
    e = graph.edges
    # ONE union-agg degree pass replaces four separate |E| jobs (the edge
    # count, the hub HAVING aggregate, the approxQuantile bounds pass, and
    # the loop setup's out-degree collect): (v, outdeg, indeg) lands as a
    # |V|-row table on the driver, and |E|, the hub list, the EXACT
    # edge-balanced stripe bounds and the out-degree array all derive from
    # it in numpy.  Driver-side O(|V|) here matches the loop's existing
    # |V|-fits-one-node posture (it memmaps |V|-sized rank vectors; the
    # reference assumes one GPU, pagerankCuda.hxx:798).
    deg_pdf = (
        e.select(F.col("src").alias("v"), F.lit(1).alias("o"), F.lit(0).alias("i"))
        .unionByName(
            e.select(F.col("dst").alias("v"), F.lit(0).alias("o"), F.lit(1).alias("i"))
        )
        .groupBy("v")
        .agg(F.sum("o").alias("outdeg"), F.sum("i").alias("indeg"))
        .toPandas()
    )
    v_arr = deg_pdf["v"].to_numpy(dtype=np.int64)
    out_arr = deg_pdf["outdeg"].to_numpy(dtype=np.int64)
    in_arr = deg_pdf["indeg"].to_numpy(dtype=np.int64)
    total = int(in_arr.sum())
    if not weighted and getattr(graph, "_outdeg_np", None) is None and hasattr(
        graph, "_outdeg_np"
    ):
        arr = np.zeros(graph.n, dtype=np.float64)
        arr[v_arr] = out_arr
        graph._outdeg_np = arr
    hub_cut = max(hub_factor * total / max(p, 1), 64)
    hubs = np.sort(v_arr[in_arr > hub_cut])
    # stripes FINER than tasks (k per task, round-robin balanced): a
    # stripe's dst range — and on locality-bearing graphs its src range —
    # shrinks with the stripe, so the gather+sums working set drops into
    # cache.  Measured on the 26.9M-edge bench family: 8 fat stripes
    # 0.127 s/superstep → ~176 fine stripes 0.045 s at local[8];
    # 32 → 192–256 stripes 0.019–0.031 s at local[32].  k rounds to keep
    # stripe count a task multiple (uneven waves straggle the superstep).
    k = 1
    if total and p:
        k = max(1, min(16, round(total / p / max(stripe_edges, 1))))
    n_target = p * k
    # EXACT cumulative-indegree bounds over NON-hub in-edges (hub edges are
    # salted away): sort the degree table by dst and cut where the non-hub
    # indegree prefix sum crosses each i/n_target fraction — the histogram
    # the old approxQuantile pass estimated, now exact and job-free.
    cuts_np = np.empty(0, dtype=np.int64)
    if total and n_target > 1:
        order = np.argsort(v_arr, kind="stable")
        v_sorted = v_arr[order]
        w_nonhub = np.where(in_arr[order] > hub_cut, 0, in_arr[order])
        cum = np.cumsum(w_nonhub)
        tot_nh = int(cum[-1]) if cum.size else 0
        if tot_nh > 0:
            targets = (np.arange(1, n_target) / n_target) * tot_nh
            idx = np.searchsorted(cum, targets, side="left")
            cuts_np = v_sorted[np.minimum(idx, v_sorted.size - 1)]
    bounds = np.unique(
        np.concatenate([[0], cuts_np, [graph.n]]).astype(np.int64)
    )
    n_stripes = len(bounds) - 1
    sc = spark.sparkContext
    bc_bounds = sc.broadcast(bounds)
    bc_hubs = sc.broadcast(hubs)

    # --- routing: ONE hash shuffle lands each stripe BLOCK on its own
    # task.  The per-row stripe is a vectorized searchsorted in a
    # pandas UDF (a JVM higher-order-function fold over the ~n_stripes
    # bounds array measured ~20 s/pass at 27M edges — 6x the whole Arrow
    # transfer); the shuffle key is a probed integer k_b per block with
    # pmod(murmur3(k_b), n_parts) == b, so repartition(n_parts, key) IS the
    # identity block->partition map (verified: HashPartitioning and
    # F.hash share Murmur3/seed-42) and every pack task can derive the
    # stripe set it owns from its partition id alone — which lets it emit
    # its own empty-stripe stub rows (the barrier loop spins on every
    # stripe's flag) and kills both the stub-detection collect and the
    # blob re-repartition that used to materialize the pack twice.
    n_parts = max(min(n_stripes, p), 1)
    # ROUND-ROBIN stripe->block ownership (stripe % n_parts), not
    # contiguous ranges: the barrier superstep is max-over-tasks, and
    # per-stripe gather cost has a gradient along the dst range (Zipf
    # id ordering), so contiguous blocks concentrate the hot stripes on
    # one task (measured: 28.7 -> ~41 ms/superstep at 27M edges).  The
    # interleave restores the old repartition()'s load balance while
    # keeping the one-shuffle owned-stripe pack.
    blk_of = np.arange(n_stripes, dtype=np.int64) % n_parts
    probe = (
        spark.range(0, 32 * n_parts + 64)
        .select("id", F.pmod(F.hash("id"), F.lit(n_parts)).alias("b"))
        .toPandas()
    )
    key_of_block = np.full(n_parts, -1, dtype=np.int64)
    for kid, b in zip(probe["id"].to_numpy(), probe["b"].to_numpy()):
        if key_of_block[int(b)] < 0:
            key_of_block[int(b)] = int(kid)
    assert (key_of_block >= 0).all(), "murmur3 probe failed to cover all blocks"
    key_of_stripe = key_of_block[blk_of]
    interior_np = bounds[1:-1]
    ns_cap = n_stripes

    def _stripe_of(src_np: np.ndarray, dst_np: np.ndarray) -> np.ndarray:
        stripe = np.searchsorted(interior_np, dst_np, side="right")
        hub_ids = bc_hubs.value
        if hub_ids.size:
            pos = np.searchsorted(hub_ids, dst_np)
            is_h = (pos < hub_ids.size) & (
                hub_ids[np.minimum(pos, hub_ids.size - 1)] == dst_np
            )
            stripe = np.where(is_h, src_np % ns_cap, stripe)
        return stripe

    # Vectorized pandas route (one numpy searchsorted per batch).  A pure-
    # codegen route was tried in this round and measured SLOWER: a
    # log-depth CASE WHEN bisection tree over the ~n_stripes bounds costs
    # ~5.8 s/pass at 27M edges (nested-when codegen does not JIT well)
    # vs ~3.3 s for the whole Arrow crossing, and a linear higher-order
    # fold ~20 s/pass — the Arrow route stays.
    @F.pandas_udf("long")
    def _route_key(src_s: pd.Series, dst_s: pd.Series) -> pd.Series:
        stripe = _stripe_of(
            src_s.to_numpy(dtype=np.int64), dst_s.to_numpy(dtype=np.int64)
        )
        return pd.Series(key_of_stripe[stripe])

    cols = ["src", "dst"] + (["w"] if weighted else [])
    routed = graph.edges.select(
        *cols, _route_key("src", "dst").alias("rkey")
    ).repartition(n_parts, "rkey")

    def pack_one(s: int, src_all, dst_all, w_all) -> dict:
        b = bc_bounds.value
        raw = _pack_stripe_raw(
            s, int(b[s]), int(b[s + 1]), src_all, dst_all, w_all,
            bc_hubs.value, block_width, weighted,
        )
        if spill_dir:
            _spill_write(spill_dir, raw)
            return _stub_pack_row(raw)
        return _raw_to_row(raw)

    def pack_partition(batches):
        """Pack every stripe this partition OWNS (blk_of == partitionId) —
        including empty ones as stub rows, so exactly one row per stripe
        exists globally and the barrier loop never waits on a missing
        flag.  Runs on empty partitions too (verified behavior)."""
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        own = np.flatnonzero(blk_of == pid)
        pdfs = [pdf for pdf in batches]
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True)
            src_all = pdf["src"].to_numpy(dtype=np.int64)
            dst_all = pdf["dst"].to_numpy(dtype=np.int64)
            w_all = pdf["w"].to_numpy(dtype=np.float64) if weighted else None
            stripe = _stripe_of(src_all, dst_all)
            if not np.isin(stripe, own).all():
                # the searchsorted slices below silently DROP edges whose
                # stripe this partition does not own, so a divergence
                # between the murmur3 probe and HashPartitioning must
                # fail loudly, not corrupt ranks (raise, not assert:
                # survives python -O)
                raise RuntimeError(
                    "bsp_pack misroute: partition received edges for "
                    "stripes it does not own — murmur3 probe and "
                    "repartition hash disagree"
                )
            order = np.argsort(stripe, kind="stable")
            src_all, dst_all = src_all[order], dst_all[order]
            if weighted:
                w_all = w_all[order]
            stripe = stripe[order]
            cuts_ = np.searchsorted(stripe, own)
            ends_ = np.searchsorted(stripe, own, side="right")
        rows = []
        for i, s in enumerate(own):
            if pdfs:
                a, z = int(cuts_[i]), int(ends_[i])
                rows.append(
                    pack_one(
                        int(s),
                        src_all[a:z],
                        dst_all[a:z],
                        w_all[a:z] if weighted else None,
                    )
                )
            else:
                rows.append(
                    pack_one(
                        int(s),
                        np.empty(0, np.int64),
                        np.empty(0, np.int64),
                        np.empty(0, np.float64) if weighted else None,
                    )
                )
        if rows:
            yield pd.DataFrame(rows, columns=_PACK_COLS)

    packed = routed.drop("rkey").mapInPandas(pack_partition, PACK_SCHEMA).persist()
    n_rows = packed.count()
    assert n_rows == n_stripes, (
        f"pack emitted {n_rows} stripe rows, expected {n_stripes}"
    )
    if spill_dir:
        # spill is complete iff the pack job materialized every stripe row
        # (asserted above) — the marker gates the loop's spill-load path
        import pickle

        with open(os.path.join(spill_dir, "META.pkl"), "wb") as f:
            pickle.dump(
                {
                    "bounds": bounds, "hubs": hubs, "n_stripes": n_stripes,
                    "n_parts": n_parts, "block_width": block_width,
                    "weighted": weighted, "n": graph.n,
                },
                f,
                protocol=pickle.HIGHEST_PROTOCOL,
            )
        with open(os.path.join(spill_dir, "COMPLETE"), "w") as f:
            f.write(str(n_stripes))
    return packed, bounds, n_stripes, hubs


DELTA_MAX_BATCH = int(os.environ.get("SPARK_GRAFT_DELTA_MAX_BATCH", "200000"))


def delta_pack(child, parent, deletions, insertions, spill_dir: str):
    """Incremental stripe pack: merge a small batch into the PARENT's
    spilled stripe records instead of re-shuffling all |E| edges.

    The reference's dynamic thesis is that a batch's cost should scale with
    the batch, not the graph (batch.hxx:222–247 applies updates in place;
    the device CSR is rebuilt only for the touched ranges).  The full
    bsp_pack is a full-data shuffle — correct for a new graph, absurd for a
    67-edge insert batch.  Here each owner task reconstructs only its
    TOUCHED stripes' edge lists from the parent spill (dst from CSR counts,
    hub dst from the hub-block counts), applies set semantics
    ((E \\ D) ∪ I — duplicate inserts and missing deletes are no-ops), and
    re-packs those stripes; untouched stripes are hardlinked.  Bounds and
    hub list are inherited from the parent (a small batch cannot move the
    balance point materially; routing stays consistent by construction).

    Cost: one |batch|-broadcast job over n_parts tasks, O(|batch| +
    Σ|touched stripes|) work, zero shuffle.  Also derives the child's
    out-degree array from the parent's + the applied delta, so the child
    skips the |E| groupBy + |V| collect entirely.

    Returns (None, bounds, n_stripes, hubs) — the packed-DataFrame slot is
    None because every consumer path reads the spill — or None when
    ineligible (no parent spill, weighted, n changed, batch too big)."""
    import pickle

    pspill = getattr(parent, "_bsp_spill", None)
    if not pspill or not os.path.exists(os.path.join(pspill, "COMPLETE")):
        return None
    with open(os.path.join(pspill, "META.pkl"), "rb") as f:
        meta = pickle.load(f)
    # src·n+dst keys must fit int64; weighted packs carry per-edge payloads
    # the reconstruction does not model
    if meta.get("weighted") or child.n != meta["n"] or child.n >= 2**31:
        return None
    lim = DELTA_MAX_BATCH
    dpdf = deletions.select("src", "dst").limit(lim + 1).toPandas()
    ipdf = insertions.select("src", "dst").limit(lim + 1).toPandas()
    if len(dpdf) > lim or len(ipdf) > lim:
        return None
    bounds = np.asarray(meta["bounds"], dtype=np.int64)
    hubs = np.asarray(meta["hubs"], dtype=np.int64)
    n_stripes, n_parts = int(meta["n_stripes"]), int(meta["n_parts"])
    block_width = int(meta["block_width"] or 0)
    N = int(child.n)
    interior = bounds[1:-1]

    def _route(src, dst):
        # intentional twin of bsp_pack's _stripe_of (closure-local there for
        # worker serialization; a shared module-level helper would pickle
        # by reference and break the spark-submit --py-files launch mode).
        # Any edit must land in BOTH; divergence is pinned by
        # tests/test_pagerank_bsp_dynamic.py::test_delta_pack_matches_full_pack
        stripe = np.searchsorted(interior, dst, side="right")
        if hubs.size:
            pos = np.searchsorted(hubs, dst)
            is_h = (pos < hubs.size) & (
                hubs[np.minimum(pos, hubs.size - 1)] == dst
            )
            stripe = np.where(is_h, src % n_stripes, stripe)
        return stripe

    d_src = dpdf["src"].to_numpy(np.int64)
    d_dst = dpdf["dst"].to_numpy(np.int64)
    # universal self-loops are re-injected by the full path
    # (GraphSnapshot.build self_loops=True), so a (v,v) deletion is a
    # no-op there — match that semantics instead of removing the loop
    keep_d = d_src != d_dst
    d_src, d_dst = d_src[keep_d], d_dst[keep_d]
    i_src = ipdf["src"].to_numpy(np.int64)
    i_dst = ipdf["dst"].to_numpy(np.int64)
    d_stripe = _route(d_src, d_dst)
    i_stripe = _route(i_src, i_dst)
    d_key = d_src * N + d_dst
    i_key = i_src * N + i_dst
    PARENT, CHILD = pspill, spill_dir
    NSTR, NP, BW, NN, HUBS = n_stripes, n_parts, block_width, N, hubs

    def merge(it):
        import os as _os
        import pickle as _pickle
        import shutil as _shutil

        import numpy as _np
        from pyspark import TaskContext as _TC

        for _ in it:
            pass  # drain the skeleton partition
        pid = _TC.get().partitionId()
        _os.makedirs(CHILD, exist_ok=True)
        a_ins, a_del = [], []
        for s in range(pid, NSTR, NP):
            pp = _os.path.join(PARENT, f"s{s}.pkl")
            cp = _os.path.join(CHILD, f"s{s}.pkl")
            dm = d_stripe == s
            im = i_stripe == s
            if not dm.any() and not im.any():
                # untouched stripe: hardlink shares the parent's record
                # (tmpfs refcounts survive the parent spill's removal)
                if not _os.path.exists(cp):
                    try:
                        _os.link(pp, cp)
                    except OSError:
                        _shutil.copy(pp, cp)
                continue
            with open(pp, "rb") as fh:
                raw = _pickle.load(fh)
            lo, hi = int(raw["lo"]), int(raw["hi"])
            counts = raw["offsets"][1:] - raw["offsets"][:-1]
            dst_reg = lo + _np.repeat(
                _np.arange(hi - lo, dtype=_np.int64), counts
            )
            src_reg = raw["src"].astype(_np.int64)
            if HUBS.size:
                hcnt = raw["hoff"][1:] - raw["hoff"][:-1]
                src_all = _np.concatenate(
                    [src_reg, raw["hsrc"].astype(_np.int64)]
                )
                dst_all = _np.concatenate([dst_reg, _np.repeat(HUBS, hcnt)])
            else:
                src_all, dst_all = src_reg, dst_reg
            key = src_all * NN + dst_all
            kept = key
            if dm.any():
                dk = _np.unique(d_key[dm])
                kept = key[~_np.isin(key, dk)]
                adk = dk[_np.isin(dk, key)]
                if adk.size:
                    a_del.append(adk // NN)
            if im.any():
                ik = _np.unique(i_key[im])
                new = ik[~_np.isin(ik, kept)]
                if new.size:
                    a_ins.append(new // NN)
                merged = _np.concatenate([kept, new])
            else:
                merged = kept
            raw2 = _pack_stripe_raw(
                s, lo, hi, merged // NN, merged % NN, None, HUBS, BW, False
            )
            _spill_write(CHILD, raw2)
        yield (
            _np.concatenate(a_ins) if a_ins else _np.empty(0, _np.int64),
            _np.concatenate(a_del) if a_del else _np.empty(0, _np.int64),
        )

    sc = child.edges.sparkSession.sparkContext
    rows = sc.parallelize(range(n_parts), n_parts).mapPartitions(merge).collect()
    with open(os.path.join(spill_dir, "META.pkl"), "wb") as f:
        pickle.dump(meta, f, protocol=pickle.HIGHEST_PROTOCOL)
    with open(os.path.join(spill_dir, "COMPLETE"), "w") as f:
        f.write(str(n_stripes))
    # child out-degrees = parent's + applied delta (self-loops unchanged by
    # contract) — skips the |E| groupBy + |V|-row collect on the child
    out = parent.outdeg_array().copy()
    for a_ins, a_del in rows:
        if a_ins.size:
            np.add.at(out, a_ins, 1.0)
        if a_del.size:
            np.subtract.at(out, a_del, 1.0)
    child._outdeg_np = out
    return None, bounds, n_stripes, hubs


def _ragged_take(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Vectorized concatenation of ranges [starts[i], starts[i]+lens[i]).
    starts/lens must have lens > 0."""
    tot = int(lens.sum())
    out = np.ones(tot, dtype=np.int64)
    out[0] = starts[0]
    pos = np.cumsum(lens)[:-1]
    out[pos] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
    return np.cumsum(out)


def _bsp_loop(
    graph,
    opts: PagerankOptions,
    q: np.ndarray | None = None,
    vaff0: np.ndarray | None = None,
    corrected: bool = False,
    expand: bool = False,
    prune: bool = False,
    movers0: np.ndarray | None = None,
    weighted: bool = False,
) -> PagerankResult:
    """Generalized BSP convergence loop (static/ND/DT/DF/DF-P, ± weights).

    Per iteration:
      [A0 (dynamic+expand+hubs): every stripe marks hubs reached from the
       mover list via its hub src-CSR into the shared `hubaff` bitmap]
      → flagA0 sync →
      [A1 (hubs): every stripe computes partial sums for affected (dynamic)
       or all (static) hubs from its salted hub edges] → flagA sync →
      [B: each stripe extends its own frontier from the mover list via its
       regular src-CSR, gathers affected CSR row slices, applies the rank
       update, writes its rank/rdiv slice + its mover-id segment] → flag.
    vaff is task-local (a stripe's flags are only touched by its owner);
    movers (id segments + counts + a ping-pong bitmap twin — consumers
    pick the cheaper encoding per stripe), hub partials and `hubaff` are
    the only cross-stripe state."""
    t_all = time.time()
    N = graph.n
    P_DAMP = opts.damping
    TOL = opts.tolerance
    MAXIT = opts.max_iterations
    C0 = (1.0 - P_DAMP) / N
    dynamic = vaff0 is not None
    redistribute = opts.dangling == "redistribute"
    if corrected or dynamic:
        assert opts.dangling == "selfloop", "BSP dynamic modes assume self-looped graphs"
        assert not weighted, "BSP dynamic modes are unweighted (reference regime)"

    # Dynamic loops never read the blocked-gather blobs (they gather by
    # affected-row CSR slices, not full-stripe block sweeps) — skip
    # building them so large-|V| dynamic runs don't pay the auto-block
    # lexsort/memory for nothing.  A cached pack (e.g. from a prior
    # static run on the same snapshot) is reused either way.
    t_pack = time.time()
    pack_cached = getattr(graph, "_bsp_packed", None) is not None
    packed, bounds, n_stripes, hubs = graph.bsp_packed(
        block_width=0 if dynamic else None
    )
    pack_sec = 0.0 if pack_cached else time.time() - t_pack
    # stripe spill: when the pack wrote raw stripe records to the
    # snapshot's scratch spill (GraphSnapshot.bsp_packed does), the loop
    # loads them straight from the shared FS instead of re-streaming
    # ~|E|·12 B of blob rows JVM→Arrow→Python on EVERY invocation — the
    # dominant setup cost for repeat runs (warm starts, dynamic batches).
    # The row-stream path remains for packs without a spill (weighted
    # snapshots, direct bsp_pack callers).
    spill = getattr(graph, "_bsp_spill", None)
    SPILL = (
        spill
        if spill and os.path.exists(os.path.join(spill, "COMPLETE"))
        else None
    )
    if packed is not None:
        NPARTS = packed.rdd.getNumPartitions()
    else:  # delta-packed snapshot: stripe records exist only in the spill
        import pickle

        with open(os.path.join(SPILL, "META.pkl"), "rb") as f:
            NPARTS = int(pickle.load(f)["n_parts"])
    n_hubs = int(hubs.size)
    outdeg = graph.outdeg_array()
    # Guard only the dangling zeros (their rdiv is never read): a plain
    # np.maximum(outdeg, 1.0) would silently clamp fractional *weighted*
    # out-degrees in (0, 1) and divide contributions by 1.0 instead of wdeg.
    safe_deg = np.where(outdeg > 0, outdeg, 1.0)
    workdir = _scratch_dir()
    os.makedirs(workdir, exist_ok=True)
    r0 = np.full(N, 1.0 / N) if q is None else np.asarray(q, dtype=np.float64)

    def mm(name, shape, dtype, init=None):
        arr = np.lib.format.open_memmap(
            os.path.join(workdir, name), mode="w+", dtype=dtype, shape=shape
        )
        if init is not None:
            arr[:] = init
        arr.flush()
        return arr

    mm("deg.npy", (N,), np.float64, safe_deg)
    mm("hubs.npy", (max(n_hubs, 1),), np.int64, hubs if n_hubs else 0)
    mm("rank_0.npy", (N,), np.float64, r0)
    mm("rank_1.npy", (N,), np.float64, 0.0)
    mm("rdiv_0.npy", (N,), np.float64, r0 / safe_deg)
    # dynamic mode updates rdiv by write-set, so both buffers must start
    # equal (unaffected entries are never rewritten)
    mm("rdiv_1.npy", (N,), np.float64, r0 / safe_deg)
    mm("el.npy", (MAXIT + 2, n_stripes), np.float64, 0.0)
    if redistribute:
        dang = outdeg == 0
        mm("dang.npy", (N,), np.uint8, dang.astype(np.uint8))
        dmass = mm("dmass.npy", (MAXIT + 2, n_stripes), np.float64, 0.0)
        for s in range(n_stripes):
            dmass[0, s] = float(r0[bounds[s]: bounds[s + 1]][dang[bounds[s]: bounds[s + 1]]].sum())
        dmass.flush()
    if n_hubs:
        mm("hubpart_0.npy", (n_stripes, n_hubs), np.float64, 0.0)
        mm("hubpart_1.npy", (n_stripes, n_hubs), np.float64, 0.0)
        mm("flagsA.npy", (MAXIT + 2, n_stripes), np.uint8, 0)
        if dynamic:
            mm("hubaff.npy", (n_hubs,), np.uint8, vaff0[hubs].astype(np.uint8))
        if dynamic and expand:
            mm("flagsA0.npy", (MAXIT + 2, n_stripes), np.uint8, 0)
    if dynamic:
        mm("vaff.npy", (N,), np.uint8, vaff0.astype(np.uint8))
        # per-stripe saturation flags (DF expand-without-prune only): once a
        # stripe's whole slice is affected its bitmap can never change again
        # (marking is monotone without pruning), so owners advertise
        # saturation here and the mover machinery shuts itself off when
        # every stripe has saturated — a dense-batch (1e-3·|E|) DF run then
        # pays ND's per-superstep cost instead of a second edge walk
        mm("sat.npy", (n_stripes,), np.uint8, 0)
        # movers exchanged two ways, consumers pick per stripe by size:
        # id lists (stripe s owns segment [bounds[s], bounds[s]+mcnt[row,s])
        # of movers_ids_{row%2}) are cheap to WALK when the frontier is
        # sparse (O(|M|·log|usrc|) searchsorted); the ping-pong BITMAP is
        # cheap when it is dense (one O(|usrc|) byte gather, independent of
        # |M|) — without it a dense-but-unsaturated 1e-3 frontier pays a
        # near-|E| searchsorted walk per stripe per superstep plus a ×P
        # duplicated O(|M|) id concat, which is what made full-size DF
        # slower than a static recompute
        mids0 = mm("movers_ids_0.npy", (N,), np.int64, 0)
        mm("movers_ids_1.npy", (N,), np.int64, 0)
        mbm0 = mm("movers_bm_0.npy", (N,), np.uint8, 0)
        mm("movers_bm_1.npy", (N,), np.uint8, 0)
        mcnt = mm("mcnt.npy", (MAXIT + 2, n_stripes), np.int64, 0)
        if movers0 is not None and movers0.any():
            for s in range(n_stripes):
                lo, hi = int(bounds[s]), int(bounds[s + 1])
                ids = np.flatnonzero(movers0[lo:hi]).astype(np.int64) + lo
                mids0[lo: lo + ids.size] = ids
                mcnt[0, s] = ids.size
            mbm0[:] = movers0.astype(np.uint8)
            mids0.flush()
            mbm0.flush()
            mcnt.flush()
    flags = mm("flags.npy", (MAXIT + 2, n_stripes), np.uint8, 0)
    flags[0, :] = 1
    flags.flush()

    wd = workdir
    dyn = dynamic
    do_expand = expand
    do_prune = prune
    do_corr = corrected
    D_TOL = opts.frontier_tolerance
    C_TOL = opts.prune_tolerance
    NH = n_hubs
    NSTRIPES = n_stripes
    WEIGHTED = weighted
    REDIST = redistribute
    bounds_list = [int(b) for b in bounds]

    PIN = bool(os.environ.get("SPARK_GRAFT_PIN_CORES"))
    # mover-walk strategy override: "" = auto (per-stripe by size),
    # "1" = force the bitmap gather, "0" = force the id-list walk.
    # Exists so the parity test can pin bitmap ≡ id-list bit-equality;
    # captured here (driver-side) so the serialized closure carries it.
    MBM_FORCE = os.environ.get("SPARK_GRAFT_MOVER_BM", "")

    def loop(it):
        import numpy as _np

        if PIN:
            # pin each resident worker to its own core (stride-spread when
            # tasks < cores): removes scheduler migration + run-queue
            # jitter — the superstep is a max over stripes, so one
            # preempted worker stretches every superstep
            try:
                from pyspark import TaskContext as _TC

                _pid = _TC.get().partitionId()
                _ncpu = os.cpu_count() or 1
                _stride = max(_ncpu // max(NSTRIPES, 1), 1)
                os.sched_setaffinity(0, {(_pid * _stride) % _ncpu})
            except Exception:
                pass  # non-Linux or restricted: run unpinned

        def ragged_take(starts, lens):
            # local copy of _ragged_take: module-level refs would force
            # workers to import this package (not on their sys.path when
            # the driver added the repo to sys.path at runtime)
            tot = int(lens.sum())
            out = _np.ones(tot, dtype=_np.int64)
            out[0] = starts[0]
            pos = _np.cumsum(lens)[:-1]
            out[pos] = starts[1:] - (starts[:-1] + lens[:-1] - 1)
            return _np.cumsum(out)

        def csr_lookup(keys, ukeys, uoff):
            """positions (into the src-sorted edge array) of all edges whose
            src ∈ keys; keys and ukeys sorted.  Returns int64 edge idx."""
            if keys.size == 0 or ukeys.size == 0:
                return _np.empty(0, _np.int64)
            pos = _np.searchsorted(ukeys, keys)
            pos = _np.minimum(pos, ukeys.size - 1)
            ok = ukeys[pos] == keys
            if not ok.any():
                return _np.empty(0, _np.int64)
            hit = pos[ok]
            starts = uoff[hit]
            lens = uoff[hit + 1] - starts
            return ragged_take(starts, lens)

        hub_ids = _np.load(os.path.join(wd, "hubs.npy"), mmap_mode="r") if NH else None
        raws = []
        if SPILL is not None:
            # spill-load: stripe ownership is positional (s ≡ pid mod
            # NPARTS — the pack's round-robin blk_of rule), so the task
            # reconstructs its stripe set from its partition id alone and
            # reads raw records off the shared scratch
            import pickle as _pickle
            from pyspark import TaskContext as _TC2

            for _ in it:
                pass  # drain the skeleton partition
            _mypid = _TC2.get().partitionId()
            for s2 in range(_mypid, NSTRIPES, NPARTS):
                with open(os.path.join(SPILL, f"s{s2}.pkl"), "rb") as fh:
                    raws.append(_pickle.load(fh))
        else:
            for row in it:
                lo, hi = int(row["lo"]), int(row["hi"])
                width = hi - lo
                offsets = _np.frombuffer(row["offsets_bin"], dtype=_np.int64)
                if offsets.size != width + 1:  # empty stub stripe
                    offsets = _np.zeros(width + 1, dtype=_np.int64)
                uoff = _np.frombuffer(row["uoff_bin"], dtype=_np.int64)
                if uoff.size == 0:
                    uoff = _np.zeros(1, dtype=_np.int64)
                hoff = (
                    _np.frombuffer(row["hub_offsets_bin"], dtype=_np.int64)
                    if NH
                    else _np.zeros(1, _np.int64)
                )
                if NH and hoff.size != NH + 1:
                    hoff = _np.zeros(NH + 1, dtype=_np.int64)
                huoff = _np.frombuffer(row["huoff_bin"], dtype=_np.int64)
                if huoff.size == 0:
                    huoff = _np.zeros(1, dtype=_np.int64)
                raws.append(
                    {
                        "s": int(row["stripe"]), "lo": lo, "hi": hi,
                        "src": _np.frombuffer(
                            row["src_bin"],
                            dtype=_np.int32 if row["src32"] else _np.int64,
                        ),
                        "offsets": offsets,
                        "usrc": _np.frombuffer(row["usrc_bin"], dtype=_np.int64),
                        "uoff": uoff,
                        "dstloc": _np.frombuffer(row["dstloc_bin"], dtype=_np.int32),
                        "hsrc": _np.frombuffer(
                            row["hub_src_bin"],
                            dtype=_np.int32 if row["hub_src32"] else _np.int64,
                        ),
                        "hoff": hoff,
                        "husrc": _np.frombuffer(row["husrc_bin"], dtype=_np.int64),
                        "huoff": huoff,
                        "hubcol": _np.frombuffer(row["hubcol_bin"], dtype=_np.int32),
                        "w_reg": _np.frombuffer(row["w_bin"], dtype=_np.float64)
                        if WEIGHTED
                        else None,
                        "w_hub": _np.frombuffer(row["hub_w_bin"], dtype=_np.float64)
                        if WEIGHTED
                        else None,
                        "srcb": _np.frombuffer(
                            row["srcb_bin"],
                            dtype=_np.int32 if row["src32"] else _np.int64,
                        ),
                        "run_off": _np.frombuffer(row["runoff_bin"], dtype=_np.int64),
                        "run_dst": _np.frombuffer(row["rundst_bin"], dtype=_np.int32),
                        "rb_off": _np.frombuffer(row["rboff_bin"], dtype=_np.int64),
                    }
                )
        stripes = []
        for raw in raws:
            lo, hi = int(raw["lo"]), int(raw["hi"])
            src, offsets = raw["src"], raw["offsets"]
            counts = (offsets[1:] - offsets[:-1]).astype(_np.int64)
            ridx = _np.minimum(offsets[:-1], max(src.size - 1, 0))
            empty = counts == 0
            usrc, uoff, dstloc = raw["usrc"], raw["uoff"], raw["dstloc"]
            self_srcord = None
            if do_prune and dstloc.size:
                srcs_exp = _np.repeat(usrc, (uoff[1:] - uoff[:-1]))
                self_srcord = srcs_exp == (dstloc.astype(_np.int64) + lo)
            # hub block (salted in-edges this stripe holds, over all hubs)
            hsrc, hoff = raw["hsrc"], raw["hoff"]
            hcounts = (hoff[1:] - hoff[:-1]).astype(_np.int64) if NH else None
            hridx = _np.minimum(hoff[:-1], max(hsrc.size - 1, 0)) if NH else None
            hempty = hcounts == 0 if NH else None
            husrc, huoff, hubcol = raw["husrc"], raw["huoff"], raw["hubcol"]
            hself_srcord = None
            if do_prune and NH and hubcol.size:
                hsrcs_exp = _np.repeat(husrc, (huoff[1:] - huoff[:-1]))
                hself_srcord = hsrcs_exp == _np.asarray(hub_ids)[hubcol]
            # hubs homed in this stripe (owner combines partials)
            own_cols = (
                _np.flatnonzero((_np.asarray(hub_ids) >= lo) & (_np.asarray(hub_ids) < hi))
                if NH
                else _np.empty(0, _np.int64)
            )
            own_offs = _np.asarray(hub_ids)[own_cols] - lo if NH else None
            stripes.append(
                {
                    "s": int(raw["s"]), "lo": lo, "hi": hi,
                    "src": src, "offsets": offsets, "counts": counts,
                    "ridx": ridx, "empty": empty,
                    "usrc": usrc, "uoff": uoff, "dstloc": dstloc,
                    "self_srcord": self_srcord,
                    "hsrc": hsrc, "hoff": hoff, "hcounts": hcounts,
                    "hridx": hridx, "hempty": hempty,
                    "husrc": husrc, "huoff": huoff, "hubcol": hubcol,
                    "hself_srcord": hself_srcord,
                    "w_reg": raw["w_reg"] if WEIGHTED else None,
                    "w_hub": raw["w_hub"] if WEIGHTED else None,
                    "srcb": raw["srcb"], "run_off": raw["run_off"],
                    "run_dst": raw["run_dst"], "rb_off": raw["rb_off"],
                    "own_cols": own_cols, "own_offs": own_offs,
                }
            )
        del raws
        deg = _np.load(os.path.join(wd, "deg.npy"), mmap_mode="r")
        ranks = [
            _np.load(os.path.join(wd, "rank_0.npy"), mmap_mode="r+"),
            _np.load(os.path.join(wd, "rank_1.npy"), mmap_mode="r+"),
        ]
        rdivs = [
            _np.load(os.path.join(wd, "rdiv_0.npy"), mmap_mode="r+"),
            _np.load(os.path.join(wd, "rdiv_1.npy"), mmap_mode="r+"),
        ]
        el_mm = _np.load(os.path.join(wd, "el.npy"), mmap_mode="r+")
        flag_mm = _np.load(os.path.join(wd, "flags.npy"), mmap_mode="r+")
        if REDIST:
            dang_mm = _np.load(os.path.join(wd, "dang.npy"), mmap_mode="r")
            dmass_mm = _np.load(os.path.join(wd, "dmass.npy"), mmap_mode="r+")
            dang_slices = {st["s"]: _np.asarray(dang_mm[st["lo"]: st["hi"]]).astype(bool) for st in stripes}
        if NH:
            hubparts = [
                _np.load(os.path.join(wd, "hubpart_0.npy"), mmap_mode="r+"),
                _np.load(os.path.join(wd, "hubpart_1.npy"), mmap_mode="r+"),
            ]
            flagA_mm = _np.load(os.path.join(wd, "flagsA.npy"), mmap_mode="r+")
            if dyn:
                hubaff_mm = _np.load(os.path.join(wd, "hubaff.npy"), mmap_mode="r+")
            if dyn and do_expand:
                flagA0_mm = _np.load(os.path.join(wd, "flagsA0.npy"), mmap_mode="r+")
        if dyn:
            mids = [
                _np.load(os.path.join(wd, "movers_ids_0.npy"), mmap_mode="r+"),
                _np.load(os.path.join(wd, "movers_ids_1.npy"), mmap_mode="r+"),
            ]
            mbms = [
                _np.load(os.path.join(wd, "movers_bm_0.npy"), mmap_mode="r+"),
                _np.load(os.path.join(wd, "movers_bm_1.npy"), mmap_mode="r+"),
            ]
            mcnt_mm = _np.load(os.path.join(wd, "mcnt.npy"), mmap_mode="r+")
            vaff_mm = _np.load(os.path.join(wd, "vaff.npy"), mmap_mode="r+")
            sat_mm = _np.load(os.path.join(wd, "sat.npy"), mmap_mode="r+")
            vaffs = {st["s"]: _np.array(vaff_mm[st["lo"]: st["hi"]], dtype=bool) for st in stripes}
            prev_As = {st["s"]: _np.empty(0, _np.int64) for st in stripes}
        deadline = time.time() + 3600
        step_times = []
        l = 0

        def spin(arr, row_i):
            # hybrid spin: ~0.5 ms hot window (sub-µs sync latency when
            # peers are already close — the common case for short dynamic
            # supersteps), then 0.2 ms sleeps so laggard stripes keep the
            # cores during long static supersteps
            n = 0
            while not arr[row_i, :].all():
                n += 1
                if n > 300:
                    if time.time() > deadline:
                        raise TimeoutError(f"BSP flag sync timeout at iter {row_i}")
                    time.sleep(0.0002)

        def mover_list(row_i, buf):
            segs = []
            for s2 in range(NSTRIPES):
                c = int(mcnt_mm[row_i, s2])
                if c:
                    lo2 = bounds_list[s2]
                    segs.append(_np.array(buf[lo2: lo2 + c]))
            if not segs:
                return _np.empty(0, _np.int64)
            return _np.concatenate(segs)  # sorted: segments are ordered

        while True:
            t0 = time.time()
            spin(flag_mm, l)
            if l > 0 and (float(el_mm[l, :].max()) < TOL or l >= MAXIT):
                break
            if MAXIT == 0:
                break
            cur, nxt = l % 2, (l + 1) % 2
            rdiv = rdivs[cur]
            mtotal = int(mcnt_mm[l, :].sum()) if (dyn and do_expand) else 0
            movers_alive = mtotal > 0
            # mover walks pick a strategy PER CONSUMER stripe: a sparse
            # frontier walks the id list (O(|M|·log|usrc|)); a dense one
            # gathers the mover bitmap over usrc (O(|usrc|), independent
            # of |M|).  The O(|M|) id concat is lazy so bitmap-only
            # iterations never pay it (it used to run on EVERY worker)
            _M_cell = []

            def get_M():
                if not _M_cell:
                    _M_cell.append(mover_list(l, mids[cur]))
                return _M_cell[0]

            def mover_edges(usrc, uoff):
                """edge indices (into the stripe's src-sorted edge array)
                whose src moved in iteration l — bitmap or id-list path,
                identical results."""
                use_bm = (
                    MBM_FORCE == "1"
                    or (MBM_FORCE == "" and mtotal * 8 > usrc.size)
                )
                if use_bm:
                    hit = _np.flatnonzero(mbms[cur][usrc])
                    if not hit.size:
                        return _np.empty(0, _np.int64)
                    return ragged_take(uoff[hit], uoff[hit + 1] - uoff[hit])
                return csr_lookup(get_M(), usrc, uoff)
            # DF fast path: with expansion but no pruning the affected map is
            # monotone, so once EVERY stripe has saturated no mover can mark
            # anything new — stop emitting them (which also kills the A0 hub
            # walk and mover-list builds via movers_alive above).  Stale
            # reads of a peer's sat byte only delay the shut-off, never
            # suppress a needed mark (flags are monotone 0→1)
            sat_all = bool(
                dyn and do_expand and not do_prune and sat_mm.all()
            )
            # ---- phase A0: mark hubs reached from movers (hub src-CSR) ----
            # skipped entirely (including its sync) when the frontier is
            # dead — movers_alive is derived from the same mcnt row on
            # every stripe, so the skip decision is globally consistent
            if NH and dyn and do_expand and movers_alive:
                for st in stripes:
                    # a saturated stripe already wrote hubaff=1 for every
                    # hub it owns (vaff all-true, phase-B publication), so
                    # its hub walk cannot add a mark — skip it (saturation
                    # flags only exist in expand-without-prune mode)
                    sat_skip = not do_prune and sat_mm[st["s"]]
                    if st["husrc"].size and not sat_skip:
                        eidx = mover_edges(st["husrc"], st["huoff"])
                        if do_prune and eidx.size and st["hself_srcord"] is not None:
                            eidx = eidx[~st["hself_srcord"][eidx]]
                        if eidx.size:
                            hubaff_mm[st["hubcol"][eidx]] = 1
                    flagA0_mm[l + 1, st["s"]] = 1
                spin(flagA0_mm, l + 1)
            # ---- phase A1: salted hub partial sums (affected-only if dyn) ----
            if NH:
                needed = _np.flatnonzero(hubaff_mm) if dyn else None
                for st in stripes:
                    s = st["s"]
                    hsrc, hoff, hcounts = st["hsrc"], st["hoff"], st["hcounts"]
                    if not hsrc.size:
                        if needed is None:
                            hubparts[cur][s, :] = 0.0
                        elif needed.size:
                            hubparts[cur][s, needed] = 0.0
                    elif needed is None or int(hcounts[needed].sum()) >= 0.6 * hsrc.size:
                        wsrc = rdiv[hsrc]
                        if WEIGHTED:
                            wsrc = wsrc * st["w_hub"]
                        part = _np.add.reduceat(wsrc, st["hridx"])
                        part[st["hempty"]] = 0.0
                        hubparts[cur][s, :] = part
                    elif needed.size:
                        lens = hcounts[needed]
                        nz = lens > 0
                        part = _np.zeros(needed.size)
                        if nz.any():
                            eidx = ragged_take(hoff[needed][nz], lens[nz])
                            wsrc = rdiv[hsrc[eidx]]
                            locs = _np.concatenate(
                                [[0], _np.cumsum(lens[nz])[:-1]]
                            ).astype(_np.int64)
                            part[nz] = _np.add.reduceat(wsrc, locs)
                        hubparts[cur][s, needed] = part
                    flagA_mm[l + 1, s] = 1
                spin(flagA_mm, l + 1)
            dsh = (
                P_DAMP * float(dmass_mm[l, :].sum()) / N if REDIST else 0.0
            )
            # ---- phase B: rank update per owned stripe ----
            for st in stripes:
                s, lo, hi = st["s"], st["lo"], st["hi"]
                src, offsets, counts = st["src"], st["offsets"], st["counts"]
                ridx, empty = st["ridx"], st["empty"]
                own_cols, own_offs = st["own_cols"], st["own_offs"]
                width = hi - lo
                if not dyn:
                    r_slice = _np.array(ranks[cur][lo:hi])
                    if st["srcb"].size:
                        # blocked gather: rdiv reads walk one block_width
                        # window at a time; per-block partials land on
                        # unique dst rows, so += is a plain fancy add
                        partial = _np.add.reduceat(rdiv[st["srcb"]], st["run_off"])
                        sums = _np.zeros(width)
                        rb, rd = st["rb_off"], st["run_dst"]
                        for bi in range(rb.size - 1):
                            sl = slice(rb[bi], rb[bi + 1])
                            sums[rd[sl]] += partial[sl]
                    elif src.size:
                        wsrc = rdiv[src]
                        if WEIGHTED:
                            wsrc = wsrc * st["w_reg"]
                        sums = _np.add.reduceat(wsrc, ridx)
                        sums[empty] = 0.0
                    else:
                        sums = _np.zeros(width)
                    if NH and own_cols.size:
                        sums[own_offs] += hubparts[cur][:, own_cols].sum(axis=0)
                    a = C0 + dsh + P_DAMP * sums
                    eu = _np.abs(a - r_slice)
                    el = float(eu.max()) if width else 0.0
                    a_div = a / _np.asarray(deg[lo:hi])
                    ranks[nxt][lo:hi] = a
                    rdivs[nxt][lo:hi] = a_div
                    if REDIST:
                        dmass_mm[l + 1, s] = float(a[dang_slices[s]].sum())
                    el_mm[l + 1, s] = el
                    flag_mm[l + 1, s] = 1
                    continue
                # dynamic: O(|affected|) maintenance — single-buffer ranks
                # (only the owner touches its slice), write-set rdiv
                # updates, src-CSR mover extension
                vaff_s = vaffs[s]
                s_sat = bool(
                    do_expand and not do_prune and sat_mm[s]
                )  # owner's own byte — exact, set below
                if not s_sat:
                    if movers_alive and st["usrc"].size:
                        eidx = mover_edges(st["usrc"], st["uoff"])
                        if do_prune and eidx.size and st["self_srcord"] is not None:
                            eidx = eidx[~st["self_srcord"][eidx]]
                        if eidx.size:
                            vaff_s[st["dstloc"][eidx]] = True
                    if NH and own_cols.size:
                        vaff_s[own_offs] |= hubaff_mm[own_cols].astype(bool)
                    A = _np.flatnonzero(vaff_s)
                    full_stripe = A.size == width
                    if full_stripe and do_expand and not do_prune:
                        sat_mm[s] = 1
                else:
                    A = None  # saturated: affected ≡ the whole slice
                    full_stripe = True
                rank_view = ranks[0][lo:hi]
                rdiv_cur_v = rdivs[cur][lo:hi]
                rdiv_nxt_v = rdivs[nxt][lo:hi]
                el = 0.0
                mover_pos = _np.empty(0, _np.int64)
                if full_stripe and width:
                    # contiguous twin of the sparse branch below — identical
                    # float expressions evaluated on whole slices (A would be
                    # arange(width)), so results are bit-equal while skipping
                    # the fancy-index gathers, the A0/usrc mover walks and
                    # (once sat_all) mover emission itself
                    r_A = _np.array(rank_view)
                    if src.size:
                        w = rdiv[src]
                        if WEIGHTED:
                            w = w * st["w_reg"]
                        sums = _np.add.reduceat(w, ridx)
                        sums[empty] = 0.0
                    else:
                        sums = _np.zeros(width)
                    if NH and own_cols.size:
                        sums[own_offs] += hubparts[cur][:, own_cols].sum(axis=0)
                    dv_A = _np.asarray(deg[lo:hi])
                    if do_corr:
                        a_vals = (C0 + P_DAMP * (sums - r_A / dv_A)) / (
                            1.0 - P_DAMP / dv_A
                        )
                    else:
                        a_vals = C0 + P_DAMP * sums
                    rank_view[:] = a_vals
                    eu = _np.abs(r_A - a_vals)
                    el = float(eu.max())
                    if (do_expand and not sat_all) or do_prune:
                        denom = _np.maximum(_np.maximum(r_A, a_vals), 1e-300)
                        rel = eu / denom
                        if do_expand and not sat_all:
                            mover_pos = _np.flatnonzero(rel > D_TOL)
                        if do_prune:
                            vaff_s[rel <= C_TOL] = False
                    rdiv_nxt_v[:] = a_vals / dv_A
                elif A is not None and A.size:
                    r_A = _np.array(rank_view[A])
                    lens = counts[A]
                    nz = lens > 0
                    sums = _np.zeros(A.size)
                    if nz.any():
                        tot = int(lens[nz].sum())
                        if tot >= 0.6 * src.size:
                            w = rdiv[src]
                            full = _np.add.reduceat(w, ridx)
                            full[empty] = 0.0
                            sums = full[A]
                        else:
                            eidx = ragged_take(offsets[A][nz], lens[nz])
                            w = rdiv[src[eidx]]
                            loc = _np.concatenate(
                                [[0], _np.cumsum(lens[nz])[:-1]]
                            ).astype(_np.int64)
                            sums_nz = _np.add.reduceat(w, loc)
                            sums[nz] = sums_nz
                    if NH and own_cols.size:
                        act = _np.flatnonzero(vaff_s[own_offs])
                        if act.size:
                            hub_tot = hubparts[cur][:, own_cols[act]].sum(axis=0)
                            pos = _np.searchsorted(A, own_offs[act])
                            sums[pos] += hub_tot
                    dv_A = _np.asarray(deg[lo:hi])[A]
                    if do_corr:
                        a_vals = (C0 + P_DAMP * (sums - r_A / dv_A)) / (
                            1.0 - P_DAMP / dv_A
                        )
                    else:
                        a_vals = C0 + P_DAMP * sums
                    rank_view[A] = a_vals
                    eu = _np.abs(r_A - a_vals)
                    el = float(eu.max())
                    if do_expand or do_prune:
                        denom = _np.maximum(_np.maximum(r_A, a_vals), 1e-300)
                        rel = eu / denom
                        if do_expand:
                            mover_pos = A[rel > D_TOL]
                        if do_prune:
                            vaff_s[A[rel <= C_TOL]] = False
                    # rdiv_next: new values at A; repair the rest by
                    # stale-set copy (sparse frontier) or one contiguous
                    # memcpy (dense frontier — scattered writes lose)
                    if A.size > 0.5 * width:
                        rdiv_nxt_v[:] = rdiv_cur_v
                        rdiv_nxt_v[A] = a_vals / dv_A
                    else:
                        rdiv_nxt_v[A] = a_vals / dv_A
                        stale = _np.setdiff1d(prev_As[s], A, assume_unique=True)
                        if stale.size:
                            rdiv_nxt_v[stale] = rdiv_cur_v[stale]
                else:
                    stale = prev_As[s]
                    if stale.size:
                        rdiv_nxt_v[stale] = rdiv_cur_v[stale]
                if do_expand:
                    ids_abs = mover_pos + lo
                    if ids_abs.size:
                        mids[nxt][lo: lo + ids_abs.size] = ids_abs
                    mcnt_mm[l + 1, s] = ids_abs.size
                    if not sat_all:
                        # bitmap twin of the id segment (consumers pick by
                        # size); under sat_all nothing reads movers, so
                        # skip the O(width) slice write too
                        bm_v = mbms[nxt][lo:hi]
                        bm_v[:] = 0
                        if mover_pos.size:
                            bm_v[mover_pos] = 1
                if NH and own_cols.size:
                    # authoritative hub-affected state after prune/extension
                    hubaff_mm[own_cols] = vaff_s[own_offs].astype(_np.uint8)
                if A is not None:  # saturated stripes keep their last A
                    prev_As[s] = A
                el_mm[l + 1, s] = el
                flag_mm[l + 1, s] = 1
            step_times.append(time.time() - t0)
            l += 1
        if dyn:  # publish final frontier state for segmented/checkpointed runs
            for st in stripes:
                vaff_mm[st["lo"]: st["hi"]] = vaffs[st["s"]].astype(_np.uint8)
        if any(st["s"] == 0 for st in stripes):
            yield (l, step_times)
        else:
            yield None

    if SPILL is not None:
        # lightweight skeleton job: one int per partition, stripes load
        # from the spill — no blob rows cross the JVM/Python boundary
        sc = graph.edges.sparkSession.sparkContext
        base = sc.parallelize(range(NPARTS), NPARTS)
        results = [x for x in base.barrier().mapPartitions(loop).collect() if x]
    else:
        results = [x for x in packed.rdd.barrier().mapPartitions(loop).collect() if x]
    iters, step_times = results[0]
    # setup = memmap init + barrier dispatch + stripe deserialization and
    # any other wall outside the worker-timed supersteps
    setup_sec = (time.time() - t_pack) - pack_sec - sum(step_times)
    rank_file = "rank_0.npy" if dynamic else f"rank_{iters % 2}.npy"
    r = np.array(np.load(os.path.join(workdir, rank_file), mmap_mode="r"))
    el_final = float(np.load(os.path.join(workdir, "el.npy"), mmap_mode="r")[iters, :].max())
    state = {"converged": el_final < TOL, "el": el_final, "bounds": bounds}
    if dynamic:
        state["vaff"] = np.array(
            np.load(os.path.join(workdir, "vaff.npy"), mmap_mode="r")
        ).astype(bool)
        movers = np.zeros(N, dtype=bool)
        mcnt_fin = np.load(os.path.join(workdir, "mcnt.npy"), mmap_mode="r")[iters, :]
        mids_fin = np.load(
            os.path.join(workdir, f"movers_ids_{iters % 2}.npy"), mmap_mode="r"
        )
        for s in range(n_stripes):
            c = int(mcnt_fin[s])
            if c:
                movers[np.array(mids_fin[bounds[s]: bounds[s] + c])] = True
        state["movers"] = movers
    shutil.rmtree(workdir, ignore_errors=True)
    return PagerankResult(
        r,
        iters,
        time.time() - t_all,
        affected_initial=int(vaff0.sum()) if dynamic else 0,
        superstep_seconds=step_times,
        state=state,
        pack_seconds=pack_sec,
        setup_seconds=max(setup_sec, 0.0),
    )


def pagerank_static_bsp(
    graph, opts: PagerankOptions | None = None, q: np.ndarray | None = None
) -> PagerankResult:
    """Static (q=None) or warm-start/Naive-Dynamic PageRank via BSP."""
    return _bsp_loop(graph, opts or PagerankOptions(), q=q)


def pagerank_dynamic_traversal_bsp(
    old, new, deletions, insertions, q: np.ndarray, opts: PagerankOptions | None = None
) -> PagerankResult:
    from pagerank_cuda_dynamic_spark.operators.pagerank import (
        _adjust_warm_start,
        _traversal_marks,
    )

    opts = opts or PagerankOptions()
    vaff = _traversal_marks(old, new, deletions, insertions)
    return _bsp_loop(new, opts, q=_adjust_warm_start(q, new.n), vaff0=vaff)


def pagerank_dynamic_frontier_bsp(
    old, new, deletions, insertions, q: np.ndarray, opts: PagerankOptions | None = None
) -> PagerankResult:
    from pagerank_cuda_dynamic_spark.operators.pagerank import (
        _adjust_warm_start,
        _frontier_marks,
    )

    opts = opts or PagerankOptions()
    vaff = _frontier_marks(old, new, deletions, insertions)
    return _bsp_loop(
        new, opts, q=_adjust_warm_start(q, new.n), vaff0=vaff, expand=True
    )


def pagerank_dynamic_frontier_prune_bsp(
    old, new, deletions, insertions, q: np.ndarray, opts: PagerankOptions | None = None
) -> PagerankResult:
    from pagerank_cuda_dynamic_spark.operators.pagerank import (
        _adjust_warm_start,
        _frontier_marks,
    )

    opts = opts or PagerankOptions()
    vaff = _frontier_marks(old, new, deletions, insertions)
    return _bsp_loop(
        new,
        opts,
        q=_adjust_warm_start(q, new.n),
        vaff0=vaff,
        corrected=True,
        expand=True,
        prune=True,
    )


class WeightedSnapshot:
    """Minimal weighted-graph snapshot for the BSP path: (src, dst, w)
    edges cached dst-partitioned, wdeg side array.  No self-loop injection
    — dangling mass is redistributed per superstep (mtx.hxx:119 readers
    accept weights; semantics of pagerank_weighted_joinagg)."""

    def __init__(self, edges_w, n: int, partitions: int | None = None):
        spark = edges_w.sparkSession
        p = partitions or spark.sparkContext.defaultParallelism
        self.edges = edges_w.select("src", "dst", "w").repartition(p, "dst").persist()
        self.edges.count()
        self.n = n
        self._wdeg: np.ndarray | None = None
        self._bsp_packed: tuple | None = None

    def outdeg_array(self) -> np.ndarray:
        if self._wdeg is None:
            pdf = self.edges.groupBy("src").agg(F.sum("w").alias("wdeg")).toPandas()
            arr = np.zeros(self.n, dtype=np.float64)
            arr[pdf["src"].to_numpy()] = pdf["wdeg"].to_numpy()
            self._wdeg = arr
        return self._wdeg

    def bsp_packed(
        self,
        p: int | None = None,
        hub_factor: float = 4.0,
        block_width: int | None = None,
    ) -> tuple:
        if self._bsp_packed is None:
            self._bsp_packed = bsp_pack(
                self, p, hub_factor=hub_factor, block_width=block_width
            )
        return self._bsp_packed

    def unpersist(self) -> None:
        self.edges.unpersist()
        if self._bsp_packed is not None:
            self._bsp_packed[0].unpersist()
            self._bsp_packed = None


def pagerank_weighted_bsp(
    edges_w, n: int, opts: PagerankOptions | None = None
) -> PagerankResult:
    """Weighted pull PageRank on the BSP path:
    a[v] = C0 + P·(Σ w_uv·r[u]/wdeg(u) + dangling_mass/N)."""
    opts = opts or PagerankOptions(dangling="redistribute")
    assert opts.dangling == "redistribute", "weighted BSP redistributes dangling mass"
    g = WeightedSnapshot(edges_w, n)
    try:
        return _bsp_loop(g, opts, weighted=True)
    finally:
        g.unpersist()
