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

Semantics identical to operators.pagerank mode="csr" (sync pull update,
L∞ convergence, universal self-loops); cross-checked in tests to 1e-9.
"""

from __future__ import annotations

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


def _scratch_dir() -> str:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    return os.path.join(base, f"pr_bsp_{uuid.uuid4().hex[:12]}")


def _indegrees(graph) -> np.ndarray:
    pdf = (
        graph.edges.groupBy(F.col("dst").alias("v"))
        .agg(F.count(F.lit(1)).alias("indeg"))
        .toPandas()
    )
    indeg = np.zeros(graph.n, dtype=np.int64)
    indeg[pdf["v"].to_numpy()] = pdf["indeg"].to_numpy()
    return indeg


def bsp_pack(graph, p: int | None = None, hub_factor: float = 4.0):
    """Stripe-packed CSR blobs + salted hub blocks, one row per dst stripe,
    repartitioned so each stripe is whole in one task.  Returns
    (packed_df, bounds, n_stripes, hubs).

    hubs: dst ids with indeg > hub_factor·E/p.  Their in-edges are assigned
    to stripes by pmod(src) (the salt) and packed as per-stripe hub CSR
    blocks over the full hub list; everything else is the regular
    contiguous-stripe CSR (csr.hxx:107–286 analog), built once."""
    spark = graph.edges.sparkSession
    if p is None:
        p = spark.sparkContext.defaultParallelism
    indeg = _indegrees(graph)
    total = int(indeg.sum())
    hub_cut = max(hub_factor * total / max(p, 1), 64)
    hubs = np.flatnonzero(indeg > hub_cut).astype(np.int64)
    # balance boundaries over NON-hub in-edges (hub edges are salted away)
    bal = indeg.copy()
    if hubs.size:
        bal[hubs] = 0
    cum = np.cumsum(bal)
    tot_bal = cum[-1] if len(cum) else 0
    targets = np.arange(1, p) * (tot_bal / max(p, 1))
    cuts = np.searchsorted(cum, targets)
    bounds = np.unique(
        np.concatenate([[0], cuts, [graph.n]]).astype(np.int64)
    )
    n_stripes = len(bounds) - 1
    sc = spark.sparkContext
    bc_bounds = sc.broadcast(bounds)
    bc_hubs = sc.broadcast(hubs)

    interior = F.array(*[F.lit(int(b)) for b in bounds[1:-1]])
    range_stripe = F.aggregate(
        interior,
        F.lit(0),
        lambda acc, b: acc + F.when(F.col("dst") >= b, 1).otherwise(0),
    ).cast("int")
    if hubs.size:
        hub_set = F.array(*[F.lit(int(h)) for h in hubs])
        is_hub = F.array_contains(hub_set, F.col("dst"))
        stripe_col = F.when(
            is_hub, F.pmod(F.col("src"), F.lit(n_stripes)).cast("int")
        ).otherwise(range_stripe)
    else:
        stripe_col = range_stripe
    with_stripe = graph.edges.select("src", "dst", stripe_col.alias("stripe"))

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b = bc_bounds.value
        hub_ids = bc_hubs.value
        s = int(key[0])
        lo, hi = int(b[s]), int(b[s + 1])
        src_all = pdf["src"].to_numpy(dtype=np.int64)
        dst_all = pdf["dst"].to_numpy(dtype=np.int64)
        if hub_ids.size:
            hub_col = np.searchsorted(hub_ids, dst_all)
            hub_col = np.where(
                (hub_col < hub_ids.size) & (hub_ids[np.minimum(hub_col, hub_ids.size - 1)] == dst_all),
                hub_col,
                -1,
            )
            is_h = hub_col >= 0
        else:
            is_h = np.zeros(src_all.size, dtype=bool)
        # regular rows → contiguous-stripe CSR
        src = src_all[~is_h]
        dstoff = dst_all[~is_h] - lo
        order = np.argsort(dstoff, kind="stable")
        src = src[order]
        dstoff = dstoff[order]
        counts = np.bincount(dstoff, minlength=hi - lo)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        if src.size and src.max() < 2**31:
            src = src.astype(np.int32)
        # hub rows → hub-block CSR over the full hub list
        hsrc = src_all[is_h]
        hcol = hub_col[is_h] if hub_ids.size else np.empty(0, np.int64)
        horder = np.argsort(hcol, kind="stable")
        hsrc = hsrc[horder]
        hcol = hcol[horder]
        hcounts = np.bincount(hcol, minlength=hub_ids.size)
        hoffsets = np.concatenate([[0], np.cumsum(hcounts)]).astype(np.int64)
        if hsrc.size and hsrc.max() < 2**31:
            hsrc = hsrc.astype(np.int32)
        return pd.DataFrame(
            {
                "stripe": [s],
                "lo": [lo],
                "hi": [hi],
                "src_bin": [src.tobytes()],
                "src32": [src.dtype == np.int32],
                "offsets_bin": [offsets.tobytes()],
                "hub_src_bin": [hsrc.tobytes()],
                "hub_src32": [hsrc.dtype == np.int32],
                "hub_offsets_bin": [hoffsets.tobytes()],
            }
        )

    packed = (
        with_stripe.repartition(n_stripes, "stripe")
        .groupBy("stripe")
        .applyInPandas(
            pack,
            "stripe int, lo long, hi long, src_bin binary, src32 boolean, "
            "offsets_bin binary, hub_src_bin binary, hub_src32 boolean, "
            "hub_offsets_bin binary",
        )
        .repartition(min(n_stripes, p))
        .persist()
    )
    packed.count()
    return packed, bounds, n_stripes, hubs


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
) -> PagerankResult:
    """Generalized BSP convergence loop (static/ND/DT/DF/DF-P).

    Per iteration: [phase A: every stripe computes partial sums (and mover
    marks) for salted hubs from its src-local hub edges] → flagA sync →
    [phase B: each stripe gathers its regular CSR rows, combines hub
    partials for hubs homed in it, applies the rank update (affected-only
    CSR row slices for DF/DF-P), writes its rank/rdiv slice] → flag sync.
    vaff is task-local (a stripe's flags are only touched by its owner);
    the mover set and hub partials are the only cross-stripe state."""
    t_all = time.time()
    N = graph.n
    P_DAMP = opts.damping
    TOL = opts.tolerance
    MAXIT = opts.max_iterations
    C0 = (1.0 - P_DAMP) / N
    dynamic = vaff0 is not None
    if corrected or dynamic:
        assert opts.dangling == "selfloop", "BSP dynamic modes assume self-looped graphs"

    packed, bounds, n_stripes, hubs = graph.bsp_packed()
    n_hubs = int(hubs.size)
    outdeg = graph.outdeg_array()
    safe_deg = np.maximum(outdeg, 1.0)
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
    if n_hubs:
        mm("hubpart_0.npy", (n_stripes, n_hubs), np.float64, 0.0)
        mm("hubpart_1.npy", (n_stripes, n_hubs), np.float64, 0.0)
        mm("flagsA.npy", (MAXIT + 2, n_stripes), np.uint8, 0)
        if dynamic and expand:
            mm("hubext_0.npy", (n_stripes, n_hubs), np.uint8, 0)
            mm("hubext_1.npy", (n_stripes, n_hubs), np.uint8, 0)
    if dynamic:
        mm("vaff.npy", (N,), np.uint8, vaff0.astype(np.uint8))
        mm("movers_0.npy", (N,), np.uint8,
           movers0.astype(np.uint8) if movers0 is not None else 0)
        mm("movers_1.npy", (N,), np.uint8, 0)
        # per-iteration global mover counts: lets every task skip the O(E)
        # extension gather once the frontier stops moving
        mcnt = mm("mcnt.npy", (MAXIT + 2, n_stripes), np.int64, 0)
        if movers0 is not None and movers0.any():
            mset = np.flatnonzero(movers0)
            per = np.searchsorted(bounds, mset, side="right") - 1
            cnts = np.bincount(per, minlength=n_stripes)
            mcnt[0, :] = cnts
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

    def loop(it):
        import numpy as _np

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

        hub_ids = _np.load(os.path.join(wd, "hubs.npy"), mmap_mode="r") if NH else None
        stripes = []
        for row in it:
            src = _np.frombuffer(
                row["src_bin"], dtype=_np.int32 if row["src32"] else _np.int64
            )
            offsets = _np.frombuffer(row["offsets_bin"], dtype=_np.int64)
            counts = (offsets[1:] - offsets[:-1]).astype(_np.int64)
            ridx = _np.minimum(offsets[:-1], max(src.size - 1, 0))
            empty = counts == 0
            lo, hi = int(row["lo"]), int(row["hi"])
            selfmask = None
            if do_prune and src.size:
                rowid = _np.repeat(
                    _np.arange(hi - lo, dtype=_np.int64) + lo, counts
                )
                selfmask = src == rowid
            # hub block (salted in-edges this stripe holds, over all hubs)
            hsrc = _np.frombuffer(
                row["hub_src_bin"],
                dtype=_np.int32 if row["hub_src32"] else _np.int64,
            )
            hoff = (
                _np.frombuffer(row["hub_offsets_bin"], dtype=_np.int64)
                if NH
                else _np.zeros(1, _np.int64)
            )
            hcounts = (hoff[1:] - hoff[:-1]).astype(_np.int64) if NH else None
            hridx = _np.minimum(hoff[:-1], max(hsrc.size - 1, 0)) if NH else None
            hempty = hcounts == 0 if NH else None
            hselfmask = None
            if do_prune and NH and hsrc.size:
                hub_per_edge = _np.repeat(_np.asarray(hub_ids), hcounts)
                hselfmask = hsrc == hub_per_edge
            # hubs homed in this stripe (owner combines partials)
            own_cols = (
                _np.flatnonzero((hub_ids >= lo) & (hub_ids < hi)) if NH else None
            )
            own_offs = _np.asarray(hub_ids)[own_cols] - lo if NH else None
            stripes.append(
                (
                    int(row["stripe"]), lo, hi, src, offsets, counts, ridx,
                    empty, selfmask, hsrc, hridx, hempty, hselfmask,
                    own_cols, own_offs,
                )
            )
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
        if NH:
            hubparts = [
                _np.load(os.path.join(wd, "hubpart_0.npy"), mmap_mode="r+"),
                _np.load(os.path.join(wd, "hubpart_1.npy"), mmap_mode="r+"),
            ]
            flagA_mm = _np.load(os.path.join(wd, "flagsA.npy"), mmap_mode="r+")
            if dyn and do_expand:
                hubexts = [
                    _np.load(os.path.join(wd, "hubext_0.npy"), mmap_mode="r+"),
                    _np.load(os.path.join(wd, "hubext_1.npy"), mmap_mode="r+"),
                ]
        if dyn:
            movers_bufs = [
                _np.load(os.path.join(wd, "movers_0.npy"), mmap_mode="r+"),
                _np.load(os.path.join(wd, "movers_1.npy"), mmap_mode="r+"),
            ]
            mcnt_mm = _np.load(os.path.join(wd, "mcnt.npy"), mmap_mode="r+")
            vaff_mm = _np.load(os.path.join(wd, "vaff.npy"), mmap_mode="r+")
            vaffs = {st[0]: _np.array(vaff_mm[st[1]: st[2]], dtype=bool) for st in stripes}
            prev_As = {st[0]: _np.empty(0, _np.int64) for st in stripes}
            # positions we last set to 1 in each movers buffer (for clearing)
            mov_sets = {st[0]: [_np.empty(0, _np.int64), _np.empty(0, _np.int64)] for st in stripes}
        deadline = time.time() + 3600
        step_times = []
        l = 0

        def spin(arr, row_i):
            while not arr[row_i, :].all():
                if time.time() > deadline:
                    raise TimeoutError(f"BSP flag sync timeout at iter {row_i}")
                time.sleep(0.0002)

        while True:
            t0 = time.time()
            spin(flag_mm, l)
            if l > 0 and (float(el_mm[l, :].max()) < TOL or l >= MAXIT):
                break
            if MAXIT == 0:
                break
            cur, nxt = l % 2, (l + 1) % 2
            rdiv = rdivs[cur]
            mov = movers_bufs[cur] if (dyn and do_expand) else None
            movers_alive = bool(dyn and do_expand and int(mcnt_mm[l, :].sum()) > 0)
            # ---- phase A: salted hub partials (and hub mover marks) ----
            if NH:
                for st in stripes:
                    (s, lo, hi, _src, _offs, _cnts, _ridx, _empty, _sm,
                     hsrc, hridx, hempty, hselfmask, _oc, _oo) = st
                    if hsrc.size:
                        w = rdiv[hsrc]
                        part = _np.add.reduceat(w, hridx)
                        part[hempty] = 0.0
                    else:
                        part = _np.zeros(NH)
                    hubparts[cur][s, :] = part
                    if dyn and do_expand:
                        if movers_alive and hsrc.size:
                            ms = mov[hsrc]
                            if hselfmask is not None:
                                ms = ms & ~hselfmask
                            ext = _np.add.reduceat(ms.astype(_np.float64), hridx)
                            ext[hempty] = 0.0
                            hubexts[cur][s, :] = (ext > 0).astype(_np.uint8)
                        else:
                            hubexts[cur][s, :] = 0
                    flagA_mm[l + 1, s] = 1
                spin(flagA_mm, l + 1)
            # ---- phase B: rank update per owned stripe ----
            for st in stripes:
                (s, lo, hi, src, offsets, counts, ridx, empty, selfmask,
                 _hs, _hr, _he, _hsm, own_cols, own_offs) = st
                width = hi - lo
                hub_tot = None
                if NH and own_cols is not None and own_cols.size:
                    hub_tot = hubparts[cur][:, own_cols].sum(axis=0)
                if not dyn:
                    r_slice = _np.array(ranks[cur][lo:hi])
                    if src.size:
                        w = rdiv[src]
                        sums = _np.add.reduceat(w, ridx)
                        sums[empty] = 0.0
                    else:
                        sums = _np.zeros(width)
                    if hub_tot is not None:
                        sums[own_offs] += hub_tot
                    a = C0 + P_DAMP * sums
                    eu = _np.abs(a - r_slice)
                    el = float(eu.max()) if width else 0.0
                else:
                    # dynamic: O(|affected|) maintenance — single-buffer
                    # ranks (only the owner touches its slice), write-set
                    # rdiv updates, mover-gated extension
                    vaff_s = vaffs[s]
                    if movers_alive and src.size:
                        msrc = mov[src]
                        if selfmask is not None:
                            msrc = msrc & ~selfmask
                        extc = _np.add.reduceat(msrc.astype(_np.float64), ridx)
                        extc[empty] = 0.0
                        vaff_s |= extc > 0
                    if movers_alive and NH and own_cols is not None and own_cols.size:
                        hub_marked = hubexts[cur][:, own_cols].any(axis=0)
                        vaff_s[own_offs[hub_marked]] = True
                    A = _np.flatnonzero(vaff_s)
                    rank_view = ranks[0][lo:hi]
                    rdiv_cur_v = rdivs[cur][lo:hi]
                    rdiv_nxt_v = rdivs[nxt][lo:hi]
                    el = 0.0
                    mover_pos = _np.empty(0, _np.int64)
                    if A.size:
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
                        if hub_tot is not None:
                            pos = _np.searchsorted(A, own_offs)
                            sel = (pos < A.size) & (A[_np.minimum(pos, A.size - 1)] == own_offs)
                            sums[pos[sel]] += hub_tot[sel]
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
                        mb = movers_bufs[nxt][lo:hi]
                        old_pos = mov_sets[s][nxt]
                        if old_pos.size:
                            mb[old_pos] = 0
                        if mover_pos.size:
                            mb[mover_pos] = 1
                        mov_sets[s][nxt] = mover_pos
                        mcnt_mm[l + 1, s] = mover_pos.size
                    prev_As[s] = A
                    el_mm[l + 1, s] = el
                    flag_mm[l + 1, s] = 1
                    continue
                a_div = a / _np.asarray(deg[lo:hi])
                ranks[nxt][lo:hi] = a
                rdivs[nxt][lo:hi] = a_div
                el_mm[l + 1, s] = el
                flag_mm[l + 1, s] = 1
            step_times.append(time.time() - t0)
            l += 1
        if dyn:  # publish final frontier state for segmented/checkpointed runs
            for st in stripes:
                vaff_mm[st[1]: st[2]] = vaffs[st[0]].astype(_np.uint8)
        if any(st[0] == 0 for st in stripes):
            yield (l, step_times)
        else:
            yield None

    results = [x for x in packed.rdd.barrier().mapPartitions(loop).collect() if x]
    iters, step_times = results[0]
    rank_file = "rank_0.npy" if dynamic else f"rank_{iters % 2}.npy"
    r = np.array(np.load(os.path.join(workdir, rank_file), mmap_mode="r"))
    el_final = float(np.load(os.path.join(workdir, "el.npy"), mmap_mode="r")[iters, :].max())
    state = {"converged": el_final < TOL, "el": el_final, "bounds": bounds}
    if dynamic:
        state["vaff"] = np.array(
            np.load(os.path.join(workdir, "vaff.npy"), mmap_mode="r")
        ).astype(bool)
        state["movers"] = np.array(
            np.load(os.path.join(workdir, f"movers_{iters % 2}.npy"), mmap_mode="r")
        ).astype(bool)
    shutil.rmtree(workdir, ignore_errors=True)
    return PagerankResult(
        r,
        iters,
        time.time() - t_all,
        affected_initial=int(vaff0.sum()) if dynamic else 0,
        superstep_seconds=step_times,
        state=state,
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
