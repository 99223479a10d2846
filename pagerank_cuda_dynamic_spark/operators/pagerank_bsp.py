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
with file-marker spin barriers (BarrierTaskContext.barrier() itself polls
at 1 Hz — too coarse).

Partitioning: contiguous dst stripes with boundaries chosen by cumulative
in-degree (each stripe owns ~E/P in-edges), so every vertex's pull sum is
complete within one stripe and the per-iteration exchange is exactly the
rank vector, written once, read mmap'd.  Hub vertices concentrate in their
owner stripe (documented skew; salted hub splitting is the planned v2).

Semantics identical to operators.pagerank mode="csr" (sync pull update,
L∞ convergence, universal self-loops); cross-checked in tests to 1e-12.
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


def _stripe_boundaries(graph, p: int) -> np.ndarray:
    """Contiguous dst-stripe boundaries balancing in-edge counts."""
    indeg_pdf = (
        graph.edges.groupBy(F.col("dst").alias("v"))
        .agg(F.count(F.lit(1)).alias("indeg"))
        .toPandas()
    )
    indeg = np.zeros(graph.n, dtype=np.int64)
    indeg[indeg_pdf["v"].to_numpy()] = indeg_pdf["indeg"].to_numpy()
    cum = np.cumsum(indeg)
    total = cum[-1] if len(cum) else 0
    targets = np.arange(1, p) * (total / p)
    cuts = np.searchsorted(cum, targets)
    bounds = np.concatenate([[0], cuts, [graph.n]]).astype(np.int64)
    return np.unique(bounds)  # dedupe in case of tiny graphs


def bsp_pack(graph, p: int | None = None):
    """Stripe-packed blobs: one row per dst stripe with (stripe, lo, hi,
    src_bin, dstoff_bin), repartitioned so each stripe is whole in one task.
    Cached on the snapshot (parallel one-time build ≡ host CSR build)."""
    spark = graph.edges.sparkSession
    if p is None:
        p = spark.sparkContext.defaultParallelism
    bounds = _stripe_boundaries(graph, p)
    n_stripes = len(bounds) - 1
    sc = spark.sparkContext
    bc_bounds = sc.broadcast(bounds)

    def assign(batches):
        b = bc_bounds.value
        for pdf in batches:
            dst = pdf["dst"].to_numpy()
            stripe = np.searchsorted(b, dst, side="right") - 1
            out = pdf[["src", "dst"]].copy()
            out["stripe"] = stripe.astype(np.int32)
            yield out

    with_stripe = graph.edges.mapInPandas(assign, "src long, dst long, stripe int")

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        """Per-stripe CSR block: src ids (int32 when they fit) sorted by
        dst, plus reduceat offsets over the stripe's dst range — the true
        CSR build (csr.hxx:107–286 analog), done once."""
        b = bc_bounds.value
        s = int(key[0])
        lo, hi = int(b[s]), int(b[s + 1])
        src = pdf["src"].to_numpy(dtype=np.int64)
        dstoff = pdf["dst"].to_numpy(dtype=np.int64) - lo
        order = np.argsort(dstoff, kind="stable")
        src = src[order]
        dstoff = dstoff[order]
        # CSR offsets: counts per local dst (self-loops guarantee ≥1 in-edge
        # per existing vertex; padding vertices get empty rows)
        counts = np.bincount(dstoff, minlength=hi - lo)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        if src.size and src.max() < 2**31:
            src = src.astype(np.int32)
        return pd.DataFrame(
            {
                "stripe": [s],
                "lo": [lo],
                "hi": [hi],
                "src_bin": [src.tobytes()],
                "src32": [src.dtype == np.int32],
                "offsets_bin": [offsets.tobytes()],
            }
        )

    packed = (
        with_stripe.repartition(n_stripes, "stripe")
        .groupBy("stripe")
        .applyInPandas(
            pack,
            "stripe int, lo long, hi long, src_bin binary, src32 boolean, offsets_bin binary",
        )
        .repartition(min(n_stripes, p))
        .persist()
    )
    packed.count()
    return packed, bounds, n_stripes


def _spin_wait(path_fmt: str, count: int, deadline: float) -> None:
    while True:
        ready = sum(
            1 for i in range(count) if os.path.exists(path_fmt.format(i=i))
        )
        if ready >= count:
            return
        if time.time() > deadline:
            raise TimeoutError(f"BSP sync timeout waiting for {path_fmt} ({ready}/{count})")
        time.sleep(0.0008)


def pagerank_static_bsp(
    graph, opts: PagerankOptions | None = None, q: np.ndarray | None = None
) -> PagerankResult:
    """Static (q=None) or warm-start (ND) PageRank via the BSP loop.
    Requires the self-looped snapshot (dangling='selfloop' semantics).

    Exchange design: double-buffered shared memmaps (rank/rdiv for even/odd
    iterations) written in disjoint dst-stripe slices by their owners;
    per-iteration sync is a flag-array spin in shared memory (x86 TSO store
    visibility), so one iteration costs gather + slice write + spin — no
    job launch, no file churn, no redundant assembly."""
    opts = opts or PagerankOptions()
    t_all = time.time()
    N = graph.n
    P_DAMP = opts.damping
    TOL = opts.tolerance
    MAXIT = opts.max_iterations
    C0 = (1.0 - P_DAMP) / N

    packed, bounds, n_stripes = bsp_pack(graph)
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
    mm("rank_0.npy", (N,), np.float64, r0)
    mm("rank_1.npy", (N,), np.float64, 0.0)
    mm("rdiv_0.npy", (N,), np.float64, r0 / safe_deg)
    mm("rdiv_1.npy", (N,), np.float64, 0.0)
    mm("el.npy", (MAXIT + 2, n_stripes), np.float64, 0.0)
    flags = mm("flags.npy", (MAXIT + 2, n_stripes), np.uint8, 0)
    flags[0, :] = 1
    flags.flush()

    n_bounds = bounds
    wd = workdir
    n_s = n_stripes

    def loop(it):
        import numpy as _np

        stripes = []
        for row in it:
            src = _np.frombuffer(
                row["src_bin"], dtype=_np.int32 if row["src32"] else _np.int64
            )
            offsets = _np.frombuffer(row["offsets_bin"], dtype=_np.int64)
            idx = _np.minimum(offsets[:-1], max(src.size - 1, 0))
            empty = offsets[1:] == offsets[:-1]
            stripes.append(
                (int(row["stripe"]), int(row["lo"]), int(row["hi"]), src, idx, empty)
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
        deadline = time.time() + 3600
        step_times = []
        l = 0
        while True:
            t0 = time.time()
            # wait for iteration-l stripes (flag spin in shared memory)
            while not flag_mm[l, :].all():
                if time.time() > deadline:
                    raise TimeoutError(f"BSP flag sync timeout at iter {l}")
                time.sleep(0.0002)
            if l > 0 and (float(el_mm[l, :].max()) < TOL or l >= MAXIT):
                break
            if MAXIT == 0:
                break
            cur, nxt = l % 2, (l + 1) % 2
            rdiv = rdivs[cur]
            for s, lo, hi, src, idx, empty in stripes:
                if src.size:
                    w = rdiv[src]
                    contrib = _np.add.reduceat(w, idx)
                    contrib[empty] = 0.0
                else:
                    contrib = _np.zeros(hi - lo)
                a = C0 + P_DAMP * contrib
                el = float(_np.abs(a - ranks[cur][lo:hi]).max()) if hi > lo else 0.0
                ranks[nxt][lo:hi] = a
                rdivs[nxt][lo:hi] = a / deg[lo:hi]
                el_mm[l + 1, s] = el
                flag_mm[l + 1, s] = 1
            step_times.append(time.time() - t0)
            l += 1
        if any(st[0] == 0 for st in stripes):
            yield (l, step_times)
        else:
            yield None

    results = [x for x in packed.rdd.barrier().mapPartitions(loop).collect() if x]
    iters, step_times = results[0]
    r = np.array(
        np.load(os.path.join(workdir, f"rank_{iters % 2}.npy"), mmap_mode="r")
    )
    shutil.rmtree(workdir, ignore_errors=True)
    packed.unpersist()
    return PagerankResult(
        r, iters, time.time() - t_all, superstep_seconds=step_times
    )
