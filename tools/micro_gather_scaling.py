"""Machine-roofline microbenchmark for the BSP superstep kernel.

Replays the EXACT per-stripe static gather (wsrc = rdiv[src];
np.add.reduceat over CSR row starts; rank/rdiv slice rewrite) in P
pinned OS processes with a barrier per superstep — no Spark, no JVM, no
memmap-flag machinery.  If this pure-numpy replay shows the same
per-core throughput decay as the engine when P grows, the N→4N
efficiency ceiling is the host's cache/bandwidth share per core, not
engine overhead; the honest engine metric is then throughput relative
to this roofline at each P.

Usage:  python tools/micro_gather_scaling.py [P ...]   (default 2 4 8 16 32)
Writes one JSON line to stdout; details to stderr.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SHM = "/dev/shm/micro_gather"
ITERS = 30
N_STRIPES = 32  # fixed stripe geometry: only P varies, work is identical


def build_stripes() -> dict:
    """Pack the bench graph once with Spark (p=32 stripes), dump each
    stripe's (src, ridx, empty, lo, hi) plus safe_deg to /dev/shm."""
    from pagerank_cuda_dynamic_spark.session import get_spark
    from pagerank_cuda_dynamic_spark.sources.bench_graph import dense_transcript_graph
    from pagerank_cuda_dynamic_spark.plans import GraphSnapshot
    from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import bsp_pack

    n_conv = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "200000"))
    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    e, n = dense_transcript_graph(spark, n_conv, adjacency_hops=8, seed=42)
    g = GraphSnapshot.build(e, n=n, partitions=N_STRIPES)
    packed, bounds, n_stripes, hubs = bsp_pack(g, p=N_STRIPES)
    assert hubs.size == 0, "roofline kernel assumes the no-hub regular path"
    os.makedirs(SHM, exist_ok=True)
    meta = {"n": n, "stripes": []}
    m_total = 0
    for row in packed.collect():
        s = int(row["stripe"])
        lo, hi = int(row["lo"]), int(row["hi"])
        src = np.frombuffer(row["src_bin"], dtype=np.int32 if row["src32"] else np.int64)
        offsets = np.frombuffer(row["offsets_bin"], dtype=np.int64)
        if offsets.size != hi - lo + 1:
            offsets = np.zeros(hi - lo + 1, dtype=np.int64)
        np.save(f"{SHM}/src_{s}.npy", src)
        np.save(f"{SHM}/off_{s}.npy", offsets)
        meta["stripes"].append({"s": s, "lo": lo, "hi": hi, "m": int(src.size)})
        m_total += src.size
    deg = np.where(g.outdeg_array() > 0, g.outdeg_array(), 1.0)
    np.save(f"{SHM}/deg.npy", deg)
    meta["m_total"] = int(m_total)
    g.unpersist()
    spark.stop()
    return meta


def worker(wid: int, P: int, meta: dict, barrier, out_q) -> None:
    ncpu = os.cpu_count() or 1
    stride = max(ncpu // P, 1)
    try:
        os.sched_setaffinity(0, {(wid * stride) % ncpu})
    except Exception:
        pass
    n = meta["n"]
    mine = [st for st in meta["stripes"] if st["s"] % P == wid]
    stripes = []
    for st in mine:
        src = np.load(f"{SHM}/src_{st['s']}.npy")
        offsets = np.load(f"{SHM}/off_{st['s']}.npy")
        counts = offsets[1:] - offsets[:-1]
        ridx = np.minimum(offsets[:-1], max(src.size - 1, 0))
        empty = counts == 0
        stripes.append((st["lo"], st["hi"], src, ridx, empty))
    deg = np.load(f"{SHM}/deg.npy")
    r = np.full(n, 1.0 / n)
    rdiv = r / deg
    c0 = 0.15 / n
    times = []
    for it in range(ITERS):
        barrier.wait()
        t0 = time.time()
        for lo, hi, src, ridx, empty in stripes:
            if src.size:
                wsrc = rdiv[src]
                sums = np.add.reduceat(wsrc, ridx)
                sums[empty] = 0.0
            else:
                sums = np.zeros(hi - lo)
            a = c0 + 0.85 * sums
            r[lo:hi] = a
            rdiv[lo:hi] = a / deg[lo:hi]
        barrier.wait()
        times.append(time.time() - t0)
    out_q.put((wid, times))


def measure(P: int, meta: dict) -> dict:
    barrier = mp.Barrier(P)
    out_q = mp.Queue()
    procs = [mp.Process(target=worker, args=(w, P, meta, barrier, out_q)) for w in range(P)]
    for p in procs:
        p.start()
    per = {}
    for _ in range(P):
        wid, times = out_q.get()
        per[wid] = times
    for p in procs:
        p.join()
    # superstep = slowest worker per iteration (the sync semantics)
    steps = [max(per[w][i] for w in per) for i in range(2, ITERS)]  # drop warmup
    med = float(np.median(steps))
    return {
        "P": P,
        "median_superstep_sec": round(med, 4),
        "edges_per_sec": round(meta["m_total"] / med, 0),
        "edges_per_sec_per_core": round(meta["m_total"] / med / P, 0),
    }


def main() -> None:
    ps = [int(x) for x in sys.argv[1:]] or [2, 4, 8, 16, 32]
    meta = build_stripes()
    print(f"# graph: n={meta['n']} m={meta['m_total']}", file=sys.stderr)
    rows = []
    for P in ps:
        row = measure(P, meta)
        rows.append(row)
        print(f"# P={P}: {row}", file=sys.stderr)
    eff = {}
    for a in rows:
        for b in rows:
            if b["P"] == 4 * a["P"]:
                eff[f"{a['P']}->{b['P']}"] = round(
                    (a["median_superstep_sec"] / b["median_superstep_sec"]) / 4, 3
                )
    print(json.dumps({"kernel": "static gather+reduceat, pinned, no Spark",
                      "iters": ITERS, "rows": rows, "roofline_efficiency": eff}))


if __name__ == "__main__":
    main()
