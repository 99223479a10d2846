"""Cross-node BSP PageRank — TCP ring-allgather exchange.

The /dev/shm memmap exchange in pagerank_bsp assumes every stripe task can
mmap one shared directory — true on one host (or a truly coherent shared
FS), false on a generic multi-node cluster.  This module runs the SAME
resident-stripe convergence loop with the iteration exchange done over
peer-to-peer TCP instead of shared files, so it works across nodes with no
shared storage at all:

  * the driver hosts a one-shot rendezvous socket; every barrier task
    registers (partition id, host, port, owned vertex ranges) and receives
    the full roster,
  * tasks form a ring in partition-id order (each keeps exactly two
    persistent connections),
  * per iteration each task updates the ranks of its owned stripes, then a
    (P−1)-step ring allgather circulates every task's block
    (slices + local L∞); after the ring every task holds the full rank
    vector and the global L∞, so all tasks take the same stop decision —
    no flags, no shared files, no driver round-trip per iteration.

Bandwidth is optimal (each task sends/receives exactly |V|·8 bytes per
iteration regardless of P); latency is (P−1) hops of pipelined small
blocks.  A dedicated writer thread per task prevents the classic
all-sendall ring deadlock when blocks exceed kernel socket buffers.

Salted high-degree hubs are supported by a second (cheap) ring phase per
iteration: each task's NH-float salted-partial vector circulates once and
every task sums all P contributions, so hub homes fold complete totals
into their update — message order between the two phases is preserved by
TCP FIFO + the single writer queue.

Scope: static / warm-start (Naive-Dynamic) PageRank, self-loop dangling;
the dynamic frontier family keeps the memmap exchange locally and the
joinagg twins cross-node.  Semantics cross-checked against
pagerank_bsp/csr in tests to 1e-10 (including forced hub salting).
"""

from __future__ import annotations

import pickle
import socket
import struct
import threading
import time

import numpy as np

from pagerank_cuda_dynamic_spark.operators.pagerank import (
    PagerankOptions,
    PagerankResult,
)
from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import bsp_pack


def _send_msg(sock: socket.socket, payload: bytes) -> None:
    sock.sendall(struct.pack("<Q", len(payload)) + payload)


def _recv_msg(sock: socket.socket) -> bytes:
    hdr = b""
    while len(hdr) < 8:
        chunk = sock.recv(8 - len(hdr))
        if not chunk:
            raise ConnectionError("ring peer closed")
        hdr += chunk
    (n,) = struct.unpack("<Q", hdr)
    buf = bytearray(n)
    view = memoryview(buf)
    got = 0
    while got < n:
        r = sock.recv_into(view[got:], min(n - got, 1 << 20))
        if r == 0:
            raise ConnectionError("ring peer closed mid-message")
        got += r
    return bytes(buf)


class _Rendezvous(threading.Thread):
    """Driver-side one-shot roster exchange: collects `n` registrations,
    then replies the full roster to every participant."""

    def __init__(self, n: int):
        super().__init__(daemon=True)
        self.n = n
        self.server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.server.bind(("0.0.0.0", 0))
        self.server.listen(n + 8)
        self.port = self.server.getsockname()[1]
        self.error: Exception | None = None

    def run(self) -> None:  # pragma: no cover - network thread
        try:
            conns, entries = [], {}
            while len(entries) < self.n:
                c, _ = self.server.accept()
                reg = pickle.loads(_recv_msg(c))
                entries[reg["pid"]] = reg
                conns.append(c)
            roster = pickle.dumps([entries[i] for i in sorted(entries)])
            for c in conns:
                _send_msg(c, roster)
                c.close()
        except Exception as e:  # surfaced via driver timeout
            self.error = e
        finally:
            self.server.close()


def pagerank_static_tcp(
    graph,
    opts: PagerankOptions | None = None,
    q: np.ndarray | None = None,
) -> PagerankResult:
    """Static (q=None) or warm-start PageRank with the TCP ring exchange.
    Runs anywhere barrier tasks can open sockets to each other — no shared
    filesystem required."""
    opts = opts or PagerankOptions()
    assert opts.dangling == "selfloop", "TCP mode v1 assumes self-looped graphs"
    t_all = time.time()
    spark = graph.edges.sparkSession
    sc = spark.sparkContext
    N = graph.n
    P_DAMP = opts.damping
    TOL = opts.tolerance
    MAXIT = opts.max_iterations
    C0 = (1.0 - P_DAMP) / N

    packed, bounds, n_stripes, hubs = bsp_pack(graph)
    NH = int(hubs.size)
    n_tasks = packed.rdd.getNumPartitions()
    rdv = _Rendezvous(n_tasks)
    rdv.start()
    driver_host = sc.getConf().get("spark.driver.host", "127.0.0.1")
    rdv_addr = (driver_host, rdv.port)

    safe_deg = np.maximum(graph.outdeg_array(), 1.0)
    r0 = np.full(N, 1.0 / N) if q is None else np.asarray(q, dtype=np.float64)
    bc_deg = sc.broadcast(safe_deg)
    bc_r0 = sc.broadcast(r0)
    bc_hubs = sc.broadcast(hubs)

    def loop(it):
        import numpy as _np
        from pyspark import BarrierTaskContext

        # local copies of the framing helpers: referencing module-level
        # functions would force workers to import this package, which is
        # not on their sys.path when the driver added the repo at runtime
        def _send_msg(sock, payload):
            sock.sendall(struct.pack("<Q", len(payload)) + payload)

        def _recv_msg(sock):
            hdr = b""
            while len(hdr) < 8:
                chunk = sock.recv(8 - len(hdr))
                if not chunk:
                    raise ConnectionError("ring peer closed")
                hdr += chunk
            (n,) = struct.unpack("<Q", hdr)
            buf = bytearray(n)
            view = memoryview(buf)
            got = 0
            while got < n:
                r2 = sock.recv_into(view[got:], min(n - got, 1 << 20))
                if r2 == 0:
                    raise ConnectionError("ring peer closed mid-message")
                got += r2
            return bytes(buf)

        ctx = BarrierTaskContext.get()
        pid = ctx.partitionId()

        hub_ids = _np.asarray(bc_hubs.value)
        stripes = []
        for row in it:
            lo, hi = int(row["lo"]), int(row["hi"])
            width = hi - lo
            src = _np.frombuffer(
                row["src_bin"], dtype=_np.int32 if row["src32"] else _np.int64
            )
            offsets = _np.frombuffer(row["offsets_bin"], dtype=_np.int64)
            if offsets.size != width + 1:
                offsets = _np.zeros(width + 1, dtype=_np.int64)
            counts = (offsets[1:] - offsets[:-1]).astype(_np.int64)
            ridx = _np.minimum(offsets[:-1], max(src.size - 1, 0))
            empty = counts == 0
            # salted hub block this stripe holds (src pmod == stripe id)
            hsrc = _np.frombuffer(
                row["hub_src_bin"], dtype=_np.int32 if row["hub_src32"] else _np.int64
            )
            hoff = _np.frombuffer(row["hub_offsets_bin"], dtype=_np.int64)
            if NH and hoff.size != NH + 1:
                hoff = _np.zeros(NH + 1, dtype=_np.int64)
            hridx = _np.minimum(hoff[:-1], max(hsrc.size - 1, 0)) if NH else None
            hempty = (hoff[1:] - hoff[:-1]) == 0 if NH else None
            own_cols = (
                _np.flatnonzero((hub_ids >= lo) & (hub_ids < hi)) if NH else None
            )
            own_offs = hub_ids[own_cols] - lo if NH else None
            stripes.append((lo, hi, src, ridx, empty, hsrc, hridx, hempty, own_cols, own_offs))

        # listen before registering so the ring can connect immediately
        lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        lsock.bind(("0.0.0.0", 0))
        lsock.listen(4)
        my_port = lsock.getsockname()[1]
        try:
            my_host = socket.gethostbyname(socket.gethostname())
        except OSError:
            my_host = "127.0.0.1"

        reg_sock = socket.create_connection(rdv_addr, timeout=120)
        _send_msg(
            reg_sock,
            pickle.dumps(
                {"pid": pid, "host": my_host, "port": my_port,
                 "ranges": [(lo, hi) for lo, hi, *_ in stripes]}
            ),
        )
        roster = pickle.loads(_recv_msg(reg_sock))
        reg_sock.close()
        P = len(roster)
        nxt_info = roster[(pid + 1) % P]
        # connect to next; accept from prev (ordering is deadlock-free:
        # every task does connect-then-accept against distinct peers)
        send_sock = None
        deadline = time.time() + 120
        while send_sock is None:
            try:
                send_sock = socket.create_connection(
                    (nxt_info["host"], nxt_info["port"]), timeout=5
                )
            except OSError:
                if time.time() > deadline:
                    raise
                time.sleep(0.05)
        lsock.settimeout(120)
        recv_sock, _ = lsock.accept()
        send_sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)

        # writer thread: breaks the all-blocked-in-sendall ring deadlock
        out_q: list = []
        out_cv = threading.Condition()
        done_flag = [False]

        def writer():
            while True:
                with out_cv:
                    while not out_q and not done_flag[0]:
                        out_cv.wait()
                    if not out_q and done_flag[0]:
                        return
                    payload = out_q.pop(0)
                _send_msg(send_sock, payload)

        wt = threading.Thread(target=writer, daemon=True)
        wt.start()

        def ring_send(payload: bytes) -> None:
            with out_cv:
                out_q.append(payload)
                out_cv.notify()

        deg = _np.asarray(bc_deg.value)
        r = _np.array(bc_r0.value)
        rdiv = r / deg
        step_times = []
        l = 0
        while l < MAXIT:
            t0 = time.time()
            # ---- ring phase A (hubs only): allreduce salted partials ----
            # every task computes its local hub-partial vector from the
            # salted hub blocks it holds, then the small NH-float vector
            # circulates once around the ring and everyone sums all P
            # contributions — hub homes then fold totals into their update
            hub_tot = None
            if NH:
                local_part = _np.zeros(NH)
                for st in stripes:
                    hsrc, hridx, hempty = st[5], st[6], st[7]
                    if hsrc.size:
                        part = _np.add.reduceat(rdiv[hsrc], hridx)
                        part[hempty] = 0.0
                        local_part += part
                hub_tot = local_part.copy()
                cur_h = pickle.dumps((pid, local_part.tobytes()))
                for _ in range(P - 1):
                    ring_send(cur_h)
                    cur_h = _recv_msg(recv_sock)
                    _bpid, pb = pickle.loads(cur_h)
                    hub_tot += _np.frombuffer(pb)
            my_slices = []
            el_local = 0.0
            for st in stripes:
                lo, hi, src, ridx, empty = st[0], st[1], st[2], st[3], st[4]
                own_cols, own_offs = st[8], st[9]
                width = hi - lo
                if src.size:
                    w = rdiv[src]
                    sums = _np.add.reduceat(w, ridx)
                    sums[empty] = 0.0
                else:
                    sums = _np.zeros(width)
                if NH and own_cols is not None and own_cols.size:
                    sums[own_offs] += hub_tot[own_cols]
                a = C0 + P_DAMP * sums
                eu = _np.abs(a - r[lo:hi])
                if width:
                    el_local = max(el_local, float(eu.max()))
                my_slices.append((lo, hi, a.tobytes()))
            block = pickle.dumps((pid, el_local, my_slices))
            el_max = el_local
            for lo, hi, ab in my_slices:
                a = _np.frombuffer(ab)
                r[lo:hi] = a
                rdiv[lo:hi] = a / deg[lo:hi]
            # ring allgather: P-1 forwarding steps
            cur = block
            for _ in range(P - 1):
                ring_send(cur)
                cur = _recv_msg(recv_sock)
                bpid, bel, bslices = pickle.loads(cur)
                el_max = max(el_max, bel)
                for lo, hi, ab in bslices:
                    a = _np.frombuffer(ab)
                    r[lo:hi] = a
                    rdiv[lo:hi] = a / deg[lo:hi]
            l += 1
            step_times.append(time.time() - t0)
            if el_max < TOL:
                break
        with out_cv:
            done_flag[0] = True
            out_cv.notify()
        wt.join(timeout=10)
        send_sock.close()
        recv_sock.close()
        lsock.close()
        yield (pid, l, step_times, [(lo, hi, r[lo:hi].tobytes()) for lo, hi, *_ in stripes])

    rows = packed.rdd.barrier().mapPartitions(loop).collect()
    if rdv.error is not None:  # pragma: no cover
        raise rdv.error
    ranks = np.full(N, C0)
    iters, steps = 0, []
    for pid, l, st, slices in rows:
        iters = max(iters, l)
        if pid == 0:
            steps = st
        for lo, hi, rb in slices:
            ranks[lo:hi] = np.frombuffer(rb)
    packed.unpersist()
    bc_deg.destroy()
    bc_r0.destroy()
    return PagerankResult(
        ranks, iters, time.time() - t_all, superstep_seconds=steps,
        state={"converged": iters < MAXIT, "exchange": "tcp-ring"},
    )
