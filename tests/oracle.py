"""NumPy reference oracle — ≤40-line transliteration of the reference's
sync pull iteration (pagerank.hxx:132–141 update, 387–394 loop).  Ground
truth for every Spark PageRank test (main.cu:88 oracle pattern)."""

from __future__ import annotations

import numpy as np


def pagerank_numpy(
    n: int,
    src: np.ndarray,
    dst: np.ndarray,
    damping: float = 0.85,
    tolerance: float = 1e-10,
    max_iterations: int = 500,
    q: np.ndarray | None = None,
    dangling: str = "selfloop",
) -> tuple[np.ndarray, int]:
    """edges (src,dst) must already be deduped; in selfloop mode they must
    already include a self-loop on every vertex (main.cu:169)."""
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    safe = np.maximum(outdeg, 1.0)
    r = np.full(n, 1.0 / n) if q is None else np.asarray(q, dtype=np.float64).copy()
    C0 = (1.0 - damping) / n
    it = 0
    while it < max_iterations:
        contrib = np.bincount(dst, weights=r[src] / safe[src], minlength=n)
        a = C0 + damping * contrib
        if dangling == "redistribute":
            a += damping * r[outdeg == 0].sum() / n
        el = np.abs(a - r).max()
        r = a
        it += 1
        if el < tolerance:
            break
    return r, it


def add_self_loops_np(n: int, src: np.ndarray, dst: np.ndarray):
    """Universal self-loops + dedup, matching operators.graph.add_self_loops."""
    s = np.concatenate([np.asarray(src, np.int64), np.arange(n, dtype=np.int64)])
    d = np.concatenate([np.asarray(dst, np.int64), np.arange(n, dtype=np.int64)])
    pairs = np.unique(np.stack([s, d], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]
