"""Deterministic random-walk corpus generation (DeepWalk / node2vec-p=q=1
style) — the standard way to turn a link graph into embedding training
sequences.

True RNG walks are irreproducible across cluster sizes and retries; this
operator derandomizes the next-step choice with a keyed hash argmin:

    next(walk, t) = argmin_{dst ∈ N(cur)} ( H(walk_id, t, dst, seed), dst )

H is a 60-bit hash.  For a fixed seed the walk corpus is a pure function
of the graph — independent of partitioning, task order, and retries
(the same property the engine's sampling/split operators guarantee,
sampling.py), and regeneratable incrementally.  Ties (astronomically
rare) break on dst, so the choice is total-ordered.

Each step is one frontier ⋈ edges shuffle + a walk_id-partitioned
window (rank-1 pick) — never a global window; walks that reach a sink
vertex simply end (their rows stop at the last visited step).

Default H is xxhash64 (JVM, fastest); pass `hash_fn=` a Column builder
for cross-engine reproducibility (the driver query uses the md5-derived
60-bit hash shared with the MinHash/SimHash oracles, dedup.py:530).
"""

from __future__ import annotations

from typing import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..plans.barrier import broadcast_state, materialize


def _default_hash(walk_id, step: int, dst, seed: int):
    return F.xxhash64(walk_id, F.lit(step), dst, F.lit(seed))


def md5_walk_hash(walk_id, step: int, dst, seed: int):
    """Cross-engine step hash: 60-bit md5 of 'walk_id#step#dst#seed'
    (first 15 hex chars parsed base-16 — same convention as the
    MinHash/SimHash oracle hash, dedup.py `_md5_hash64`).  Spark's
    conv(hex,16,10) and DuckDB's CAST('0x…' AS BIGINT) agree on it, so a
    walk corpus built with this hash is value-checkable in pure SQL."""
    s = F.concat_ws(
        "#",
        walk_id.cast("string"),
        F.lit(str(step)),
        dst.cast("string"),
        F.lit(str(seed)),
    )
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def sample_neighbors(
    edges: DataFrame,
    k: int,
    seed: int = 0,
    hash_fn: Callable | None = None,
) -> DataFrame:
    """GraphSAGE-style fanout sampling: keep ≤ k out-neighbors per
    vertex, chosen by the same keyed-hash argmin rule as the walks —
    rank dst by (H(src, dst, seed), dst) within each src and keep the
    first k.  Deterministic across partitioning / retries / cluster
    size, and incremental: an edge batch can be re-sampled without
    touching untouched vertices.

    One src-partitioned rank-k window over the (deduped) edge table —
    never a global window; hubs cost O(d log d) locally and emit k rows.
    Returns (src, dst, pos) with pos = 1‥k sample order."""
    if k < 1:
        raise ValueError("sample_neighbors: k must be >= 1")
    h = hash_fn or (lambda s, t, d, sd: F.xxhash64(s, d, F.lit(sd)))
    e = edges.select("src", "dst").distinct()
    w = Window.partitionBy("src").orderBy("h", "dst")
    return (
        e.select("src", "dst", h(F.col("src"), 0, F.col("dst"), seed).alias("h"))
        .withColumn("pos", F.row_number().over(w))
        .where(F.col("pos") <= k)
        .select("src", "dst", "pos")
    )


def deterministic_walks(
    edges: DataFrame,
    starts: DataFrame,
    steps: int = 8,
    seed: int = 0,
    hash_fn: Callable | None = None,
) -> DataFrame:
    """One walk per start vertex (walk_id = the start key).  Returns
    (walk_id, step, v) with step 0 = the start; a walk ends early at the
    first vertex with no out-edges.  `starts`: 1-column DataFrame of
    start vertices."""
    if steps < 0:
        raise ValueError("deterministic_walks: steps must be >= 0")
    h = hash_fn or _default_hash
    e = edges.select("src", "dst").distinct().persist()
    e.count()
    cur = (
        starts.toDF("v")
        .distinct()
        .select(F.col("v").alias("walk_id"), F.col("v"))
        .transform(materialize)
    )
    cur_rows = cur.count()
    out = cur.select("walk_id", F.lit(0).alias("step"), "v")
    for t in range(1, steps + 1):
        # the <=|starts|-row frontier broadcasts into the edge join while
        # executor-resident (materialized frames have no size estimate),
        # so e keeps its partitioning across steps
        cand = e.join(
            broadcast_state(cur.withColumnRenamed("v", "src"), cur_rows), "src"
        ).select(
            "walk_id",
            F.col("dst").alias("v"),
            h(F.col("walk_id"), t, F.col("dst"), seed).alias("h"),
        )
        w = Window.partitionBy("walk_id").orderBy("h", "v")
        cur = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("walk_id", "v")
            .transform(materialize)
        )
        cur_rows = cur.count()
        if cur_rows == 0:
            break
        out = out.union(cur.select("walk_id", F.lit(t).alias("step"), "v"))
    out = out.transform(materialize)
    e.unpersist()
    return out


def negative_samples(
    edges: DataFrame,
    n_vertices: int,
    k: int = 3,
    attempts: int = 8,
) -> DataFrame:
    """Deterministic negative-edge sampling — the link-prediction / GNN
    training companion of sample_neighbors: for every distinct source,
    up to `k` candidate destinations that are NOT out-neighbors, drawn
    from the fixed integer probe sequence over dense vertex ids [0, n):

        cand(src, j) = (src·2654435761 + j·40503 + 12345) mod n,  j < attempts

    (the sampling family's Weyl/Knuth mix — a pure function of
    (src, j), so the sample is layout / rerun / cluster-size invariant
    and a SQL oracle recomputes it verbatim).  Self-candidates and true
    edges are rejected; the first k surviving attempts (by attempt
    index) are kept.  A source whose probes all collide with real
    neighbors returns fewer than k rows — raise `attempts` for dense
    sources; the expected shortfall is (d/n)^attempts per source.

    Plan shape: |sources|·attempts candidate rows from one explode, one
    broadcast-or-shuffle anti-join against the edge set, one
    src-partitioned ≤attempts-row window — no RNG, no driver state.
    Returns (src, dst, attempt:int).  Requires dense long ids (J4
    dictionary); overflow-safe for n_vertices·2654435761 < 2^63.
    """
    if k < 1 or attempts < k:
        raise ValueError("negative_samples: need attempts >= k >= 1")
    e = edges.select("src", "dst").distinct()
    srcs = e.select("src").distinct()
    cand = srcs.select(
        "src",
        F.explode(F.sequence(F.lit(0), F.lit(attempts - 1))).alias("j"),
    ).select(
        "src",
        "j",
        F.pmod(
            F.col("src") * F.lit(2654435761) + F.col("j") * F.lit(40503) + F.lit(12345),
            F.lit(n_vertices),
        ).alias("dst"),
    )
    surv = (
        cand.where(F.col("dst") != F.col("src"))
        .join(e, ["src", "dst"], "left_anti")
    )
    w = Window.partitionBy("src").orderBy("j")
    return (
        surv.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("src", "dst", F.col("j").cast("int").alias("attempt"))
    )
