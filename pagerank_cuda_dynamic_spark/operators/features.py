"""GNN-style feature propagation over the link graph.

One propagation hop is the mean-aggregation layer of GraphSAGE /
simplified-GCN (SGC):  x'_v = mean{ x_u : u → v }  (optionally including
v's own features as one more "neighbor").  k hops of this — with no
nonlinearity — is exactly SGC's S^k X preprocessing, the standard way to
precompute GNN features for 100 TB-scale training without a training
loop.

Layout: features are held RELATIONALLY as (v, dim, val) rows, not
array columns.  One hop is then a single edge⋈feature shuffle join +
one (dst, dim)-keyed average — all JVM-side built-ins, no Python, and
hub skew spreads across the dim key for free.  The moved volume is
|E|·d values, which ANY implementation pays; the relational form lets
Catalyst/AQE handle it and gives the DuckDB oracle a 1:1 shape
(unnest WITH ORDINALITY).

`explode_features` / `collect_features` convert between the array-column
form (embeddings.parquet) and the relational form at the boundary.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..plans.barrier import broadcast_state, materialize


def explode_features(feats: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, array<float>) → relational (v, dim, val double); dim 0-based."""
    return feats.select(
        F.col(id_col).alias("v"),
        F.posexplode(vec_col).alias("dim", "val"),
    ).withColumn("val", F.col("val").cast("double"))


def collect_features(rel: DataFrame) -> DataFrame:
    """Relational (v, dim, val) → (v, array<double>) ordered by dim."""
    return rel.groupBy("v").agg(
        F.array_sort(
            F.collect_list(F.struct("dim", "val"))
        ).getField("val").alias("x")
    )


def propagate_features(
    edges: DataFrame,
    feats: DataFrame,
    hops: int = 1,
    include_self: bool = False,
) -> DataFrame:
    """k-hop mean propagation of relational features (v, dim, val) along
    edge direction src → dst.

    Per hop: x'_v = mean over {x_u : u→v} ∪ ({x_v} if include_self).
    Vertices with no in-edges (and include_self=False) drop out of the
    next hop — the operator propagates information, it does not invent
    it.  include_self=True is the GCN-renormalization analogue
    (self-loop added to every vertex) and keeps every featured vertex
    alive."""
    if hops < 0:
        raise ValueError("propagate_features: hops must be >= 0")
    e = edges.select("src", "dst").distinct()
    if include_self:
        verts = (
            e.select(F.col("src").alias("v"))
            .unionByName(e.select(F.col("dst").alias("v")))
            .distinct()
        )
        # distinct again: the input may already contain (v, v) edges, and
        # "∪ {x_v}" must weight self exactly once
        e = e.unionByName(
            verts.select(F.col("v").alias("src"), F.col("v").alias("dst"))
        ).distinct()
    e = e.persist()
    e.count()
    x = feats.select("v", "dim", "val")
    if hops > 0:
        x_rows = x.count()
    for _ in range(hops):
        x = _mean_hop(e, x, x_rows)
        x_rows = x.count()
    e.unpersist()
    return x


def _mean_hop(e_prepped: DataFrame, x: DataFrame, x_rows: int) -> DataFrame:
    """One in-neighbor mean hop over an already-deduped (and optionally
    self-looped) edge table — shared by propagate_features and
    fastrp_embeddings so edge prep (dedup/persist/count) runs once per
    OPERATOR, not once per hop.  The |V|·d-row feature table broadcasts
    into the edge join while executor-resident (real counts —
    materialized frames carry no usable size estimate), so the edge
    side keeps its partitioning across hops; past the bound this falls
    back to the |E|·d shuffle any implementation pays."""
    return (
        e_prepped.join(
            broadcast_state(x.withColumnRenamed("v", "src"), x_rows), "src"
        )
        .groupBy(F.col("dst").alias("v"), F.col("dim"))
        .agg(F.avg("val").alias("val"))
        .transform(materialize)
    )


def fastrp_embeddings(
    edges: DataFrame,
    dims: int = 8,
    weights: "tuple[float, ...]" = (0.5, 1.0),
    self_weight: float = 0.0,
    sparsity: int = 3,
    include_self: bool = True,
    normalize: bool = False,
    sign_hash=None,
) -> DataFrame:
    """FastRP node embeddings (Chen, Sui, Goyal & Rohrbach, CIKM 2019):
    very sparse random projection of the adjacency's hop powers,

        emb(v) = self_weight·R(v) + Σ_j weights[j] · (M^(j+1) R)(v),

    where R is the deterministic Achlioptas projection — entry (v, dim)
    is +√s / −√s with probability 1/(2s) each, 0 otherwise, decided by
    `sign_hash(v || ':' || dim) mod 2s` — and M is the in-neighbor mean
    operator (one `propagate_features` hop; include_self=True is the
    GCN-renormalization that keeps in-degree-0 vertices alive).  This
    is THE embedding algorithm that scales where walk-based skip-gram
    training does not: k relational hop joins, no training loop, no
    Python in the plan.

    Deterministic given the hash: reruns, repartitions and other
    engines agree value-for-value — `sign_hash` defaults to xxhash64,
    and a caller can pass an md5-derived column fn for cross-engine
    (DuckDB) replay, exactly like simhash_64's token_hash.

    Returns relational (v, dim, val) — `collect_features` packs arrays.
    `normalize=True` L2-normalizes each vertex row (zero rows stay 0).
    Scale shape: |V|·d state rows through the broadcast-state hop join;
    the |E|·d moved volume is the algorithm's floor.
    """
    if not weights:
        raise ValueError("fastrp_embeddings: weights must be non-empty")
    if self_weight == 0.0 and all(w == 0.0 for w in weights):
        raise ValueError(
            "fastrp_embeddings: all weights are zero — nothing to combine"
        )
    if dims < 1:
        raise ValueError("fastrp_embeddings: dims must be >= 1")
    if sparsity < 1:
        raise ValueError("fastrp_embeddings: sparsity must be >= 1")
    if sign_hash is None:
        sign_hash = F.xxhash64
    e = edges.select("src", "dst").distinct()
    verts = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    root = math.sqrt(float(sparsity))
    m = F.pmod(
        sign_hash(F.concat_ws(":", F.col("v").cast("string"), F.col("dim"))),
        F.lit(2 * sparsity),
    )
    r0 = verts.select(
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(dims - 1))).alias("dim"),
    ).select(
        "v",
        "dim",
        F.when(m == 0, F.lit(root))
        .when(m == 1, F.lit(-root))
        .otherwise(F.lit(0.0))
        .alias("val"),
    )
    # edge prep ONCE for all k hops: self-loops, dedup, persist (the
    # per-call prep inside propagate_features would re-dedup + re-persist
    # the same table k times — _mean_hop is the shared prepped-edge hop)
    if include_self:
        e = e.unionByName(
            verts.select(F.col("v").alias("src"), F.col("v").alias("dst"))
        ).distinct()
    e = e.persist()
    e.count()
    parts = []
    if self_weight != 0.0:
        parts.append(r0.select("v", "dim", (F.col("val") * F.lit(self_weight)).alias("val")))
    h = r0
    h_rows = h.count()
    for w in weights:
        h = _mean_hop(e, h, h_rows)
        h_rows = h.count()
        if w != 0.0:
            parts.append(h.select("v", "dim", (F.col("val") * F.lit(w)).alias("val")))
    # hop frames are materialized, so nothing downstream re-reads e
    e.unpersist()
    emb = parts[0]
    for p in parts[1:]:
        emb = emb.unionByName(p)
    emb = emb.groupBy("v", "dim").agg(F.sum("val").alias("val"))
    if normalize:
        from pyspark.sql import Window

        nrm = F.sqrt(F.sum(F.col("val") * F.col("val")).over(Window.partitionBy("v")))
        emb = emb.select(
            "v",
            "dim",
            F.when(nrm > 0, F.col("val") / nrm).otherwise(F.lit(0.0)).alias("val"),
        )
    return emb
