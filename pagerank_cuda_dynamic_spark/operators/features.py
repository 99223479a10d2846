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
        # the |V|·d-row feature table broadcasts into the edge join while
        # executor-resident (real counts — materialized frames carry no
        # usable size estimate), so e keeps its partitioning across hops;
        # past the bound this falls back to the |E|·d shuffle any
        # implementation pays
        x = (
            e.join(broadcast_state(x.withColumnRenamed("v", "src"), x_rows), "src")
            .groupBy(F.col("dst").alias("v"), F.col("dim"))
            .agg(F.avg("val").alias("val"))
            .transform(materialize)
        )
        x_rows = x.count()
    e.unpersist()
    return x
