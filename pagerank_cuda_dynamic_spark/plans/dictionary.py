"""Deterministic dense vertex dictionary — entity string → id ∈ [0, N).

The reference remaps sparse vertex keys to dense device indices through an
unordered_map built from the key scan (pagerankCuda.hxx:765–775 `ksMap`,
csr.hxx:213–222).  Spark equivalent: row_number()-1 over *sorted* distinct
entities — deterministic across runs/parallelism (never
monotonically_increasing_id, which is partition-layout-dependent).

Scale note: row_number over a single global window is a test-scale
convenience (one-partition sort of |V| strings).  At 10^12 vertices the
documented scale path is zipWithIndex-style two-phase numbering: sort →
per-partition count → exclusive prefix-sum of counts broadcast back (see
assign_dense_ids_scaled) — same deterministic mapping, no single-task sort.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def build_vertex_dictionary(edges: DataFrame, src: str = "src_entity", dst: str = "dst_entity") -> DataFrame:
    """(v:long, entity:string), ids dense [0,N) over sorted distinct keys."""
    entities = (
        edges.select(F.col(src).alias("entity"))
        .unionByName(edges.select(F.col(dst).alias("entity")))
        .distinct()
    )
    w = Window.orderBy("entity")
    return entities.select((F.row_number().over(w) - 1).cast("long").alias("v"), "entity")


def assign_dense_ids_scaled(entities: DataFrame) -> DataFrame:
    """Scale path: range-partition by entity, number within partitions, add
    broadcast per-partition offsets.  Same output as build_vertex_dictionary
    (sorted-rank ids) without a global single-task window."""
    parts = entities.repartitionByRange(entities.sparkSession.sparkContext.defaultParallelism, "entity")
    with_pid = parts.select("entity", F.spark_partition_id().alias("pid"))
    counts = with_pid.groupBy("pid").count()
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select("pid", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("off"))
    w_local = Window.partitionBy("pid").orderBy("entity")
    return (
        with_pid.withColumn("local", F.row_number().over(w_local) - 1)
        .join(F.broadcast(offsets), "pid")
        .select((F.col("off") + F.col("local")).cast("long").alias("v"), "entity")
    )


def encode_edges(
    edges: DataFrame,
    dictionary: DataFrame,
    src: str = "src_entity",
    dst: str = "dst_entity",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Entity-keyed edges → dense (src:long, dst:long[, *keep]).

    Two broadcast-hash joins against the dictionary (it is small relative to
    the edge table; at true scale where |V| exceeds broadcast limits these
    become shuffle joins on the entity key — same plan, Catalyst picks).
    """
    src_map = dictionary.select(
        F.col("entity").alias("__src_ent"), F.col("v").alias("__src_id")
    )
    dst_map = dictionary.select(
        F.col("entity").alias("__dst_ent"), F.col("v").alias("__dst_id")
    )
    out = (
        edges.join(F.broadcast(src_map), F.col(src) == F.col("__src_ent"))
        .join(F.broadcast(dst_map), F.col(dst) == F.col("__dst_ent"))
    )
    return out.select(
        F.col("__src_id").alias("src"), F.col("__dst_id").alias("dst"), *keep
    )
