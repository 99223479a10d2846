"""Deterministic dense vertex dictionary — entity string → id ∈ [0, N).

The reference remaps sparse vertex keys to dense device indices through an
unordered_map built from the key scan (pagerankCuda.hxx:765–775 `ksMap`,
csr.hxx:213–222).  Spark equivalent: sorted-rank numbering of distinct
entities — deterministic across runs/parallelism (never
monotonically_increasing_id, which is partition-layout-dependent).

Numbering is ALWAYS the zipWithIndex-style two-phase scheme
(assign_dense_ids_scaled): range-partition by key → per-partition
row_number → broadcast exclusive prefix-sum of partition counts.  The ids
equal the global sorted rank regardless of where the range boundaries fall,
so the mapping is deterministic even though range sampling isn't — and no
single task ever sorts all |V| keys (10^12-vertex safe).  The same scheme
numbers temporal cursors (attach_global_seq)."""

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
    return assign_dense_ids_scaled(entities)


def assign_dense_ids_scaled(entities: DataFrame) -> DataFrame:
    """Two-phase numbering: range-partition by entity, number within
    partitions, add broadcast per-partition offsets.  Output ids = global
    sorted rank; no global single-task window.

    The range-partitioned snapshot is materialized ONCE (localCheckpoint):
    range boundary sampling is seeded per execution, so without pinning,
    the counts job and the numbering job could see different partitionings
    and produce inconsistent ids."""
    parts = entities.repartitionByRange(entities.sparkSession.sparkContext.defaultParallelism, "entity")
    with_pid = parts.select("entity", F.spark_partition_id().alias("pid")).localCheckpoint(eager=True)
    counts = with_pid.groupBy("pid").count()
    w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select("pid", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("off"))
    w_local = Window.partitionBy("pid").orderBy("entity")
    return (
        with_pid.withColumn("local", F.row_number().over(w_local) - 1)
        .join(F.broadcast(offsets), "pid")
        .select((F.col("off") + F.col("local")).cast("long").alias("v"), "entity")
    )


def attach_global_seq(df: DataFrame, order_cols: list[str], out_col: str = "seq") -> DataFrame:
    """Global 0-based arrival index under a total order, by the same
    two-phase scheme (range partition → local row_number → broadcast
    offsets).  Equals ROW_NUMBER() OVER (ORDER BY order_cols) - 1 when the
    order keys are unique, with no single-task global window.  Range
    partitioning keeps equal keys together, so ties never split across the
    offset boundary.  Materialized once (localCheckpoint) so the counts and
    numbering jobs share one set of sampled range boundaries."""
    p = df.sparkSession.sparkContext.defaultParallelism
    parts = df.repartitionByRange(p, *[F.col(c) for c in order_cols])
    with_pid = parts.withColumn("__pid", F.spark_partition_id()).localCheckpoint(eager=True)
    counts = with_pid.groupBy("__pid").count()
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__pid", F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("__off")
    )
    w_local = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("__local", F.row_number().over(w_local) - 1)
        .join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__local")).cast("long"))
        .drop("__pid", "__local", "__off")
    )


def encode_edges(
    edges: DataFrame,
    dictionary: DataFrame,
    src: str = "src_entity",
    dst: str = "dst_entity",
    keep: tuple[str, ...] = (),
    broadcast: bool = True,
) -> DataFrame:
    """Entity-keyed edges → dense (src:long, dst:long[, *keep]).

    Two hash joins against the dictionary; `broadcast=True` (default)
    hints the dictionary side — right whenever |V| fits the broadcast
    budget.  At 10^12 vertices pass broadcast=False: the joins become
    shuffle joins on the entity key (same plan shape, Catalyst/AQE picks
    the strategy from measured sizes)."""
    src_map = dictionary.select(
        F.col("entity").alias("__src_ent"), F.col("v").alias("__src_id")
    )
    dst_map = dictionary.select(
        F.col("entity").alias("__dst_ent"), F.col("v").alias("__dst_id")
    )
    if broadcast:
        src_map, dst_map = F.broadcast(src_map), F.broadcast(dst_map)
    out = (
        edges.join(src_map, F.col(src) == F.col("__src_ent"))
        .join(dst_map, F.col(dst) == F.col("__dst_ent"))
    )
    return out.select(
        F.col("__src_id").alias("src"), F.col("__dst_id").alias("dst"), *keep
    )
