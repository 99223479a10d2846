"""Edge derivation — raw tables → weightless digraph edge table.

Mirrors the reference's loader pipeline (snap.hxx:158–221: parse → vertex
range add → edge add → update/dedup) but source rows are relational tables,
not text lines, and "parse" is window functions + string expressions.

Three derivations:
  * transcripts → link graph (the BASELINE.json north-star input): vertices
    are turn / conversation / tool / role entities; edges are turn-adjacency
    (lead() under stable (conv_id, turn_idx) ordering), tool-invocation, and
    role-participation links.
  * TPC-H-ish testdata → entity graph (customer→part→supplier→nation→region)
    used by the driver's DuckDB-oracle correctness gate.
  * events → temporal transition graph with a monotone `seq` cursor — the
    analog of the reference's prefix-consumed temporal stream
    (snap.hxx:41–58, main.cu:83); batch slices are `seq` ranges.

All derivations are pure DataFrame plans: narrow ops + one window per
conversation/user partition; no Python row loop anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window


def derive_edges_from_transcripts(transcripts: DataFrame) -> DataFrame:
    """Transcript turns → entity edge list (entity-string keyed).

    Edge kinds (etype):
      adjacency : turn(conv,i) → turn(conv,i+1)      [lead() window]
      tool      : turn(conv,i) → tool:<name>         [tool IS NOT NULL]
      role      : turn(conv,i) → role:<name>         [hub entities — skew]
      conv      : conv:<id>    → turn(conv,0)        [conversation root]

    Returns (src_entity, dst_entity, etype, ts) deduplicated on
    (src_entity, dst_entity).  `ts` of an edge = ts of its source turn —
    the temporal cursor for batch slicing.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    turn_ent = F.concat_ws(":", F.lit("turn"), F.col("conv_id"), F.col("turn_idx"))
    next_ent = F.lead(turn_ent).over(w)

    base = transcripts.select(
        "conv_id", "turn_idx", "role", "tool", "ts",
        turn_ent.alias("turn_entity"),
        next_ent.alias("next_entity"),
    )

    adjacency = base.where(F.col("next_entity").isNotNull()).select(
        F.col("turn_entity").alias("src_entity"),
        F.col("next_entity").alias("dst_entity"),
        F.lit("adjacency").alias("etype"),
        "ts",
    )
    tool = base.where(F.col("tool").isNotNull()).select(
        F.col("turn_entity").alias("src_entity"),
        F.concat_ws(":", F.lit("tool"), F.col("tool")).alias("dst_entity"),
        F.lit("tool").alias("etype"),
        "ts",
    )
    role = base.select(
        F.col("turn_entity").alias("src_entity"),
        F.concat_ws(":", F.lit("role"), F.col("role")).alias("dst_entity"),
        F.lit("role").alias("etype"),
        "ts",
    )
    conv_root = base.where(F.col("turn_idx") == 0).select(
        F.concat_ws(":", F.lit("conv"), F.col("conv_id")).alias("src_entity"),
        F.col("turn_entity").alias("dst_entity"),
        F.lit("conv").alias("etype"),
        "ts",
    )
    edges = adjacency.unionByName(tool).unionByName(role).unionByName(conv_root)
    # dedup ≡ LazyBitset.update sort+unique (_bitset.hxx:285–289); keep the
    # earliest ts per (src,dst) so the temporal cursor is deterministic
    return edges.groupBy("src_entity", "dst_entity").agg(
        F.min("ts").alias("ts"), F.min("etype").alias("etype")
    )


def derive_entity_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-ish testdata → directed entity graph (entity-string keyed).

    customer→part (bought), part→supplier (supplied_by),
    supplier→nation, customer→nation, nation→region.
    Deduplicated on (src,dst).  Mirrored 1:1 by ENTITY_EDGES_SQL for the
    DuckDB oracle.
    """
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")

    bought = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
    )
    supplied = lineitem.select(
        F.concat(F.lit("p"), F.col("l_partkey")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("dst"),
    )
    supp_nat = supplier.select(
        F.concat(F.lit("s"), F.col("s_suppkey")).alias("src"),
        F.concat(F.lit("n"), F.col("s_nationkey")).alias("dst"),
    )
    cust_nat = customer.select(
        F.concat(F.lit("c"), F.col("c_custkey")).alias("src"),
        F.concat(F.lit("n"), F.col("c_nationkey")).alias("dst"),
    )
    nat_reg = nation.select(
        F.concat(F.lit("n"), F.col("n_nationkey")).alias("src"),
        F.concat(F.lit("r"), F.col("n_regionkey")).alias("dst"),
    )
    return (
        bought.unionByName(supplied)
        .unionByName(supp_nat)
        .unionByName(cust_nat)
        .unionByName(nat_reg)
        .distinct()
    )


# DuckDB mirror of derive_entity_edges — composed into every oracle query.
ENTITY_EDGES_SQL = """
SELECT DISTINCT 'c' || o_custkey AS src, 'p' || l_partkey AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
UNION
SELECT DISTINCT 'p' || l_partkey, 's' || l_suppkey FROM lineitem
UNION
SELECT DISTINCT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
UNION
SELECT DISTINCT 'c' || c_custkey, 'n' || c_nationkey FROM customer
UNION
SELECT DISTINCT 'n' || n_nationkey, 'r' || n_regionkey FROM nation
"""


def edges_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events → temporal transition graph with monotone seq cursor.

    Vertex = (user bucket, event_type) behavioral state; edge = observed
    transition between consecutive events of a user (ordered by ts,
    event_id).  `seq` = global arrival order of the transition — the analog
    of the reference's temporal line number (snap.hxx:41–53).  NOT deduped:
    batch slicing happens first (main.cu:83), tidy/dedup afterwards
    (batch.hxx:201–208).

    The `seq` cursor is numbered by the two-phase scheme (range partition →
    local row_number → broadcast offsets, plans.dictionary.attach_global_seq)
    — identical values to a global ROW_NUMBER() with no single-task window;
    the plan keeps `ts` so slicing predicates can also push down directly.
    """
    from pagerank_cuda_dynamic_spark.plans.dictionary import attach_global_seq

    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    state = F.concat(
        F.lit("u"), F.pmod(F.col("user_id"), F.lit(16)), F.lit(":"), F.col("event_type")
    )
    trans = (
        events.select(
            "user_id", "ts", "event_id",
            state.alias("dst"),
            F.lag(state).over(w).alias("src"),
        )
        .where(F.col("src").isNotNull())
    )
    return attach_global_seq(trans, ["ts", "event_id"]).select("src", "dst", "ts", "seq")


EVENT_EDGES_SQL = """
WITH trans AS (
  SELECT 'u' || (user_id % 16) || ':' || event_type AS dst,
         LAG('u' || (user_id % 16) || ':' || event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         ts, event_id
    FROM events
)
SELECT src, dst, ts,
       ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS seq
  FROM trans WHERE src IS NOT NULL
"""
