"""Materialization barrier for iterative DataFrame loops.

Spark 4's Dataset.checkpoint/localCheckpoint wraps the materialized RDD in
a LogicalRDD that PRESERVES the origin plan's statistics (sizeInBytes).
In an iterative loop whose state DF is rebuilt from the previous state via
joins, that preserved sizeInBytes multiplies through the join size
estimator every iteration, so its bit-length grows geometrically —
measured here: 1.2 MILLION decimal digits after 9 iterations of a
150-row PageRank state loop — and Catalyst ends up spending all its
planning time inside BigInteger.multiply (jstack: 60 s of
multiplyToomCook3).  Per-iteration wall time then explodes ~5× per
iteration even though the truncated plans and the data stay tiny.

materialize() runs the localCheckpoint (real data barrier), then re-wraps
the checkpointed RDD[InternalRow] via SparkSession.internalCreateDataFrame,
which builds a fresh LogicalRDD with the flat default size estimate — no
origin-stat inheritance, constant planning cost per iteration (measured:
0.4 s/iter flat over 30 iterations vs 113 s at iter 13 without).

The re-wrap touches two `private[sql]` JVM members (reachable from py4j —
Scala package-private is public bytecode); if a future Spark hides them,
the fallback is the plain checkpointed Dataset: still correct, just back
to inherited stats.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Per-vertex state frames (a score/label/register row per vertex) are
# broadcast into their gather joins while |V| stays under this bound,
# mirroring the reference's device-resident rank vector
# (pagerankCuda.hxx:676-692: edges stream, ranks sit in device memory).
# Without the hint a materialized state frame is a LogicalRDD whose
# default size estimate disables auto-broadcast, so iterative loops
# shuffle the FULL edge table every superstep once the edges outgrow
# the auto threshold.  Past the bound (state no longer executor-resident
# at reasonable memory) loops fall back to the shuffle join, which a
# cluster deployment pairs with a pre-partitioned edge table.
STATE_BROADCAST_MAX_ROWS = 8_000_000


def broadcast_state(state: DataFrame, n_rows: int) -> DataFrame:
    """Broadcast-hint a per-vertex state frame when its row count is
    executor-resident; identity (shuffle join) otherwise."""
    return F.broadcast(state) if n_rows <= STATE_BROADCAST_MAX_ROWS else state


def materialize(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint with plan statistics stripped — the barrier
    every iterative joinagg loop in this engine uses between supersteps."""
    spark = df.sparkSession
    jdf = df._jdf.localCheckpoint(True)
    try:
        jrdd = jdf.queryExecution().toRdd()
        njdf = spark._jsparkSession.internalCreateDataFrame(
            jrdd, jdf.schema(), False
        )
        return DataFrame(njdf, spark)
    except Exception:  # private-API fallback: correct, but stats inherit
        return DataFrame(jdf, spark)
