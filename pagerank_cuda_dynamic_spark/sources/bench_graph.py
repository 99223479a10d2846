"""Dense-id transcript-topology graph generator for benchmarking.

Same graph family as derive_edges_from_transcripts (turn-adjacency chains
per conversation + tool-invocation + role-participation + conversation-root
edges) but vertex ids are computed arithmetically instead of via the string
entity dictionary, so multi-ten-million-edge benchmark graphs build in
seconds of pure JVM expression work.  The correctness path (strings →
row_number dictionary) stays covered by the oracle suite at sf scale; this
generator isolates the iteration engine for throughput measurement.

Id layout (dense-enough [0, n)): turn(c,t) = c·T_MAX + t (unused slots are
padding vertices that only carry their self-loop — documented, mass-
preserving); then tool ids, role ids, conv ids in reserved ranges above.

adjacency_hops k links turn t → t+1..t+k (k>1 raises edge density to make
per-task compute dominate fixed overheads at bench scale — the 100 TB
regime in miniature).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

T_MAX = 32
N_TOOLS = 8


def dense_transcript_graph(
    spark: SparkSession,
    n_conversations: int,
    adjacency_hops: int = 1,
    seed: int = 42,
    min_turns: int = 4,
    max_turns: int = 24,
    tool_rate: int = 3,
) -> tuple[DataFrame, int]:
    """Returns (edges(src,dst) DataFrame, n_vertices).  Deterministic."""
    assert max_turns <= T_MAX
    turn_space = n_conversations * T_MAX
    tool_base = turn_space
    role_base = tool_base + N_TOOLS
    conv_base = role_base + 2
    n = conv_base + n_conversations

    conv = (
        spark.range(n_conversations)
        .select(F.col("id").alias("c"))
        .withColumn(
            "n_turns",
            (
                F.lit(min_turns)
                + F.pmod(F.xxhash64(F.lit(seed), F.col("c")), F.lit(max_turns - min_turns + 1))
            ).cast("int"),
        )
    )
    turns = conv.select(
        "c", "n_turns",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("t"),
    )
    tid = (F.col("c") * T_MAX + F.col("t")).alias("src")

    parts = []
    for h in range(1, adjacency_hops + 1):
        parts.append(
            turns.where(F.col("t") + h <= F.col("n_turns") - 1).select(
                tid, (F.col("c") * T_MAX + F.col("t") + h).alias("dst")
            )
        )
    h_tool = F.xxhash64(F.lit(seed), F.col("c"), F.col("t"), F.lit("tool"))
    parts.append(
        turns.where(
            (F.pmod(F.col("t"), F.lit(2)) == 1) & (F.pmod(h_tool, F.lit(tool_rate)) == 0)
        ).select(tid, (F.lit(tool_base) + F.pmod(h_tool, F.lit(N_TOOLS))).alias("dst"))
    )
    parts.append(
        turns.select(tid, (F.lit(role_base) + F.pmod(F.col("t"), F.lit(2))).alias("dst"))
    )
    parts.append(
        turns.where(F.col("t") == 0).select(
            (F.lit(conv_base) + F.col("c")).alias("src"),
            (F.col("c") * T_MAX).alias("dst"),
        )
    )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    return edges.select(F.col("src").cast("long"), F.col("dst").cast("long")), n
