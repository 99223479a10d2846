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

Topic-mention edges (round 3): each turn mentions `mention_rate`-gated
topic entities drawn Zipf-ish over a topic space (u^zipf_a id transform →
in-degree density ∝ id^(1/zipf_a − 1)), giving the graph the power-law
in-degree head and out-degree variance of real link graphs.  Without them
the family is near-regular: uniform init is already ≈stationary, static
converges in ~30 iterations while warm starts need 50–80, and the dynamic
frontier economics invert relative to every real temporal graph the
reference benchmarks (main.sh:46–50 need 60–70 static iterations).  Topic
hubs hold rank through their self-loop only (no fan-out), so DF frontiers
stay sparse — the same reason hub-heavy web graphs don't blow up the
reference's frontier (pagerankCuda.hxx:96–117).
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
    topic_frac: int = 4,
    zipf_a: float = 2.5,
    mention_rate: int = 2,
) -> tuple[DataFrame, int]:
    """Returns (edges(src,dst) DataFrame, n_vertices).  Deterministic.

    topic_frac: |topics| = n_conversations // topic_frac (0 disables
    mention edges — the pre-round-3 near-regular family).
    zipf_a: mention-target skew (higher → heavier in-degree head).
    mention_rate: 1-in-`mention_rate` turns emit a mention edge.
    """
    assert max_turns <= T_MAX
    turn_space = n_conversations * T_MAX
    tool_base = turn_space
    role_base = tool_base + N_TOOLS
    conv_base = role_base + 2
    topic_base = conv_base + n_conversations
    n_topics = (n_conversations // topic_frac) if topic_frac else 0
    n = topic_base + n_topics

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
    if n_topics:
        h_m = F.xxhash64(F.lit(seed), F.col("c"), F.col("t"), F.lit("mention"))
        # uniform in [0,1) from the hash, then u^zipf_a concentrates ids at 0
        u = F.pmod(h_m, F.lit(1 << 30)).cast("double") / float(1 << 30)
        topic = F.least(
            F.floor(F.lit(float(n_topics)) * F.pow(u, F.lit(float(zipf_a)))).cast("long"),
            F.lit(n_topics - 1),
        )
        parts.append(
            turns.where(
                F.pmod(F.xxhash64(F.lit(seed), F.col("c"), F.col("t"), F.lit("mgate")),
                       F.lit(mention_rate)) == 0
            ).select(tid, (F.lit(topic_base) + topic).alias("dst"))
        )
        # topic-drift chain topic_j → topic_{j+1}: rank entering the Zipf
        # head cascades down a deep path, so static convergence is
        # wavefront-bound (≈60 iterations, like the reference's real
        # temporal graphs) instead of cancellation-accelerated; dynamic
        # perturbations stay local and sparse.
        parts.append(
            spark.range(n_topics - 1).select(
                (F.lit(topic_base) + F.col("id")).alias("src"),
                (F.lit(topic_base) + F.col("id") + 1).alias("dst"),
            )
        )
    edges = parts[0]
    for p in parts[1:]:
        edges = edges.unionByName(p)
    return edges.select(F.col("src").cast("long"), F.col("dst").cast("long")), n
