"""Deterministic synthetic transcript table (BASELINE.json `input_hint`).

Schema: (conv_id:string, turn_idx:int, role:string, text:string,
tool:string, ts:timestamp).

Every column is a pure function of (seed, conv_id, turn_idx) computed with
built-in Spark expressions (xxhash64 as the PRNG) — regenerating at any
parallelism yields an identical table, which is the per-row invariant the
north rule checks ("per-turn text equality under stable turn ordering").

This replaces the reference's SNAP temporal text files (snap.hxx:41–58,
main.sh:46–50) as the raw source; the stream *position* cursor of
readTemporalDo becomes the monotone (ts, conv_id, turn_idx) ordering.

Scale posture: generation is `spark.range(n_conv)` → explode(sequence) —
embarrassingly parallel, no shuffle, no Python row loop; at 10^12 turns the
same plan runs with more range partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ROLES = ["user", "assistant"]
TOOLS = ["bash", "search", "read", "edit", "browser", "sql", "python", "fetch"]
WORDS = [
    "graph", "rank", "edge", "vertex", "batch", "frontier", "prune",
    "update", "converge", "shuffle", "partition", "spark", "kernel",
    "gather", "scatter", "delta", "stream", "tool", "agent", "turn",
]


def _h(*cols, seed: int) -> F.Column:
    """Deterministic 64-bit hash of the given columns + seed (the PRNG)."""
    return F.xxhash64(F.lit(seed), *cols)


def synthesize_transcripts(
    spark: SparkSession,
    n_conversations: int = 200,
    seed: int = 42,
    min_turns: int = 4,
    max_turns: int = 24,
    tool_rate: int = 3,
) -> DataFrame:
    """Build the transcript DataFrame; ~n_conversations*(min+max)/2 turns.

    tool_rate: an assistant turn carries a tool call when h % tool_rate == 0.
    """
    conv = (
        spark.range(n_conversations)
        .select(F.format_string("conv_%08d", F.col("id")).alias("conv_id"))
        .withColumn(
            "n_turns",
            (
                F.lit(min_turns)
                + F.pmod(_h(F.col("conv_id"), seed=seed), F.lit(max_turns - min_turns + 1))
            ).cast("int"),
        )
    )
    turns = conv.select(
        "conv_id",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    ).withColumn("turn_idx", F.col("turn_idx").cast("int"))

    h_role = _h(F.col("conv_id"), F.col("turn_idx"), F.lit("role"), seed=seed)
    h_tool = _h(F.col("conv_id"), F.col("turn_idx"), F.lit("tool"), seed=seed)
    h_text = _h(F.col("conv_id"), F.col("turn_idx"), F.lit("text"), seed=seed)

    roles_arr = F.array(*[F.lit(r) for r in ROLES])
    tools_arr = F.array(*[F.lit(t) for t in TOOLS])
    words_arr = F.array(*[F.lit(w) for w in WORDS])

    out = (
        turns
        # strict user/assistant alternation, user first — gives the
        # turn-adjacency graph a deterministic bipartite-ish backbone
        .withColumn("role", F.element_at(roles_arr, F.pmod(F.col("turn_idx"), F.lit(2)).cast("int") + 1))
        .withColumn(
            "tool",
            F.when(
                (F.col("role") == "assistant") & (F.pmod(h_tool, F.lit(tool_rate)) == 0),
                F.element_at(tools_arr, (F.pmod(h_tool, F.lit(len(TOOLS)))).cast("int") + 1),
            ).otherwise(F.lit(None).cast("string")),
        )
        .withColumn(
            "text",
            F.concat_ws(
                " ",
                F.element_at(words_arr, (F.pmod(h_text, F.lit(len(WORDS)))).cast("int") + 1),
                F.element_at(words_arr, (F.pmod(h_text + 7, F.lit(len(WORDS)))).cast("int") + 1),
                F.element_at(words_arr, (F.pmod(h_text + 13, F.lit(len(WORDS)))).cast("int") + 1),
                F.format_string("t%02d", F.col("turn_idx")),
                F.col("conv_id"),
            ),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200)  # 2024-01-01T00:00:00Z
                + F.pmod(_h(F.col("conv_id"), F.lit("t0"), seed=seed), F.lit(86400 * 30))
                + F.col("turn_idx").cast("long") * (5 + F.pmod(h_role, F.lit(55)))
            ),
        )
        # unused hash column for role kept only as the ts jitter above
        .select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    )
    return out


def write_transcripts(df: DataFrame, path: str) -> None:
    """Parquet snapshot-dir layout (Iceberg-jar-free fallback; same contract:
    immutable snapshot per write, partitioned for conversation pruning)."""
    df.repartition(8, "conv_id").write.mode("overwrite").parquet(path)


def read_transcripts(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TRANSCRIPT_SCHEMA).parquet(path)
