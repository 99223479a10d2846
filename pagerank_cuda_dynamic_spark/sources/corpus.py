"""JSONL corpus reader/writer — the interchange format of LLM training
pipelines (one JSON document per line; the shape of Common Crawl derivatives,
RedPajama/Dolma shards, eval suites).

The engine's pipeline operators (dedup, text stats, sampling, packing) run
over the `documents` table schema ``(doc_id, text, lang, source, n_chars)``;
this module gets external JSONL corpora onto that schema without schema
inference (explicit StructType — inference is a full extra pass and is
layout-dependent), with malformed lines quarantined instead of killing the
scan, and with deterministic doc ids minted from content+position-free
hashing when the input carries none.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

__all__ = ["DOCUMENTS_SCHEMA", "read_jsonl_documents", "write_jsonl_documents"]

# The engine-wide documents shape (TESTDATA.md `documents` table).
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    text_field: str = "text",
    default_source: str | None = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSONL file(s)/dir/glob → documents DataFrame.

    * Explicit schema (no inference pass); extra JSON fields are ignored by
      construction — column pruning reaches the text scan.
    * Malformed lines — unparseable JSON OR valid JSON missing the text
      field — are dropped unless ``keep_corrupt`` (then returned with
      text=NULL and source='_corrupt' for quarantine routing — a 100 TB
      crawl ALWAYS has some; no record ever vanishes silently in
      quarantine mode).
    * Missing ``doc_id`` is minted as a deterministic 63-bit content hash
      (xxhash64 of text) — layout/partitioning-independent, unlike
      ``monotonically_increasing_id`` (collisions are exact-duplicate texts,
      which the dedup operators collapse anyway).
    * Missing ``n_chars`` is computed; missing ``source`` takes
      ``default_source`` (or the literal 'jsonl').
    """
    read_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField(text_field, T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    # text scan + from_json rather than spark.read.json: the corrupt record
    # becomes an ordinary struct field (the raw-JSON scan disallows queries
    # that reference only its internal corrupt column), and blank lines are
    # droppable before the parse.
    raw = (
        spark.read.text(path)
        .where(F.trim("value") != "")
        .select(
            F.from_json(
                F.col("value"),
                read_schema,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
            ).alias("j")
        )
        .select("j.*")
    )
    ok = raw.where(F.col("_corrupt_record").isNull()).where(
        F.col(text_field).isNotNull()
    )
    docs = ok.select(
        F.coalesce(
            F.col("doc_id"),
            F.abs(F.xxhash64(F.col(text_field))),
        ).alias("doc_id"),
        F.col(text_field).alias("text"),
        F.col("lang"),
        F.coalesce(F.col("source"), F.lit(default_source or "jsonl")).alias("source"),
        F.length(text_field).cast("long").alias("n_chars"),
    )
    if keep_corrupt:
        # quarantine BOTH failure modes: unparseable JSON and well-formed
        # records lacking the text field (which the clean path filters out)
        bad = raw.where(
            F.col("_corrupt_record").isNotNull() | F.col(text_field).isNull()
        ).select(
            F.coalesce(
                F.col("doc_id"),
                F.abs(F.xxhash64(F.coalesce(F.col("_corrupt_record"), F.lit("")))),
            ).alias("doc_id"),
            F.lit(None).cast("string").alias("text"),
            F.col("lang"),
            F.lit("_corrupt").alias("source"),
            F.lit(None).cast("long").alias("n_chars"),
        )
        docs = docs.unionByName(bad)
    return docs


def write_jsonl_documents(documents: DataFrame, path: str) -> None:
    """documents DataFrame → JSONL shard directory (one gz-less JSON object
    per line, one shard per partition — the layout downstream tokenizer
    pipelines consume in parallel)."""
    cols = [c for c in ("doc_id", "text", "lang", "source", "n_chars") if c in documents.columns]
    documents.select(*cols).write.mode("overwrite").json(path)
