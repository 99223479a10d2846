"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: static PageRank over the entity graph derived
                from the sf0.001 tables; returns top-ranked entities.
queries()     — one entry per implemented operator (SURVEY.md §2), each
                (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-runnable ANSI SQL equivalents (same column names,
                aggregates aliased identically).  Iterative/graph-kernel
                ops that SQL can't express are present in queries() only
                (driver records rows-only checks for those).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from pagerank_cuda_dynamic_spark.sources.edges import (
    ENTITY_EDGES_SQL,
    derive_entity_edges,
    edges_from_events,
)
from pagerank_cuda_dynamic_spark.plans.dictionary import build_vertex_dictionary, encode_edges
from pagerank_cuda_dynamic_spark.plans.graph_snapshot import GraphSnapshot
from pagerank_cuda_dynamic_spark.operators.graph import tidy_batch as _tidy
from pagerank_cuda_dynamic_spark.operators.pagerank import (
    PagerankOptions,
    pagerank_static,
)
from pagerank_cuda_dynamic_spark.operators.components import (
    connected_components_joinagg,
    label_propagation_joinagg,
    triangle_count as _tri,
)
from pagerank_cuda_dynamic_spark.operators.dedup import (
    TOKEN_RE,
    dedup_clusters,
    dedup_exact,
    exact_duplicates,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from pagerank_cuda_dynamic_spark.operators.similarity import (
    brute_force_topk,
    pairwise_cosine_sql,
)
from pagerank_cuda_dynamic_spark.operators.text import (
    BPE_ISH_RE,
    PII_PATTERNS,
    STOPWORDS,
    chunk_documents,
    fingerprints,
    language_id,
    quality_score,
    text_scrub,
    token_stats,
)

DAMPING = 0.85


# ---------------------------------------------------------------------------
# shared plan builders
# ---------------------------------------------------------------------------

def _tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}


def _entity_graph(spark: SparkSession, sf_dir: str):
    """Entity edges (strings) → dense snapshot + dictionary.

    The derivation is materialized ONCE up front: the dictionary's vertex
    union reads it twice and encode_edges a third time, so the lazy frame
    re-ran the orders x lineitem join + distinct three times per query."""
    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    e = materialize(derive_entity_edges(spark, sf_dir))
    d = build_vertex_dictionary(e, src="src", dst="dst").persist()
    n = d.count()
    g = GraphSnapshot.build(encode_edges(e, d, src="src", dst="dst"), n=n)
    return g, d, n


def _ranks_as_entities(spark, g, d, ranks: np.ndarray) -> DataFrame:
    pdf = pd.DataFrame({"v": np.arange(len(ranks), dtype=np.int64), "rank": ranks})
    rdf = spark.createDataFrame(pdf)
    return rdf.join(d, "v").select(F.col("entity"), F.round("rank", 6).alias("rank"))


def _pagerank_k(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    g, d, n = _entity_graph(spark, sf_dir)
    opts = PagerankOptions(tolerance=0.0, max_iterations=k)
    res = pagerank_static(g, opts)
    out = _ranks_as_entities(spark, g, d, res.ranks)
    return out


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


# ---------------------------------------------------------------------------
# entry
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: converged static PageRank (α=0.85, L∞<1e-10, universal
    self-loops) over the sf0.001 entity graph; top 50 entities by rank."""
    sf_dir = "/root/testdata/sf0.001"
    g, d, n = _entity_graph(spark, sf_dir)
    res = pagerank_static(g, PagerankOptions())
    out = (
        _ranks_as_entities(spark, g, d, res.ranks)
        .orderBy(F.desc("rank"), F.asc("entity"))
        .limit(50)
    )
    return out


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def q_entity_edges(spark, sf_dir):
    return derive_entity_edges(spark, sf_dir)


def q_temporal_edges(spark, sf_dir):
    return edges_from_events(spark, sf_dir).select("src", "dst", "seq")


def q_out_degrees(spark, sf_dir):
    e = derive_entity_edges(spark, sf_dir)
    return e.groupBy(F.col("src").alias("entity")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )


def q_in_degrees(spark, sf_dir):
    e = derive_entity_edges(spark, sf_dir)
    return e.groupBy(F.col("dst").alias("entity")).agg(
        F.count(F.lit(1)).alias("indeg")
    )


def q_graph_summary(spark, sf_dir):
    """(n_vertices, n_edges_raw, n_edges_selflooped, n_selfloops) — one
    declarative plan (cross join of single-row aggs), not four driver-side
    .count() actions."""
    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    e = materialize(derive_entity_edges(spark, sf_dir))  # read 4x below
    verts = e.select(F.col("src").alias("v")).unionByName(
        e.select(F.col("dst").alias("v"))
    ).distinct()
    loops = verts.select(F.col("v").alias("src"), F.col("v").alias("dst"))
    sl = e.unionByName(loops).distinct()
    v_agg = verts.agg(F.count(F.lit(1)).alias("n_vertices"))
    e_agg = e.agg(F.count(F.lit(1)).alias("n_edges_raw"))
    sl_agg = sl.agg(
        F.count(F.lit(1)).alias("n_edges_selflooped"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("n_selfloops"),
    )
    return v_agg.crossJoin(e_agg).crossJoin(sl_agg)


def q_transpose(spark, sf_dir):
    e = derive_entity_edges(spark, sf_dir)
    from pagerank_cuda_dynamic_spark.operators.graph import transpose

    return transpose(e)


def q_symmetrize(spark, sf_dir):
    e = derive_entity_edges(spark, sf_dir)
    from pagerank_cuda_dynamic_spark.operators.graph import symmetrize

    return symmetrize(e)


def q_tidy_batch(spark, sf_dir):
    """Temporal split: first 90% of transitions = base graph; rest =
    insertion batch; deletions = base rows with seq%13==0 (deterministic).
    Output (op, src, dst) after tidy (semi/anti existence filters)."""
    et = edges_from_events(spark, sf_dir)
    total = et.count()
    cut = int(0.9 * total)
    base = et.where(F.col("seq") < cut).select("src", "dst").distinct()
    ins_raw = et.where(F.col("seq") >= cut).select("src", "dst").distinct()
    del_raw = et.where((F.col("seq") < cut) & (F.col("seq") % 13 == 0)).select(
        "src", "dst"
    ).distinct()
    dels, ins = _tidy(base, del_raw, ins_raw)
    return dels.withColumn("op", F.lit("del")).unionByName(
        ins.withColumn("op", F.lit("ins"))
    ).select("op", "src", "dst")


def q_apply_batch_count(spark, sf_dir):
    et = edges_from_events(spark, sf_dir)
    total = et.count()
    cut = int(0.9 * total)
    base = et.where(F.col("seq") < cut).select("src", "dst").distinct()
    ins_raw = et.where(F.col("seq") >= cut).select("src", "dst").distinct()
    del_raw = et.where((F.col("seq") < cut) & (F.col("seq") % 13 == 0)).select(
        "src", "dst"
    ).distinct()
    dels, ins = _tidy(base, del_raw, ins_raw)
    from pagerank_cuda_dynamic_spark.operators.graph import apply_batch

    after = apply_batch(base, dels, ins)
    return after.agg(F.count(F.lit(1)).alias("n_edges_after"))


def q_pagerank_1iter(spark, sf_dir):
    return _pagerank_k(spark, sf_dir, 1)


def q_pagerank_20iters(spark, sf_dir):
    return _pagerank_k(spark, sf_dir, 20)


def q_pagerank_top20(spark, sf_dir):
    return (
        _pagerank_k(spark, sf_dir, 20)
        .orderBy(F.desc("rank"), F.asc("entity"))
        .limit(20)
    )


def q_pagerank_converged(spark, sf_dir):
    """Full static PR to 1e-10 L∞ (iterative — no SQL oracle; validated by
    pytest NumPy oracle instead)."""
    g, d, n = _entity_graph(spark, sf_dir)
    res = pagerank_static(g, PagerankOptions())
    return _ranks_as_entities(spark, g, d, res.ranks)


def q_triangles(spark, sf_dir):
    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    e = materialize(derive_entity_edges(spark, sf_dir))  # read 3x below
    d = build_vertex_dictionary(e, src="src", dst="dst")
    enc = encode_edges(e, d, src="src", dst="dst")
    return _tri(enc)


def q_connected_components(spark, sf_dir):
    """CC over the temporal transition graph (entity-string labeled:
    component = lexicographically smallest member entity)."""
    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    d = build_vertex_dictionary(et, src="src", dst="dst").persist()
    n = d.count()
    enc = encode_edges(et, d, src="src", dst="dst")
    # dense ids are sorted-entity ranks → min dense id ≡ min entity string.
    # Routed through the fully distributed min-label loop (labels never on
    # the driver); parity with connected_components_np is pytest-checked.
    cdf = connected_components_joinagg(enc, n).withColumnRenamed("component", "cid")
    return (
        cdf.join(d, "v")
        .join(
            d.withColumnRenamed("v", "cid").withColumnRenamed("entity", "component"),
            "cid",
        )
        .select(F.col("entity").alias("v"), "component")
    )


def q_cc_sizes(spark, sf_dir):
    return (
        q_connected_components(spark, sf_dir)
        .groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
    )


def q_lpa(spark, sf_dir):
    """Label propagation communities (10 synchronous rounds, deterministic
    min-label tie-break) — value-checked against an unrolled SQL oracle."""
    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    d = build_vertex_dictionary(et, src="src", dst="dst").persist()
    n = d.count()
    enc = encode_edges(et, d, src="src", dst="dst")
    # distributed sync-LPA (same deterministic tie-break as the np kernel)
    cdf = label_propagation_joinagg(enc, n, max_rounds=10).withColumnRenamed(
        "label", "lid"
    )
    return (
        cdf.join(d, "v")
        .join(d.withColumnRenamed("v", "lid").withColumnRenamed("entity", "label"), "lid")
        .select(F.col("entity").alias("v"), "label")
    )


def q_subgraph_filter(spark, sf_dir):
    """P4 duplicateIfW analog: filtered subgraph projection (customer→part
    edges only)."""
    e = derive_entity_edges(spark, sf_dir)
    return e.where(F.col("src").startswith("c") & F.col("dst").startswith("p"))


def q_degree_histogram(spark, sf_dir):
    e = derive_entity_edges(spark, sf_dir)
    return (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("outdeg"))
        .groupBy("outdeg")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )


def q_l1_norm_1iter(spark, sf_dir):
    """A3 l1NormDelta analog: L1 distance between 1-iteration ranks and the
    uniform init."""
    ranks = _pagerank_k(spark, sf_dir, 1)
    nn = ranks.count()
    return ranks.agg(
        F.round(F.sum(F.abs(F.col("rank") - F.lit(1.0 / nn))), 6).alias("l1")
    )


def q_l2_norm_1iter(spark, sf_dir):
    """A4 l2Norm delta analog (reference inc/_vector.hxx:975 l2Norm): L2
    distance between 1-iteration ranks and the uniform init.  Same shape as
    the L1 query — one declarative agg over the rank vector."""
    ranks = _pagerank_k(spark, sf_dir, 1)
    nn = ranks.count()
    return ranks.agg(
        F.round(
            F.sqrt(F.sum(F.pow(F.col("rank") - F.lit(1.0 / nn), F.lit(2.0)))), 6
        ).alias("l2")
    )


def q_bfs_reachable(spark, sf_dir):
    """G6 multi-source BFS closure: entities reachable from customer c1."""
    from pagerank_cuda_dynamic_spark.operators.graph import bfs_reachable

    from pagerank_cuda_dynamic_spark.plans.barrier import materialize

    e = materialize(derive_entity_edges(spark, sf_dir))  # read 3x below
    d = build_vertex_dictionary(e, src="src", dst="dst").persist()
    enc = encode_edges(e, d, src="src", dst="dst")
    seed_ids = d.where(F.col("entity") == "c1").select(F.col("v"))
    visited = bfs_reachable(enc, seed_ids)
    return visited.join(d, "v").select(F.col("entity").alias("v"))


def q_modularity_cc(spark, sf_dir):
    """A11 modularity of the CC membership on the events transition graph."""
    from pagerank_cuda_dynamic_spark.operators.components import modularity

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    d = build_vertex_dictionary(et, src="src", dst="dst").persist()
    n = d.count()
    enc = encode_edges(et, d, src="src", dst="dst")
    # membership from the fully distributed CC loop (same routing as the
    # live connected_components query; labels never on the driver)
    memb = connected_components_joinagg(enc, n).withColumnRenamed(
        "component", "community"
    )
    out = modularity(enc, memb)
    return out.select(F.round(F.col("modularity"), 6).alias("modularity"))


def q_dedup_exact(spark, sf_dir):
    return exact_duplicates(_docs(spark, sf_dir))


def q_dedup_exact_injected(spark, sf_dir):
    """Exact dedup with guaranteed duplicates: the documents table unioned
    with an id-shifted copy of itself — every text now has exactly one
    duplicate, so the keeper/min-id/count semantics get real evidence."""
    return exact_duplicates(_injected_docs(spark, sf_dir))


def q_fingerprints(spark, sf_dir):
    return fingerprints(_docs(spark, sf_dir))


def q_token_stats(spark, sf_dir):
    return token_stats(_docs(spark, sf_dir))


def q_quality(spark, sf_dir):
    return quality_score(_docs(spark, sf_dir))


def q_language_id(spark, sf_dir):
    return language_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


def q_decontamination(spark, sf_dir):
    """Benchmark decontamination flags: docs 0..19 play the held-out eval
    set; the training corpus is docs 20+ UNIONed with id-shifted copies of
    the eval docs (guaranteed contamination, containment 1.0).  Flags =
    (train_id, eval_id, containment ≥ 0.5) — operators/dedup.
    contamination_flags (containment of the EVAL doc's shingle set, the
    decontamination metric, not Jaccard)."""
    from pagerank_cuda_dynamic_spark.operators.dedup import contamination_flags

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    heldout = docs.where(F.col("doc_id") < 20)
    train = docs.where(F.col("doc_id") >= 20).unionByName(
        heldout.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return contamination_flags(train, heldout, threshold=0.5)


def q_stratified_sample(spark, sf_dir):
    """Deterministic training-mix sampling: keep all en, 30% of de, none
    of the rest — kept rows are a pure function of doc_id (reruns and
    repartitions agree row-for-row; operators/sampling)."""
    from pagerank_cuda_dynamic_spark.operators.sampling import stratified_sample

    docs = _docs(spark, sf_dir)
    return stratified_sample(docs, {"en": 1.0, "de": 0.3}, strata_col="lang").select(
        "doc_id", "lang"
    )


def q_split_corpus(spark, sf_dir):
    """Deterministic train/val/test split assignment (10%/10%/80%) keyed
    on the same id mixer — no doc can leak between splits across reruns."""
    from pagerank_cuda_dynamic_spark.operators.sampling import split_corpus

    docs = _docs(spark, sf_dir)
    return split_corpus(docs, val_fraction=0.1, test_fraction=0.1).select(
        "doc_id", "split"
    )


_SPAM_TEXT = "buy now buy now buy now buy now buy now buy now"


def q_tfidf_keywords(spark, sf_dir):
    """Top-5 TF-IDF keywords per document (operators/text.tfidf_keywords):
    explode → tf/df aggs → per-doc window top-k."""
    from pagerank_cuda_dynamic_spark.operators.text import tfidf_keywords

    return tfidf_keywords(_docs(spark, sf_dir), top_k=5)


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for training: docs salted into 8 shards, packed
    into 512-token budgets by running cumsum within each shard
    (operators/text.pack_sequences)."""
    from pagerank_cuda_dynamic_spark.operators.text import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), token_budget=512, n_shards=8)


def q_repetition_stats(spark, sf_dir):
    """Gopher-style within-doc repetition metrics over documents plus one
    injected spam doc (id 999999) so the boilerplate gates have real
    evidence (operators/text.repetition_stats)."""
    from pagerank_cuda_dynamic_spark.operators.text import repetition_stats

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    aug = docs.unionByName(
        spark.createDataFrame(
            pd.DataFrame({"doc_id": [999999], "text": [_SPAM_TEXT]})
        )
    )
    return repetition_stats(aug)


def q_text_scrub(spark, sf_dir):
    """PII scrub over documents with injected synthetic PII (one email +
    one IPv4 per doc — the synthetic corpus contains none, so redaction
    gets real evidence).  Pure JVM regexp chain (operators/text.text_scrub)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" mail user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com ip 10.0.0."),
            (F.col("doc_id") % 256).cast("string"),
        ).alias("text"),
    )
    return text_scrub(docs)


def q_doc_chunks(spark, sf_dir):
    """Context-window packing: 32-token chunks advancing by 24 (8-token
    overlap) — the training-example explode (operators/text.chunk_documents)."""
    return chunk_documents(_docs(spark, sf_dir), chunk_size=32, overlap=8)


def q_ngram_jaccard(spark, sf_dir):
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(docs, threshold=0.5).select("id_a", "id_b", "jaccard")


def _injected_docs(spark, sf_dir, limit: int | None = None):
    """documents ∪ id-shifted copy — guaranteed duplicates for dedup
    evidence (every text appears exactly twice, keeper = original id)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    if limit is not None:
        d = d.where(F.col("doc_id") < limit)
    shifted = d.select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return d.unionByName(shifted)


def q_dedup_clusters(spark, sf_dir):
    """Near-dup CLUSTERING: exact n-gram Jaccard pairs ≥ 0.5 over the
    dup-injected corpus → transitive closure via the distributed min-label
    CC loop → (doc_id, keeper_id).  Value-checked against a recursive-CTE
    closure oracle; chains A~B~C collapse to one keeper."""
    docs = _injected_docs(spark, sf_dir, limit=200)
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup_clusters(pairs)


def q_corpus_filter(spark, sf_dir):
    """End-to-end training-data filter pipeline: exact dedup (keeper only)
    → language-ID → quality score → keep en docs with quality ≥ 0.35.
    One declarative plan over the dup-injected corpus."""
    docs = _injected_docs(spark, sf_dir)
    kept = dedup_exact(docs)
    lang = language_id(kept).select("doc_id", "lang_pred")
    qual = quality_score(kept)
    return (
        kept.join(lang, "doc_id")
        .join(qual, "doc_id")
        .where((F.col("lang_pred") == "en") & (F.col("quality") >= 0.35))
        .select("doc_id", "lang_pred", "quality")
    )


def _md5_hash64(col):
    """Cross-engine 60-bit token hash: first 15 hex chars of md5 parsed as
    an integer.  Spark's conv(hex,16,10) and DuckDB's CAST('0x…') agree
    exactly, so operators built on this hash get FULL value oracles; the
    production default stays xxhash64 (cheaper, 64-bit)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _md5_seeded_hash64(s, j: int):
    """Seeded variant for minhash signature rows: md5('<j>#' || shingle)."""
    return _md5_hash64(F.concat(F.lit(f"{j}#"), s))


def q_minhash_candidates(spark, sf_dir):
    """MinHash LSH candidate pairs over the md5-derived cross-engine hash:
    the ENTIRE pipeline (shingle → 32 seeded minhashes → 8 banded bucket
    joins → distinct pairs) is value-checked against a DuckDB
    reimplementation.  The banding machinery is identical to the xxhash64
    production path — only the hash primitive differs."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 300)
    return minhash_lsh_candidates(docs, hash_fn=_md5_seeded_hash64)


def q_simhash_pairs(spark, sf_dir):
    """All pairs with hamming(simhash) ≤ 8 over the md5-derived
    cross-engine token hash.  Banding recall is exact (max_hamming+1
    chunks), so the output is a pure function of the token hashes and the
    DuckDB oracle recomputes the full simhash (bit votes included) in
    SQL."""
    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 300)
    return simhash_near_duplicates(docs, max_hamming=8, token_hash=_md5_hash64)


def q_cosine_pairs(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return pairwise_cosine_sql(emb, min_cosine=0.35, id_limit=400).select(
        "id_a", "id_b"
    )


def q_embedding_dup_clusters(spark, sf_dir):
    """Embedding-cosine near-dup CLUSTERING: cosine pairs ≥ 0.35 →
    transitive closure via the distributed min-label CC loop →
    (vec_id, keeper_id).  The embedding-space analog of dedup_clusters."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = pairwise_cosine_sql(emb, min_cosine=0.35, id_limit=400)
    return dedup_clusters(pairs).withColumnRenamed("doc_id", "vec_id")


def _weighted_edges(spark, sf_dir):
    """customer→part weighted digraph: w = lineitem multiplicity — the
    natural weighted-graph derivation (mtx.hxx:119 weighted readers)."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(
            F.concat(F.lit("c"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("p"), F.col("l_partkey")).alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def _decayed_event_edges(spark, sf_dir):
    """Time-DECAYED weighted transition graph over the events table: each
    observed transition contributes weight 1000000 div (1 + age_days)
    (integer division, age relative to the corpus max date), summed per
    (src, dst).  Integer decay makes the weights EXACT cross-engine —
    DuckDB's `//` computes the identical BIGINT — so the weighted-PR
    oracle disagrees only in the final double rank ulps, same as the
    static weighted query.  Recency-weighted PageRank is the canonical
    link-graph freshness signal (temporal analog of the reference's
    weighted mtx readers, mtx.hxx:119)."""
    et = edges_from_events(spark, sf_dir).select("src", "dst", "ts")
    mx = et.agg(F.max(F.to_date("ts")).alias("mx"))
    return (
        et.crossJoin(F.broadcast(mx))
        .select(
            "src",
            "dst",
            F.expr("1000000 div (1 + datediff(mx, to_date(ts)))").alias("wi"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("wi").cast("double").alias("w"))
    )


def q_pagerank_time_decay(spark, sf_dir):
    """10 iterations of weighted PageRank over the time-decayed event
    transition graph (BSP path, w-carrying packed blobs, dangling
    redistribution) — exact-integer decay weights, unrolled weighted SQL
    oracle."""
    from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import pagerank_weighted_bsp

    e = _decayed_event_edges(spark, sf_dir)
    d = build_vertex_dictionary(e, src="src", dst="dst").persist()
    n = d.count()
    enc = encode_edges(e, d, src="src", dst="dst", keep=("w",))
    res = pagerank_weighted_bsp(
        enc,
        n,
        PagerankOptions(dangling="redistribute", tolerance=0.0, max_iterations=10),
    )
    return _ranks_as_entities(spark, None, d, res.ranks)


def q_pagerank_weighted(spark, sf_dir):
    """10 iterations of weighted PageRank (BSP path, w-carrying packed
    blobs, per-superstep dangling-mass redistribution) — value-checked
    against an unrolled weighted SQL oracle."""
    from pagerank_cuda_dynamic_spark.operators.pagerank_bsp import pagerank_weighted_bsp

    e = _weighted_edges(spark, sf_dir)
    d = build_vertex_dictionary(e, src="src", dst="dst").persist()
    n = d.count()
    enc = encode_edges(e, d, src="src", dst="dst", keep=("w",))
    res = pagerank_weighted_bsp(
        enc, n,
        PagerankOptions(dangling="redistribute", tolerance=0.0, max_iterations=10),
    )
    return _ranks_as_entities(spark, None, d, res.ranks)


def q_pagerank_weighted_tcp(spark, sf_dir):
    """Same 10-iteration weighted PR through the TCP ring exchange (no
    shared filesystem; w_bin blobs + locally-computed dangling share) —
    the cross-node twin shares the weighted SQL oracle value-for-value."""
    from pagerank_cuda_dynamic_spark.operators.pagerank_tcp import pagerank_weighted_tcp

    e = _weighted_edges(spark, sf_dir)
    d = build_vertex_dictionary(e, src="src", dst="dst").persist()
    n = d.count()
    enc = encode_edges(e, d, src="src", dst="dst", keep=("w",))
    res = pagerank_weighted_tcp(
        enc, n,
        PagerankOptions(dangling="redistribute", tolerance=0.0, max_iterations=10),
    )
    return _ranks_as_entities(spark, None, d, res.ranks)


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-5, float64 GEMM (block-broadcast queries) —
    value-checked against a DuckDB list_cosine_similarity window oracle."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where(
        F.col("vec_id") < 500
    )
    return brute_force_topk(emb, k=5, dtype=np.float64).select(
        "query_id", "neighbor_id"
    )


def q_connected_components_pj(spark, sf_dir):
    """CC via POINTER JUMPING (hook + path-halving, O(log diameter) rounds)
    — same output contract as connected_components; exercises the
    general-graph scale path where the min-label loop's O(diameter) rounds
    would dominate."""
    from pagerank_cuda_dynamic_spark.operators.components import (
        connected_components_pointer_jump,
    )

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    d = build_vertex_dictionary(et, src="src", dst="dst").persist()
    n = d.count()
    enc = encode_edges(et, d, src="src", dst="dst")
    cdf = connected_components_pointer_jump(enc, n).withColumnRenamed(
        "component", "cid"
    )
    return (
        cdf.join(d, "v")
        .join(
            d.withColumnRenamed("v", "cid").withColumnRenamed("entity", "component"),
            "cid",
        )
        .select(F.col("entity").alias("v"), "component")
    )


def q_minhash_verified(spark, sf_dir):
    """MinHash-LSH candidates verified by exact shingle Jaccard ≥ 0.5 — the
    full near-dup pipeline, value-checked against the exact-Jaccard oracle
    (equality also evidences 100% LSH recall on this corpus)."""
    from pagerank_cuda_dynamic_spark.operators.dedup import minhash_dedup_pairs

    docs = _docs(spark, sf_dir).where(F.col("doc_id") < 300)
    return minhash_dedup_pairs(docs, threshold=0.5).select("id_a", "id_b", "jaccard")


def q_token_vocabulary(spark, sf_dir):
    """Top-200 tokenizer vocabulary (token, tf, df) with a deterministic
    (tf desc, token asc) boundary — operators/text.token_vocabulary."""
    from pagerank_cuda_dynamic_spark.operators.text import token_vocabulary

    return token_vocabulary(_docs(spark, sf_dir), top_n=200)


_BOILERPLATE = "\nsubscribe to our newsletter today\ncopyright example corp 2026"


def q_line_dedup(spark, sf_dir):
    """CCNet-style cross-corpus line dedup with INJECTED boilerplate: the
    same two footer lines are appended to every even doc_id; line_dedup
    must strip every line occurring in >1 document while preserving each
    doc's surviving line order — operators/dedup.line_dedup."""
    from pagerank_cuda_dynamic_spark.operators.dedup import line_dedup

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    injected = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(_BOILERPLATE))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return line_dedup(injected, max_doc_occurrences=1)


def q_session_stats(spark, sf_dir):
    """30-minute gap sessionization over the events stream + per-session
    aggregates (operators/temporal.session_stats); the gap compare runs
    on integer microseconds so the window-SQL oracle matches exactly."""
    from pagerank_cuda_dynamic_spark.operators.temporal import epoch_us, session_stats

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    s = session_stats(ev, gap_seconds=1800)
    return s.select(
        "user_id",
        "session_seq",
        "n_events",
        epoch_us(F.col("t_start")).alias("t_start_us"),
        epoch_us(F.col("t_end")).alias("t_end_us"),
        F.round("duration_sec", 6).alias("duration_sec"),
        "n_event_types",
    )


def q_asof_join(spark, sf_dir):
    """Backward ASOF join: each click event picks up the user's most
    recent purchase value (operators/temporal.asof_join — union-tag, one
    keyed shuffle) vs DuckDB's NATIVE ASOF JOIN as the oracle."""
    from pagerank_cuda_dynamic_spark.operators.temporal import asof_join, epoch_us

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    right = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    out = asof_join(left, right, key_col="user_id", ts_col="ts", value_cols=("value",))
    return out.select(
        "event_id",
        "user_id",
        epoch_us(F.col("ts")).alias("ts_us"),
        F.round("value_asof", 6).alias("value_asof"),
    )


def _entity_edge_df(spark, sf_dir):
    return derive_entity_edges(spark, sf_dir)


def q_hits(spark, sf_dir):
    """Kleinberg HITS, 20 L2-normalized power iterations over the entity
    digraph (operators/centrality.hits — joinagg gather alternating E/Eᵀ)
    vs a fully unrolled 40-half-step CTE oracle."""
    from pagerank_cuda_dynamic_spark.operators.centrality import hits

    res = hits(_entity_edge_df(spark, sf_dir), iterations=20)
    return res.select(
        F.col("v").alias("entity"),
        F.round("auth", 6).alias("auth"),
        F.round("hub", 6).alias("hub"),
    )


def q_salsa(spark, sf_dir):
    """SALSA (Lempel-Moran), 20 degree-normalized alternating-walk rounds
    over the entity digraph (operators/centrality.salsa — mass-preserving,
    zero driver traffic in the loop) vs a fully unrolled CTE oracle."""
    from pagerank_cuda_dynamic_spark.operators.centrality import salsa

    res = salsa(_entity_edge_df(spark, sf_dir), iterations=20)
    return res.select(
        F.col("v").alias("entity"),
        F.round("auth", 6).alias("auth"),
        F.round("hub", 6).alias("hub"),
    )


def q_ppr_suppliers(spark, sf_dir):
    """Personalized PageRank, teleport uniform over the supplier vertices
    ('s…' prefix), 30 sync iterations with universal self-loops
    (operators/centrality.personalized_pagerank) vs the unrolled seeded
    CTE oracle."""
    from pagerank_cuda_dynamic_spark.operators.centrality import (
        personalized_pagerank,
    )

    e = _entity_edge_df(spark, sf_dir)
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    seeds = verts.where(F.col("v").like("s%"))
    res = personalized_pagerank(e, seeds, damping=DAMPING, iterations=30)
    return res.select(
        F.col("v").alias("entity"), F.round("rank", 6).alias("rank")
    )


def q_k_core(spark, sf_dir):
    """30-core of the undirected entity graph (operators/centrality.k_core
    — iterative degree peel, capped at 6 rounds ≡ the oracle's unroll;
    fixpoint lands in 3 rounds at sf0.01) vs a 6-round peel-chain CTE
    oracle.  Returns surviving vertices with their in-core degree."""
    from pagerank_cuda_dynamic_spark.operators.centrality import k_core

    res = k_core(_entity_edge_df(spark, sf_dir), k=30, max_rounds=6)
    return res.select(F.col("v").alias("entity"), F.col("deg"))


def q_scc(spark, sf_dir):
    """Strongly connected components of the temporal transition graph
    (operators/components.strongly_connected_components — FW-BW coloring:
    forward min-label fixpoint + multi-source same-color backward BFS,
    peeled per round) vs a recursive-CTE mutual-reachability oracle."""
    from pagerank_cuda_dynamic_spark.operators.components import (
        strongly_connected_components,
    )

    et = edges_from_events(spark, sf_dir).select("src", "dst")
    res = strongly_connected_components(et)
    return res.select(F.col("v").alias("entity"), F.col("scc"))


def q_link_pred(spark, sf_dir):
    """Co-purchase link prediction on the customer→part bipartite slice:
    common-neighbor / Jaccard / Adamic-Adar scores for customer pairs
    sharing ≥4 parts (operators/linkpred.link_prediction) vs the direct
    SQL aggregation oracle."""
    from pagerank_cuda_dynamic_spark.operators.linkpred import link_prediction

    e = _entity_edge_df(spark, sf_dir).where(
        F.col("src").like("c%") & F.col("dst").like("p%")
    )
    res = link_prediction(e, min_common=4)
    return res.select(
        "a",
        "b",
        "cn",
        F.round("jaccard", 6).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
    )


def q_multi_source_distances(spark, sf_dir):
    """G6 generalized: exact hop distances (s, v, dist) from seeds
    c1/c2/c3 over the entity DAG — one multi-source level-synchronous
    BFS keyed (s, v) (operators/graph.multi_source_distances), not |S|
    sequential runs — vs a recursive-CTE min-dist closure oracle."""
    from pagerank_cuda_dynamic_spark.operators.graph import multi_source_distances

    e = _entity_edge_df(spark, sf_dir).select("src", "dst")
    seeds = spark.createDataFrame([("c1",), ("c2",), ("c3",)], ["s"])
    return multi_source_distances(e, seeds)


def q_harmonic_centrality(spark, sf_dir):
    """Source-sampled harmonic centrality over customers c0–c99
    (operators/graph.harmonic_centrality): C_H(v) = Σ_s 1/dist(s,v),
    unreachable pairs contribute 0 — vs the same closure + aggregate
    in recursive SQL."""
    from pagerank_cuda_dynamic_spark.operators.graph import harmonic_centrality

    e = _entity_edge_df(spark, sf_dir).select("src", "dst")
    srcs = e.select("src").where(F.col("src").rlike("^c[0-9]{1,2}$")).distinct()
    h = harmonic_centrality(e, srcs)
    return h.select("v", F.round("harmonic", 6).alias("harmonic"))


def q_walk_corpus(spark, sf_dir):
    """Deterministic DeepWalk-style corpus from customers c0–c99, 4
    steps, hash-argmin next-step rule with the cross-engine md5 hash
    (operators/walks.deterministic_walks) vs a fully unrolled per-step
    argmin oracle — byte-identical corpus regardless of partitioning."""
    from pagerank_cuda_dynamic_spark.operators.walks import (
        deterministic_walks,
        md5_walk_hash,
    )

    e = _entity_edge_df(spark, sf_dir).select("src", "dst")
    starts = e.select("src").where(F.col("src").rlike("^c[0-9]{1,2}$")).distinct()
    return deterministic_walks(e, starts, steps=4, seed=0, hash_fn=md5_walk_hash)


def q_local_clustering(spark, sf_dir):
    """Per-vertex local clustering coefficient on the events transition
    graph (operators/components.local_clustering — degree-oriented
    successor-intersection with per-member triangle credit) vs a direct
    a<b<c triangle-join oracle."""
    from pagerank_cuda_dynamic_spark.operators.components import local_clustering

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    res = local_clustering(et)
    return res.select(
        F.col("v").alias("entity"), "d", "tri", F.round("lcc", 6).alias("lcc")
    )


def q_neighbor_sample(spark, sf_dir):
    """GraphSAGE-style deterministic fanout sampling, k=3 over the
    entity digraph with the cross-engine md5 hash
    (operators/walks.sample_neighbors) vs a window-rank SQL oracle."""
    from pagerank_cuda_dynamic_spark.operators.walks import (
        md5_walk_hash,
        sample_neighbors,
    )

    e = _entity_edge_df(spark, sf_dir).select("src", "dst")
    return sample_neighbors(e, k=3, seed=0, hash_fn=md5_walk_hash)


def q_feature_propagation(spark, sf_dir):
    """2-hop SGC-style mean feature propagation over the events
    transition graph (operators/features.propagate_features,
    include_self): vertex features assigned from embeddings.parquet by
    the cross-engine md5 hash mod |embeddings| — vs the unrolled
    unnest + avg SQL oracle."""
    from pagerank_cuda_dynamic_spark.operators.features import (
        explode_features,
        propagate_features,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_emb = emb.count()
    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    verts = (
        et.select(F.col("src").alias("v"))
        .unionByName(et.select(F.col("dst").alias("v")))
        .distinct()
    )
    vmap = verts.select(
        "v",
        (
            F.conv(F.substring(F.md5("v"), 1, 15), 16, 10).cast("long") % n_emb
        ).alias("vec_id"),
    )
    feats = explode_features(
        vmap.join(F.broadcast(emb), "vec_id").select("v", "embedding"),
        "v",
        "embedding",
    )
    x = propagate_features(et, feats, hops=2, include_self=True)
    return x.select("v", "dim", F.round("val", 6).alias("val"))


def q_katz(spark, sf_dir):
    """Katz centrality, 10 fixed rounds, α=0.05/β=1 over the events
    transition graph (operators/centrality.katz — PageRank-joinagg
    gather with zero in-loop driver traffic) vs a fully unrolled CTE
    oracle."""
    from pagerank_cuda_dynamic_spark.operators.centrality import katz

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    res = katz(et, alpha=0.05, beta=1.0, iterations=10)
    return res.select(F.col("v").alias("entity"), F.round("katz", 6).alias("katz"))


def q_reciprocity(spark, sf_dir):
    """Edge mutuality of the events transition graph
    (operators/graph.reciprocity) vs the direct self-join oracle."""
    from pagerank_cuda_dynamic_spark.operators.graph import reciprocity

    et = edges_from_events(spark, sf_dir).select("src", "dst")
    res = reciprocity(et)
    return res.select(
        "n_edges", "n_reciprocal", F.round("reciprocity", 6).alias("reciprocity")
    )


def q_assortativity(spark, sf_dir):
    """Newman degree assortativity of the entity graph
    (operators/graph.degree_assortativity — five sufficient moments in
    one aggregate) vs the identical-arithmetic SQL oracle."""
    from pagerank_cuda_dynamic_spark.operators.graph import degree_assortativity

    res = degree_assortativity(_entity_edge_df(spark, sf_dir))
    return res.select("m", F.round("r", 6).alias("r"))


def q_avg_neighbor_degree(spark, sf_dir):
    """Per-vertex mean undirected neighbor degree knn(v) on the entity
    graph (operators/graph.avg_neighbor_degree) vs the direct join +
    average oracle."""
    from pagerank_cuda_dynamic_spark.operators.graph import avg_neighbor_degree

    res = avg_neighbor_degree(_entity_edge_df(spark, sf_dir))
    return res.select("v", "d", F.round("knn", 6).alias("knn"))


def q_closeness(spark, sf_dir):
    """Source-sampled closeness from customers c0–c99 on the entity DAG
    (operators/graph.closeness_centrality) vs the recursive-closure +
    aggregate oracle."""
    from pagerank_cuda_dynamic_spark.operators.graph import closeness_centrality

    e = _entity_edge_df(spark, sf_dir).select("src", "dst")
    srcs = e.select("src").where(F.col("src").rlike("^c[0-9]{1,2}$")).distinct()
    res = closeness_centrality(e, srcs)
    return res.select(
        "v", "n_reached", F.round("closeness", 6).alias("closeness")
    )


def q_eigenvector(spark, sf_dir):
    """Eigenvector centrality, 20 power-iteration rounds over the events
    transition graph (operators/centrality.eigenvector_centrality) vs a
    fully unrolled gather+L2 CTE oracle."""
    from pagerank_cuda_dynamic_spark.operators.centrality import (
        eigenvector_centrality,
    )

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    res = eigenvector_centrality(et, iterations=20)
    return res.select(F.col("v").alias("entity"), F.round("score", 6).alias("score"))


def q_betweenness(spark, sf_dir):
    """Source-sampled Brandes betweenness from customers c0–c19 over the
    entity DAG, max_depth=4 contract (operators/centrality.betweenness —
    all sources advance in one (s,v)-keyed frontier; backward σ-ratio
    dependency sweep) vs a fully unrolled forward+backward SQL oracle."""
    from pagerank_cuda_dynamic_spark.operators.centrality import betweenness

    e = _entity_edge_df(spark, sf_dir).select("src", "dst")
    srcs = e.select("src").where(F.col("src").rlike("^c1?[0-9]$")).distinct()
    res = betweenness(e, srcs, max_depth=4)
    return res.select("v", F.round("bc", 6).alias("bc"))


def _edge_split_pred(mod: int, r: int = 0):
    """Cross-engine deterministic edge split: md5-derived 60-bit hash of
    'src|dst' mod `mod` — DuckDB computes the identical predicate
    (CAST(concat('0x', substr(md5(src || '|' || dst), 1, 15)) AS BIGINT)),
    so base/batch membership agrees on both sides bit-for-bit."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.col("src"), F.col("dst"))), 1, 15),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(mod)) == F.lit(r)


def q_cc_incremental(spark, sf_dir):
    """Insert-only DYNAMIC connected components (components.
    connected_components_incremental — the CC analog of the reference's
    batch-insert regime, batch.hxx insert path): ~20% of the event-graph
    edges (md5 split) arrive as the batch against a pointer-jump labeling
    of the remaining 80%; the O(|batch|)-work merge must equal a
    from-scratch CC of the FULL graph — the oracle is that full-graph
    recursive closure."""
    from pagerank_cuda_dynamic_spark.operators.components import (
        connected_components_incremental,
        connected_components_pointer_jump,
    )

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    base = et.where(~_edge_split_pred(5))
    batch = et.where(_edge_split_pred(5))
    bverts = (
        base.select(F.col("src").alias("v"))
        .unionByName(base.select(F.col("dst").alias("v")))
        .distinct()
    )
    labels = connected_components_pointer_jump(base, vertices=bverts)
    return connected_components_incremental(labels, batch)


def q_cc_decremental(spark, sf_dir):
    """Edge-deletion DYNAMIC connected components (components.
    connected_components_decremental): delete ~14% of the event-graph
    edges (md5 split) from a full labeling; only the affected components
    are recomputed (pointer-jump on the O(affected) subgraph), untouched
    labels pass through.  Oracle: recursive closure over the surviving
    edges seeded from the FULL original vertex set."""
    from pagerank_cuda_dynamic_spark.operators.components import (
        connected_components_decremental,
        connected_components_pointer_jump,
    )

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    verts = (
        et.select(F.col("src").alias("v"))
        .unionByName(et.select(F.col("dst").alias("v")))
        .distinct()
    )
    labels = connected_components_pointer_jump(et, vertices=verts)
    dels = et.where(_edge_split_pred(7))
    return connected_components_decremental(et, labels, dels)


def q_triangles_incremental(spark, sf_dir):
    """Dynamic triangle count under edge insertions (components.
    triangle_count_incremental): ~25% of the event-graph edges (md5
    split — the event transition graph actually HAS triangles, unlike
    the near-bipartite entity graph) arrive as the batch; the count is
    base + |new triangles| with the delta enumerated only around
    genuinely-new edges.  Must equal the full-union recount oracle."""
    from pagerank_cuda_dynamic_spark.operators.components import (
        triangle_count_incremental,
    )

    e = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    old = e.where(~_edge_split_pred(4))
    batch = e.where(_edge_split_pred(4))
    return triangle_count_incremental(old, batch)


def q_louvain(spark, sf_dir):
    """Synchronized-move Louvain first phase (components.louvain_moves,
    4 rounds, even-down/odd-up direction alternation) over the event
    transition graph — every integer gain comparison is replayed by the
    unrolled SQL oracle, so labels match bit-for-bit."""
    from pagerank_cuda_dynamic_spark.operators.components import louvain_moves

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    return louvain_moves(et, rounds=4)


def q_dsir_weights(spark, sf_dir):
    """DSIR importance scores (sampling.dsir_importance — hashed-unigram
    Laplace likelihood ratios in exact scaled-integer arithmetic, no
    logs/libm): target = sources src1–src3, pool = everything else;
    every pool doc's BIGINT score must match the DuckDB recomputation
    bit-for-bit.  md5-derived cross-engine token hash (production default
    stays xxhash64)."""
    from pagerank_cuda_dynamic_spark.operators.sampling import dsir_importance

    docs = _docs(spark, sf_dir)
    return dsir_importance(
        docs,
        F.col("source").isin("src1", "src2", "src3"),
        n_buckets=1024,
        token_hash=_md5_hash64,
    )


_SPAN_INJECT = (
    "the shared boilerplate sentence that repeats across documents verbatim "
    "for span level dedup checks"
)


def q_corpus_profile(spark, sf_dir):
    """Per-language corpus profile (text.corpus_profile): counts, total
    chars, EXACT p50/p90/p99 lengths (Spark `percentile` ≡ DuckDB
    quantile_cont, both linear interpolation over the same doubles), and
    distinct sources."""
    from pagerank_cuda_dynamic_spark.operators.text import corpus_profile

    return corpus_profile(_docs(spark, sf_dir))


def q_duplicate_spans(spark, sf_dir):
    """Substring-level duplication profile (dedup.duplicate_window_stats,
    12-token windows, md5 window hash): a 15-token boilerplate span is
    injected into every doc_id % 3 == 0 document, so those docs must show
    ≥4 duplicated windows while clean docs show whatever natural overlap
    the corpus has — the oracle recomputes every window hash exactly."""
    from pagerank_cuda_dynamic_spark.operators.dedup import duplicate_window_stats

    docs = _docs(spark, sf_dir)
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" " + _SPAN_INJECT)),
        ).otherwise(F.col("text")),
    )
    return duplicate_window_stats(injected, window=12, window_hash=_md5_hash64)


def q_despan_corpus(spark, sf_dir):
    """Span-level dedup REMOVAL (dedup.remove_duplicate_spans — Lee et
    al. ExactSubstr semantics: drop every token covered by a cross-doc
    duplicated 12-token window except in the (id,pos)-minimal owner
    occurrence).  Same boilerplate injection as `duplicate_spans`; the
    oracle recomputes window hashes, ownership and reassembly exactly."""
    from pagerank_cuda_dynamic_spark.operators.dedup import (
        remove_duplicate_spans,
    )

    docs = _docs(spark, sf_dir)
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(" " + _SPAN_INJECT)),
        ).otherwise(F.col("text")),
    )
    return remove_duplicate_spans(injected, window=12, window_hash=_md5_hash64)


def q_mis(spark, sf_dir):
    """Luby maximal independent set with md5 hash priorities over the
    event graph (graph.maximal_independent_set) — winners/removals
    replayed round-for-round by the unrolled oracle; extra unrolled
    rounds are no-ops so the cap only needs to exceed convergence."""
    from pagerank_cuda_dynamic_spark.operators.graph import (
        maximal_independent_set,
    )

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    return maximal_independent_set(et, priority_hash=_md5_hash64)


def q_jp_coloring(spark, sf_dir):
    """Jones–Plassmann greedy coloring (graph.jp_coloring, color = the
    Luby layer index — proper by construction) over the event graph,
    md5 priorities, vs the same unrolled-layers oracle."""
    from pagerank_cuda_dynamic_spark.operators.graph import jp_coloring

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    return jp_coloring(et, priority_hash=_md5_hash64)


def q_kmv_vocab(spark, sf_dir):
    """Global KMV distinct-token estimate over the corpus (sketches.
    kmv_distinct, k=256, md5-portable hash): kth-min hash, sketch size,
    and the IEEE-double estimate all match DuckDB exactly — the
    value-checkable alternative to approx_count_distinct's engine-private
    HLL registers."""
    from pagerank_cuda_dynamic_spark.operators.sketches import kmv_distinct

    tok = _docs(spark, sf_dir).select(
        F.explode(
            F.expr(r"regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
        ).alias("t")
    )
    return kmv_distinct(tok, "t", k=256)


def q_kmv_users_by_type(spark, sf_dir):
    """Per-event-type KMV distinct-user estimates (sketches.
    kmv_distinct_by, k=64) — the grouped profiling shape (one window
    partitioned by the group key)."""
    from pagerank_cuda_dynamic_spark.operators.sketches import kmv_distinct_by

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return kmv_distinct_by(ev, "event_type", "user_id", k=64)


def q_coreness(spark, sf_dir):
    """Full core decomposition by h-index iteration (centrality.coreness,
    6 rounds — the capped sequence is the operator contract and the oracle
    unrolls the identical rounds; any cap ≥ the convergence round count
    yields exact coreness) over the undirected simple entity graph."""
    from pagerank_cuda_dynamic_spark.operators.centrality import coreness

    e = _entity_edge_df(spark, sf_dir).select("src", "dst")
    return coreness(e, rounds=6)


def q_host_graph(spark, sf_dir):
    """Page→host-style graph contraction (operators/webgraph.contract_graph):
    the entity graph coarsened by customer→nation, supplier→nation,
    part→brand (nations/regions keep their ids), weight = distinct
    underlying edges.  The host-graph build every web-crawl pipeline runs
    before domain-level analytics; mapping broadcast, one groupBy shuffle."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import contract_graph

    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    mapping = (
        customer.select(
            F.concat(F.lit("c"), F.col("c_custkey")).alias("v"),
            F.concat(F.lit("n"), F.col("c_nationkey")).alias("g"),
        )
        .unionByName(
            supplier.select(
                F.concat(F.lit("s"), F.col("s_suppkey")).alias("v"),
                F.concat(F.lit("n"), F.col("s_nationkey")).alias("g"),
            )
        )
        .unionByName(
            part.select(
                F.concat(F.lit("p"), F.col("p_partkey")).alias("v"),
                F.concat(F.lit("b:"), F.col("p_brand")).alias("g"),
            )
        )
    )
    return contract_graph(_entity_edge_df(spark, sf_dir), mapping)


def q_bowtie(spark, sf_dir):
    """Broder bow-tie regions (operators/webgraph.bowtie_decomposition) of
    the first-300-transitions prefix of the event transition graph — the
    sparse early snapshot has genuine IN/OUT/tendril structure, unlike the
    fully-mixed full graph.  Oracle: recursive-CTE mutual/forward/backward/
    undirected reachability with the same (size desc, label asc) core pick."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import (
        bowtie_decomposition,
    )

    e = (
        edges_from_events(spark, sf_dir)
        .where(F.col("seq") < 300)
        .select("src", "dst")
    )
    return bowtie_decomposition(e).select(F.col("v").alias("entity"), "region")


def q_cocitation(spark, sf_dir):
    """Co-citation pairs (operators/webgraph.cocitation_graph, Small 1973):
    entities cited together by ≥2 common in-neighbors, shared-vertex
    degree capped at 100 (the d² cap contract) — vs the literal capped
    self-join oracle."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import cocitation_graph

    return cocitation_graph(
        _entity_edge_df(spark, sf_dir), max_degree=100, min_weight=2
    ).select(F.col("a").alias("entity_a"), F.col("b").alias("entity_b"), "w")


def q_bib_coupling(spark, sf_dir):
    """Bibliographic-coupling pairs (operators/webgraph.cocitation_graph
    with coupling=True, Kessler 1963): entities citing ≥2 common targets,
    same degree-cap contract, vs the transposed self-join oracle."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import cocitation_graph

    return cocitation_graph(
        _entity_edge_df(spark, sf_dir),
        max_degree=100,
        min_weight=2,
        coupling=True,
    ).select(F.col("a").alias("entity_a"), F.col("b").alias("entity_b"), "w")


def q_k_truss(spark, sf_dir):
    """12-truss of the parts-co-ordered graph (edge p_a—p_b when some
    order contains both parts; operators/components.k_truss — 6 capped
    degree-oriented support/peel rounds ≡ the oracle's unroll; fixpoint
    lands in 5 rounds at sf0.01: 115.7k → 1.1k edges) vs the unrolled
    common-neighbor peel-chain CTE oracle.  Returns surviving edges with
    their in-truss support."""
    from pagerank_cuda_dynamic_spark.operators.components import k_truss

    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    co = (
        li.join(li.withColumnRenamed("p", "p2"), "k")
        .where(F.col("p") < F.col("p2"))
        .select(F.col("p").alias("src"), F.col("p2").alias("dst"))
        .distinct()
    )
    return k_truss(co, k=12, rounds=6).select(
        F.col("src").alias("part_a"), F.col("dst").alias("part_b"), "sup"
    )


def q_heavy_hitter_tokens(spark, sf_dir):
    """Exact φ-heavy-hitter tokens, φ=1/65 (operators/sketches.heavy_hitters
    — per-partition Misra–Gries candidates + one exact verification pass;
    state bounded at k counters/partition, shuffle at k·P rows) vs the
    direct GROUP BY … HAVING cnt·65 > n oracle."""
    from pagerank_cuda_dynamic_spark.operators.sketches import heavy_hitters

    from pagerank_cuda_dynamic_spark.functions import tokens

    tok = _docs(spark, sf_dir).select(
        F.explode(tokens("text")).alias("token")
    )
    return heavy_hitters(tok, "token", k=64).select(
        F.col("item").alias("token"), "cnt"
    )


def q_weighted_sample(spark, sf_dir):
    """Deterministic weighted Bernoulli sample of orders, inclusion
    probability ∝ o_totalprice (operators/sampling.weighted_sample —
    pure-integer Weyl-mix predicate, no shuffle, layout/rerun stable) vs
    the identical integer expression in SQL."""
    from pagerank_cuda_dynamic_spark.operators.sampling import weighted_sample

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w_cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return weighted_sample(
        orders.withColumn("w_cents", w_cents),
        F.col("w_cents"),
        rate_num=1,
        rate_den=5_000_000_000,
        id_col="o_orderkey",
    ).select("o_orderkey", "w_cents")


def q_neighborhood_function(spark, sf_dir):
    """ANF/HyperBall-style ≤3-hop neighborhood-size estimates with
    portable KMV registers (operators/webgraph.neighborhood_function,
    k=32) — after t rounds each register is EXACTLY the k smallest
    md5-hashes of the true ≤t-hop ball, so the oracle recomputes it from
    a bounded recursive closure (HLL registers are engine-private)."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import (
        neighborhood_function,
    )

    res = neighborhood_function(_entity_edge_df(spark, sf_dir), rounds=3, k=32)
    return res.select(
        F.col("v").alias("entity"), "n_sketch", "kth_hash", "estimate"
    )


def q_distance_distribution(spark, sf_dir):
    """Neighborhood function N(t), t = 0..3 over the entity digraph
    (operators/webgraph.distance_distribution — per-round aggregates of
    the ANF KMV registers; per-vertex estimates are floored to
    milli-units BEFORE summing so the per-t totals are BIGINT-exact on
    any engine / summation order) vs the bounded min-dist closure
    oracle."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import (
        distance_distribution,
    )

    return distance_distribution(_entity_edge_df(spark, sf_dir), rounds=3, k=32)


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient φ(k), k = 1..40, over the undirected entity
    graph (operators/webgraph.rich_club — two histogram shuffles, then
    KB-sized broadcast suffix-sum joins; never a per-edge pass per k) vs
    the direct threshold-count oracle."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import rich_club

    return rich_club(_entity_edge_df(spark, sf_dir), max_k=40)


def q_source_overlap(spark, sf_dir):
    """Cross-source shingle-overlap matrix (operators/dedup.source_overlap
    — per-source shingle vocabularies, inverted-index pair join with the
    dedup family's df cap): the corpus-mixing contamination diagnostic;
    (source_a, source_b, n_shared, jaccard) for all source pairs."""
    from pagerank_cuda_dynamic_spark.operators.dedup import source_overlap

    return source_overlap(_docs(spark, sf_dir))


def q_degree_powerlaw(spark, sf_dir):
    """CSN power-law degree-exponent MLE over the undirected entity graph
    (operators/graph.degree_powerlaw — one degree count + ONE two-scalar
    aggregate; ln() 6-dp regime) vs the identical-arithmetic SQL twin."""
    from pagerank_cuda_dynamic_spark.operators.graph import degree_powerlaw

    return degree_powerlaw(_entity_edge_df(spark, sf_dir), d_min=2)


def q_pseudo_diameter(spark, sf_dir):
    """Double-sweep diameter lower bound of the undirected entity graph
    (operators/graph.pseudo_diameter — deterministic pivots: min id,
    then max-dist/min-id; two capped BFS closures) vs a two-stage
    bounded recursive-CTE oracle replaying the identical pivot rule."""
    from pagerank_cuda_dynamic_spark.operators.graph import pseudo_diameter

    return pseudo_diameter(_entity_edge_df(spark, sf_dir), max_depth=32)


def q_seeded_lpa(spark, sf_dir):
    """Semi-supervised label propagation: supplier vertices seeded with
    their nation, 4 synchronous clamped rounds over the undirected entity
    graph (operators/components.seeded_label_propagation) — "which nation
    dominates each vertex's neighborhood"; unreached vertices stay NULL.
    Value-checked against the identically-unrolled NULL-aware CTE
    oracle."""
    from pagerank_cuda_dynamic_spark.operators.components import (
        seeded_label_propagation,
    )

    seeds = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .select(
            F.concat(F.lit("s"), F.col("s_suppkey")).alias("v"),
            F.concat(F.lit("n"), F.col("s_nationkey")).alias("label"),
        )
    )
    return seeded_label_propagation(
        _entity_edge_df(spark, sf_dir), seeds, rounds=4
    ).select(F.col("v").alias("entity"), "label")


def q_lm_score(spark, sf_dir):
    """Self-trained Laplace-smoothed bigram-LM document scores
    (operators/text.lm_score — the CCNet-style model-based quality
    filter, trained on the corpus itself): per-doc mean ln P(w2|w1) over
    its bigrams, all JVM built-ins, vs the identical count-join SQL
    twin (ln() 6-dp agreement regime shared with adamic_adar)."""
    from pagerank_cuda_dynamic_spark.operators.text import lm_score

    return lm_score(_docs(spark, sf_dir))


def q_dedup_best(spark, sf_dir):
    """Near-dup survivor selection (operators/dedup.dedup_representatives):
    corpus = documents<200 ∪ a punctuation-degraded copy (identical alnum
    shingles ⇒ Jaccard-1 pairs, but different quality), clustered by the
    distributed closure; per cluster keep argmax (round(quality·10⁶),
    −doc_id) via ONE integer-keyed struct-min aggregate — float
    comparisons never decide a survivor."""
    from pagerank_cuda_dynamic_spark.operators.dedup import (
        dedup_representatives,
    )
    from pagerank_cuda_dynamic_spark.operators.text import quality_expr

    d = _docs(spark, sf_dir).where(F.col("doc_id") < 200).select("doc_id", "text")
    noisy = d.select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" !!!!!!!!!!")).alias("text"),
    )
    docs = d.unionByName(noisy).withColumn("quality", quality_expr("text"))
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup_representatives(docs, pairs)


def q_maximal_matching(spark, sf_dir):
    """Greedy maximal matching with md5 hash priorities over the event
    graph (graph.maximal_matching — edge-analog of Luby MIS: an edge is
    matched iff its (hash, src, dst) key is the local minimum at BOTH
    endpoints; matched endpoints leave) vs the round-for-round unrolled
    oracle; extra unrolled rounds are no-ops past convergence."""
    from pagerank_cuda_dynamic_spark.operators.graph import maximal_matching

    et = edges_from_events(spark, sf_dir).select("src", "dst").distinct()
    return maximal_matching(et, priority_hash=_md5_hash64)


def q_spam_mass(spark, sf_dir):
    """TrustRank + relative spam mass (centrality.trustrank_spam_mass,
    Gyöngyi et al. 2004): trusted seeds = customer entities ('c…'), 20
    synchronous PPR rounds for both the uniform-teleport rank and the
    trust-seeded rank, spam_mass = (rank − trust)/rank — vs the dual
    unrolled-CTE oracle."""
    from pagerank_cuda_dynamic_spark.operators.centrality import (
        trustrank_spam_mass,
    )

    e = _entity_edge_df(spark, sf_dir)
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    trusted = verts.where(F.col("v").like("c%"))
    res = trustrank_spam_mass(e, trusted, damping=DAMPING, iterations=20)
    return res.select(
        F.col("v").alias("entity"),
        F.round("rank", 6).alias("rank"),
        F.round("trust", 6).alias("trust"),
        F.round("spam_mass", 6).alias("spam_mass"),
    )


def q_absorption_regions(spark, sf_dir):
    """Truncated absorbing-random-walk hit probability
    (centrality.absorption_probability): chance a uniform random walk
    reaches a region entity ('r…') within 6 steps on the entity graph
    (c→p→s→n→r topology, so every vertex has a nontrivial probability)
    — vs the unrolled mean-recurrence CTE oracle."""
    from pagerank_cuda_dynamic_spark.operators.centrality import (
        absorption_probability,
    )

    e = _entity_edge_df(spark, sf_dir)
    verts = (
        e.select(F.col("src").alias("v"))
        .union(e.select(F.col("dst").alias("v")))
        .distinct()
    )
    targets = verts.where(F.col("v").like("r%"))
    res = absorption_probability(e, targets, rounds=6)
    return res.select(
        F.col("v").alias("entity"), F.round("p_absorb", 6).alias("p_absorb")
    )


def q_dedup_matching(spark, sf_dir):
    """One-to-one near-duplicate pairing: weighted maximal matching
    (graph.maximal_matching, Preis local-max — heaviest-overlap edges
    matched first, exact-integer weight = shared shingle count) over the
    Jaccard-1 triangle graph of a doubly-injected corpus (each doc<200
    plus TWO punctuation-degraded copies ⇒ identical shingle sets), so
    every triangle forces the weighted-then-hash tie-break.  Oracle
    replays the pair build and every matching round in SQL."""
    from pagerank_cuda_dynamic_spark.operators.graph import maximal_matching

    d = _docs(spark, sf_dir).where(F.col("doc_id") < 200).select("doc_id", "text")
    docs = (
        d.unionByName(
            d.select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" !!!!!!!!!!")).alias("text"),
            )
        )
        .unionByName(
            d.select(
                (F.col("doc_id") + 2000000).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" ??????????")).alias("text"),
            )
        )
    )
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, include_counts=True)
    pe = pairs.select(
        F.col("id_a").alias("src"),
        F.col("id_b").alias("dst"),
        F.col("n_common").alias("w"),
    )
    return maximal_matching(pe, priority_hash=_md5_hash64, weight_col="w")


def q_topo_levels(spark, sf_dir):
    """Kahn-peel DAG layering (graph.topological_levels): level(v) =
    longest path from a source — recovers the c→p→s→n→r stratification
    of the entity graph; exact cycle detection (a no-peel round raises).
    Oracle replays each peel round; extra unrolled rounds are no-ops."""
    from pagerank_cuda_dynamic_spark.operators.graph import topological_levels

    res = topological_levels(_entity_edge_df(spark, sf_dir), max_rounds=8)
    return res.select(F.col("v").alias("entity"), "level")


def q_interleave_mix(spark, sf_dir):
    """Deterministic stride-scheduling source interleave
    (sampling.interleave_sources): weight(srcN) = N%5 + 1, virtual time
    vt = ((k+1)·10⁶) div w in pure integer arithmetic — identical
    row_number/div replay in the oracle."""
    from pagerank_cuda_dynamic_spark.operators.sampling import (
        interleave_sources,
    )

    docs = _docs(spark, sf_dir)
    weights = (
        docs.select("source")
        .distinct()
        .select(
            "source",
            (F.substring("source", 4, 10).cast("int") % 5 + 1).alias("w"),
        )
    )
    return interleave_sources(docs, weights)


def q_densest_core(spark, sf_dir):
    """Bahmani et al. densest-subgraph peel (webgraph.densest_subgraph)
    finding a planted link farm: entity graph (density ≈ 31) ∪ a K80
    clique on 'x…' vertices (density 39.5) — the peel must isolate
    exactly the clique as the best iterate (in_densest ⊆ the plant).
    Exact-integer peel predicate and cross-multiplied argmax; oracle
    replays every round."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import densest_subgraph

    e = _entity_edge_df(spark, sf_dir)
    r = spark.range(80)
    clique = (
        r.alias("a")
        .crossJoin(r.alias("b"))
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.concat(F.lit("x"), F.col("a.id")).alias("src"),
            F.concat(F.lit("x"), F.col("b.id")).alias("dst"),
        )
    )
    return densest_subgraph(e.unionByName(clique), eps_num=1, eps_den=10)


def q_temporal_reach(spark, sf_dir):
    """Earliest-arrival time-respecting reachability
    (graph.temporal_reachability) over the cross-user contact graph
    (consecutive events on the same props-k key link the two users;
    stamp = the later event_id): arrival(u) = min last-edge stamp over
    ≤4-hop non-decreasing paths from the user_id%37==0 seed users — vs
    the bounded recursive-CTE closure oracle."""
    from pagerank_cuda_dynamic_spark.operators.graph import temporal_reachability
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        F.concat(F.lit("u"), "user_id").alias("u"),
        F.regexp_extract("props", "[0-9]+", 0).cast("int").alias("k"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("k").orderBy("ts", "event_id")
    tr = ev.select(
        F.lag("u").over(w).alias("src"),
        F.col("u").alias("dst"),
        F.col("event_id").alias("seq"),
    ).where(F.col("src").isNotNull())
    seeds = (
        tr.select(F.col("src").alias("v"))
        .union(tr.select("dst"))
        .distinct()
        .where(F.substring("v", 2, 10).cast("int") % 37 == 0)
    )
    return temporal_reachability(tr, seeds, max_hops=4)


def q_embedding_centroids(spark, sf_dir):
    """Per-label mean embedding in relational (label, dim, centroid, n)
    form (similarity.embedding_centroids — posexplode + one map-side-
    combinable average, no arrays cross the shuffle) vs the DuckDB
    list-index unnest average."""
    from pagerank_cuda_dynamic_spark.operators.similarity import (
        embedding_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    res = embedding_centroids(emb)
    return res.select(
        "label", "dim", F.round("centroid", 6).alias("centroid"), "n"
    )


def q_embedding_covariance(spark, sf_dir):
    """D×D population covariance of the embedding cloud
    (similarity.gram_covariance — per-Arrow-batch float64 X.T@X partial
    blocks in ONE mapInPandas pass, merged by a D²-row aggregate; the
    PCA input) vs the exact relational self-join covariance in DuckDB."""
    from pagerank_cuda_dynamic_spark.operators.similarity import (
        gram_covariance,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return gram_covariance(emb).select(
        "i", "j", F.round("cov", 6).alias("cov")
    )


def q_host_pagerank(spark, sf_dir):
    """Composition: DOMAIN-level PageRank — the host ranking every crawl
    pipeline derives right after contraction: entity graph → host graph
    (the `host_graph` mapping: customers/suppliers→nation, parts→brand)
    → 10 synchronous rounds of the self-looped uniform-teleport pull
    recurrence (personalized_pagerank seeded by every host vertex ≡
    plain PageRank).  Oracle replays contraction + the unrolled CTE."""
    from pagerank_cuda_dynamic_spark.operators.centrality import (
        personalized_pagerank,
    )

    hg = q_host_graph(spark, sf_dir).select("src", "dst")
    verts = (
        hg.select(F.col("src").alias("v"))
        .union(hg.select(F.col("dst").alias("v")))
        .distinct()
    )
    res = personalized_pagerank(hg, verts, damping=DAMPING, iterations=10)
    return res.select(
        F.col("v").alias("host"), F.round("rank", 6).alias("rank")
    )


def q_negative_samples(spark, sf_dir):
    """Deterministic negative-edge sampling for link-prediction / GNN
    training (walks.negative_samples): dense-id dictionary (J4) → fixed
    Weyl-mix probe sequence cand(src, j) = (src·M1 + j·M2 + A) mod n →
    reject self/true edges → first 3 surviving attempts per source —
    decoded back to entity strings; the oracle replays dictionary,
    probes, rejection and attempt ranking verbatim."""
    from pagerank_cuda_dynamic_spark.operators.walks import negative_samples

    e = _entity_edge_df(spark, sf_dir)
    d = build_vertex_dictionary(e, src="src", dst="dst")
    n = d.count()
    enc = encode_edges(e, d, src="src", dst="dst")
    neg = negative_samples(enc, n, k=3, attempts=8)
    return (
        neg.join(
            d.withColumnRenamed("v", "src").withColumnRenamed(
                "entity", "src_entity"
            ),
            "src",
        )
        .join(
            d.withColumnRenamed("v", "dst").withColumnRenamed(
                "entity", "dst_entity"
            ),
            "dst",
        )
        .select("src_entity", "dst_entity", "attempt")
    )


_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]


def q_funnel(spark, sf_dir):
    """Ordered conversion funnel (temporal.funnel_steps): earliest
    signup→view→click→purchase completion times per user, each step
    strictly after the previous one — vs the chained filtered-min
    oracle (identical greedy-earliest recurrence)."""
    from pagerank_cuda_dynamic_spark.operators.temporal import funnel_steps

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = funnel_steps(ev, _FUNNEL_STEPS)
    # epoch-µs BIGINT: timestamps hash-compare exactly across engines
    # (pandas would otherwise surface ns-vs-µs dtype noise)
    return res.select(
        "user_id",
        "step_idx",
        "step",
        F.unix_micros(F.col("step_ts").cast("timestamp")).alias("step_ts_us"),
    )


def q_retention(spark, sf_dir):
    """Day-cohort retention triangle (temporal.retention_cohorts):
    users cohorted by first-seen calendar day, distinct active users per
    (cohort_day, day_offset) — vs the identical two-aggregate oracle."""
    from pagerank_cuda_dynamic_spark.operators.temporal import (
        retention_cohorts,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    res = retention_cohorts(ev)
    return res.select(
        F.col("cohort_day").cast("string").alias("cohort_day"),
        "day_offset",
        "n_users",
    )


def q_decontamination_bloom(spark, sf_dir):
    """The SAME contamination corpus as q_decontamination, pushed through
    the `prefilter="bloom"` scale path (operators/dedup._bloom_prefilter:
    constant-size Bloom filter of eval shingle hashes broadcast to an
    Arrow membership kernel, false positives weeded by the exact string
    join) — output is row-identical to the broadcast prefilter, so the
    oracle is the identical SQL."""
    from pagerank_cuda_dynamic_spark.operators.dedup import contamination_flags

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    heldout = docs.where(F.col("doc_id") < 20)
    train = docs.where(F.col("doc_id") >= 20).unionByName(
        heldout.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    return contamination_flags(train, heldout, threshold=0.5, prefilter="bloom")


def q_butterflies(spark, sf_dir):
    """Bipartite 4-cycle census of the customer→part co-purchase slice
    (operators/webgraph.butterfly_count): butterflies = Σ_pairs C(c,2)
    over right-pairs sharing c left-neighbors — vs the identical
    wedge-pair aggregation in SQL."""
    from pagerank_cuda_dynamic_spark.operators.webgraph import butterfly_count

    e = _entity_edge_df(spark, sf_dir).where(
        F.col("src").like("c%") & F.col("dst").like("p%")
    )
    return butterfly_count(e)


def q_fastrp(spark, sf_dir):
    """FastRP node embeddings over the entity graph (operators/features.
    fastrp_embeddings, CIKM 2019): deterministic Achlioptas ±√3
    projection (md5-portable sign hash) pushed through two in-neighbor
    mean hops, combined 0.25·R + 0.5·M R + 1.0·M² R — vs the identical
    unrolled CTE.  Relational (v, dim, val) output."""
    from pagerank_cuda_dynamic_spark.operators.features import fastrp_embeddings

    e = _entity_edge_df(spark, sf_dir)
    emb = fastrp_embeddings(
        e,
        dims=4,
        weights=(0.5, 1.0),
        self_weight=0.25,
        include_self=True,
        normalize=False,
        sign_hash=_md5_hash64,
    )
    return emb.select("v", "dim", F.round("val", 6).alias("val"))


def q_transitivity(spark, sf_dir):
    """Global clustering coefficient of the entity graph (components.
    transitivity): 3·triangles/wedges with exact-integer triangle and
    wedge counts — vs the wedge-closure + degree-aggregate oracle."""
    from pagerank_cuda_dynamic_spark.operators.components import transitivity

    e = _entity_edge_df(spark, sf_dir)
    res = transitivity(e)
    return res.select(
        "n_triangles", "n_wedges", F.round("transitivity", 6).alias("transitivity")
    )


def q_fastrp_edge_scores(spark, sf_dir):
    """Embedding → pairwise-feature composition (the GNN / link-pred
    feature-engineering step): join the FastRP embedding onto both
    endpoints of every customer→part edge and emit dot product and
    cosine, all relational (per-edge sum over the dim key — no vector
    UDF).  Oracle replays the full chain off the shared FastRP CTE."""
    from pagerank_cuda_dynamic_spark.operators.features import fastrp_embeddings

    e = _entity_edge_df(spark, sf_dir)
    # no persist needed: fastrp materializes each hop internally, so the
    # three consumers below only recompute the final cheap combine
    emb = fastrp_embeddings(
        e,
        dims=4,
        weights=(0.5, 1.0),
        self_weight=0.25,
        include_self=True,
        normalize=False,
        sign_hash=_md5_hash64,
    )
    nrm = emb.groupBy("v").agg(F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm"))
    cp = e.where(F.col("src").like("c%") & F.col("dst").like("p%")).select(
        "src", "dst"
    )
    dots = (
        cp.join(emb.withColumnRenamed("v", "src").withColumnRenamed("val", "va"), "src")
        .join(
            emb.withColumnRenamed("v", "dst").withColumnRenamed("val", "vb"),
            ["dst", "dim"],
        )
        .groupBy("src", "dst")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    out = (
        dots.join(nrm.withColumnRenamed("v", "src").withColumnRenamed("nrm", "na"), "src")
        .join(nrm.withColumnRenamed("v", "dst").withColumnRenamed("nrm", "nb"), "dst")
        .select(
            "src",
            "dst",
            # cosine only: raw dots are exact dyadic rationals (the two
            # ±√3 factors cancel) sitting ON the 1e-6 rounding half-grid,
            # where engines tie-break differently; the norm quotient is
            # generically irrational, so round(6) is stable cross-engine
            F.round(
                F.when(
                    (F.col("na") > 0) & (F.col("nb") > 0),
                    F.col("dot") / (F.col("na") * F.col("nb")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("cosine"),
        )
    )
    return out


def q_temperature_mix(spark, sf_dir):
    """Multilingual temperature resampling at α=0.5 (sampling.
    temperature_sample): per-doc keep rate (n_min/n_lang)^0.5 over the
    deterministic id-mix predicate — vs the identical count + pow +
    mix-threshold SQL."""
    from pagerank_cuda_dynamic_spark.operators.sampling import temperature_sample

    docs = _docs(spark, sf_dir)
    return temperature_sample(docs, alpha=0.5).select("doc_id", "lang")


def q_quantize_embeddings(spark, sf_dir):
    """Per-vector affine uint8 quantization of the embeddings table
    (similarity.quantize_embeddings): exact integer codes + rounded
    (zero, scale) vs the identical unnest + floor(v+0.5) SQL."""
    from pagerank_cuda_dynamic_spark.operators.similarity import (
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return quantize_embeddings(emb)


def q_quality_filter(spark, sf_dir):
    """Per-language top-half quality cut (text.quality_filter): survive
    iff cume_dist of the 6-dp quality within the language exceeds 0.5 —
    vs the direct cume_dist() window SQL (the operator computes the
    same fraction on the distinct value table to avoid per-row
    windows)."""
    from pagerank_cuda_dynamic_spark.operators.text import quality_filter

    docs = _docs(spark, sf_dir)
    return quality_filter(docs, keep_fraction=0.5, strata_col="lang")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # REGISTRY ORDER POLICY (see README "Registry window policy"): the
    # external driver's correctness gate verifies the FIRST ~50 entries
    # only, so queries with the least external evidence go first.  Round
    # 6 rotation (VERDICT r5 task #1): the 24 round-5 additions (judge
    # gate + pytest only, zero driver rows) occupy slots 1-24; the
    # round-3/4 queries driver-verified in CORRECTNESS_r05 fill the rest
    # of the window; the round-1/2 queries (driver-green r01-r04)
    # follow.  Deterministic 3-round schedule: r6 = r5 additions + r3/4
    # refresh, r7 = r1/2 block, r8 = r3/4 block - see README.
    return {
        "kmv_users_by_type": q_kmv_users_by_type,
        "maximal_matching": q_maximal_matching,
        "spam_mass": q_spam_mass,
        "absorption_regions": q_absorption_regions,
        "dedup_matching": q_dedup_matching,
        "topo_levels": q_topo_levels,
        "interleave_mix": q_interleave_mix,
        "densest_core": q_densest_core,
        "temporal_reach": q_temporal_reach,
        "embedding_centroids": q_embedding_centroids,
        "embedding_covariance": q_embedding_covariance,
        "despan_corpus": q_despan_corpus,
        "funnel": q_funnel,
        "retention": q_retention,
        "host_pagerank": q_host_pagerank,
        "negative_samples": q_negative_samples,
        "decontamination_bloom": q_decontamination_bloom,
        "butterflies": q_butterflies,
        "fastrp": q_fastrp,
        "transitivity": q_transitivity,
        "fastrp_edge_scores": q_fastrp_edge_scores,
        "temperature_mix": q_temperature_mix,
        "quantize_embeddings": q_quantize_embeddings,
        "quality_filter": q_quality_filter,
        "line_dedup": q_line_dedup,
        "session_stats": q_session_stats,
        "asof_join": q_asof_join,
        "hits": q_hits,
        "salsa": q_salsa,
        "ppr_suppliers": q_ppr_suppliers,
        "k_core_30": q_k_core,
        "scc": q_scc,
        "link_pred_copurchase": q_link_pred,
        "multi_source_distances": q_multi_source_distances,
        "harmonic_centrality": q_harmonic_centrality,
        "walk_corpus": q_walk_corpus,
        "local_clustering": q_local_clustering,
        "neighbor_sample": q_neighbor_sample,
        "feature_propagation": q_feature_propagation,
        "katz_10": q_katz,
        "betweenness": q_betweenness,
        "closeness": q_closeness,
        "eigenvector_20": q_eigenvector,
        "reciprocity": q_reciprocity,
        "assortativity": q_assortativity,
        "avg_neighbor_degree": q_avg_neighbor_degree,
        "pagerank_time_decay": q_pagerank_time_decay,
        "dsir_weights": q_dsir_weights,
        "louvain": q_louvain,
        "corpus_profile": q_corpus_profile,
        "duplicate_spans": q_duplicate_spans,
        "mis": q_mis,
        "jp_coloring": q_jp_coloring,
        "kmv_vocab": q_kmv_vocab,
        "cc_incremental": q_cc_incremental,
        "cc_decremental": q_cc_decremental,
        "triangles_incremental": q_triangles_incremental,
        "coreness": q_coreness,
        "host_graph": q_host_graph,
        "bowtie": q_bowtie,
        "cocitation": q_cocitation,
        "k_truss": q_k_truss,
        "bib_coupling": q_bib_coupling,
        "neighborhood_function": q_neighborhood_function,
        "distance_distribution": q_distance_distribution,
        "rich_club": q_rich_club,
        "dedup_best": q_dedup_best,
        "lm_score": q_lm_score,
        "seeded_lpa": q_seeded_lpa,
        "pseudo_diameter": q_pseudo_diameter,
        "degree_powerlaw": q_degree_powerlaw,
        "source_overlap": q_source_overlap,
        "heavy_hitter_tokens": q_heavy_hitter_tokens,
        "weighted_sample": q_weighted_sample,
        "entity_edges": q_entity_edges,
        "temporal_edges": q_temporal_edges,
        "out_degrees": q_out_degrees,
        "in_degrees": q_in_degrees,
        "graph_summary": q_graph_summary,
        "transpose": q_transpose,
        "symmetrize": q_symmetrize,
        "tidy_batch": q_tidy_batch,
        "apply_batch_count": q_apply_batch_count,
        "pagerank_1iter": q_pagerank_1iter,
        "pagerank_20iters": q_pagerank_20iters,
        "pagerank_top20": q_pagerank_top20,
        "pagerank_converged": q_pagerank_converged,
        "triangles": q_triangles,
        "connected_components": q_connected_components,
        "cc_sizes": q_cc_sizes,
        "lpa": q_lpa,
        "subgraph_filter": q_subgraph_filter,
        "degree_histogram": q_degree_histogram,
        "l1_norm_1iter": q_l1_norm_1iter,
        "l2_norm_1iter": q_l2_norm_1iter,
        "bfs_reachable": q_bfs_reachable,
        "modularity_cc": q_modularity_cc,
        "dedup_exact": q_dedup_exact,
        "dedup_exact_injected": q_dedup_exact_injected,
        "fingerprints": q_fingerprints,
        "token_stats": q_token_stats,
        "quality_score": q_quality,
        "language_id": q_language_id,
        "text_scrub": q_text_scrub,
        "doc_chunks": q_doc_chunks,
        "decontamination": q_decontamination,
        "repetition_stats": q_repetition_stats,
        "pack_sequences": q_pack_sequences,
        "tfidf_keywords": q_tfidf_keywords,
        "stratified_sample": q_stratified_sample,
        "split_corpus": q_split_corpus,
        "ngram_jaccard": q_ngram_jaccard,
        "pagerank_weighted": q_pagerank_weighted,
        "pagerank_weighted_tcp": q_pagerank_weighted_tcp,
        "dedup_clusters": q_dedup_clusters,
        "corpus_filter": q_corpus_filter,
        "minhash_candidates": q_minhash_candidates,
        "simhash_pairs": q_simhash_pairs,
        "cosine_pairs": q_cosine_pairs,
        "embedding_dup_clusters": q_embedding_dup_clusters,
        "embedding_topk": q_embedding_topk,
        "connected_components_pj": q_connected_components_pj,
        "minhash_verified": q_minhash_verified,
        "token_vocabulary": q_token_vocabulary,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect-compatible ANSI)
# ---------------------------------------------------------------------------

_EVENT_EDGES = """
WITH trans AS (
  SELECT 'u' || (user_id % 16) || ':' || event_type AS dst,
         LAG('u' || (user_id % 16) || ':' || event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         ts, event_id
    FROM events
)
SELECT src, dst, ROW_NUMBER() OVER (ORDER BY ts, event_id) - 1 AS seq
  FROM trans WHERE src IS NOT NULL
"""

_GRAPH_CTES = f"""
base_edges AS MATERIALIZED ({ENTITY_EDGES_SQL}),
verts AS MATERIALIZED (SELECT src AS v FROM base_edges UNION SELECT dst FROM base_edges),
edges AS MATERIALIZED (SELECT src, dst FROM base_edges UNION SELECT v, v FROM verts),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS outdeg FROM edges GROUP BY src),
nn AS MATERIALIZED (SELECT count(*) AS n FROM verts),
ew AS MATERIALIZED (
  SELECT edges.src, edges.dst, 1.0 / deg.outdeg AS w
  FROM edges JOIN deg ON deg.v = edges.src)
"""

# FastRP unrolled recurrence shared by the `fastrp` and
# `fastrp_edge_scores` oracles: emb(v, dim, val) UNROUNDED
_FASTRP_CTES = f"""be AS MATERIALIZED ({ENTITY_EDGES_SQL}),
ed AS MATERIALIZED (SELECT DISTINCT src, dst FROM be),
verts AS MATERIALIZED (SELECT src AS v FROM ed UNION SELECT dst FROM ed),
e AS MATERIALIZED (SELECT src, dst FROM ed UNION SELECT v, v FROM verts),
r0 AS MATERIALIZED (
  SELECT v, d.dim,
         CASE CAST(concat('0x', substr(md5(concat(v, ':', CAST(d.dim AS VARCHAR))), 1, 15)) AS BIGINT) % 6
              WHEN 0 THEN sqrt(3.0) WHEN 1 THEN -sqrt(3.0) ELSE 0.0 END AS val
  FROM verts CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS dim) d),
h1 AS MATERIALIZED (
  SELECT e.dst AS v, r.dim, avg(r.val) AS val
  FROM e JOIN r0 r ON r.v = e.src GROUP BY e.dst, r.dim),
h2 AS MATERIALIZED (
  SELECT e.dst AS v, h.dim, avg(h.val) AS val
  FROM e JOIN h1 h ON h.v = e.src GROUP BY e.dst, h.dim),
emb AS MATERIALIZED (
  SELECT r0.v, r0.dim, 0.25 * r0.val + 0.5 * h1.val + 1.0 * h2.val AS val
  FROM r0 JOIN h1 ON h1.v = r0.v AND h1.dim = r0.dim
          JOIN h2 ON h2.v = r0.v AND h2.dim = r0.dim)"""



def _pr_sql(k: int) -> str:
    """Unrolled k-iteration PageRank as chained CTEs (sync pull update,
    C0=(1-P)/N, universal self-loops)."""
    ctes = [f"WITH {_GRAPH_CTES.strip()}"]
    ctes.append(
        "r0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM nn) AS rank FROM verts)"
    )
    for i in range(1, k + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT verts.v,
         (1-{DAMPING})/(SELECT n FROM nn)
           + {DAMPING} * coalesce(sum(r{i-1}.rank * ew.w), 0) AS rank
  FROM verts LEFT JOIN ew ON ew.dst = verts.v
  LEFT JOIN r{i-1} ON r{i-1}.v = ew.src
  GROUP BY verts.v
)"""
        )
    return (
        ",\n".join(ctes)
        + f"\nSELECT v AS entity, round(rank, 6) AS rank FROM r{k}"
    )


def _wpr_sql(k: int) -> str:
    """Unrolled k-iteration WEIGHTED PageRank over the customer→part
    multiplicity graph: a[v] = C0 + P·(Σ w_uv·r[u]/wdeg(u) + dm/N), dm =
    Σ_{wdeg(u)=0} r[u] (dangling redistribution, no self-loops)."""
    ctes = [
        """WITH we AS MATERIALIZED (
  SELECT 'c' || o_custkey AS src, 'p' || l_partkey AS dst,
         CAST(count(*) AS DOUBLE) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY 1, 2)""",
        "wverts AS MATERIALIZED (SELECT src AS v FROM we UNION SELECT dst FROM we)",
        "wdeg AS MATERIALIZED (SELECT src AS v, sum(w) AS wd FROM we GROUP BY src)",
        "wn AS MATERIALIZED (SELECT we.src, we.dst, we.w / wdeg.wd AS wn FROM we JOIN wdeg ON wdeg.v = we.src)",
        "wnn AS MATERIALIZED (SELECT count(*) AS n FROM wverts)",
        "dangl AS MATERIALIZED (SELECT v FROM wverts WHERE v NOT IN (SELECT v FROM wdeg))",
        "r0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM wnn) AS rank FROM wverts)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"dm{i - 1} AS MATERIALIZED (SELECT coalesce(sum(rank), 0) AS m "
            f"FROM r{i - 1} WHERE v IN (SELECT v FROM dangl))"
        )
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT wverts.v,
         (1-{DAMPING})/(SELECT n FROM wnn)
           + {DAMPING} * (coalesce(sum(r{i-1}.rank * wn.wn), 0)
                          + (SELECT m FROM dm{i-1})/(SELECT n FROM wnn)) AS rank
  FROM wverts LEFT JOIN wn ON wn.dst = wverts.v
  LEFT JOIN r{i-1} ON r{i-1}.v = wn.src
  GROUP BY wverts.v
)"""
        )
    return (
        ",\n".join(ctes)
        + f"\nSELECT v AS entity, round(rank, 6) AS rank FROM r{k}"
    )


def _decay_wpr_sql(k: int) -> str:
    """Unrolled k-iteration weighted PageRank over the TIME-DECAYED event
    transition graph: w(src,dst) = Σ 1000000 // (1 + age_days) — exact
    BIGINT cross-engine (mirrors _decayed_event_edges), then the identical
    weighted recurrence as _wpr_sql."""
    ctes = [
        """WITH ev AS MATERIALIZED (
  SELECT 'u' || (user_id % 16) || ':' || event_type AS dst,
         LAG('u' || (user_id % 16) || ':' || event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src,
         ts
    FROM events)""",
        "evn AS MATERIALIZED (SELECT src, dst, ts FROM ev WHERE src IS NOT NULL)",
        "mx AS (SELECT CAST(max(ts) AS DATE) AS d FROM evn)",
        """we AS MATERIALIZED (
  SELECT src, dst,
         CAST(sum(1000000 // (1 + date_diff('day', CAST(ts AS DATE), (SELECT d FROM mx)))) AS DOUBLE) AS w
  FROM evn GROUP BY src, dst)""",
        "wverts AS MATERIALIZED (SELECT src AS v FROM we UNION SELECT dst FROM we)",
        "wdeg AS MATERIALIZED (SELECT src AS v, sum(w) AS wd FROM we GROUP BY src)",
        "wn AS MATERIALIZED (SELECT we.src, we.dst, we.w / wdeg.wd AS wn FROM we JOIN wdeg ON wdeg.v = we.src)",
        "wnn AS MATERIALIZED (SELECT count(*) AS n FROM wverts)",
        "dangl AS MATERIALIZED (SELECT v FROM wverts WHERE v NOT IN (SELECT v FROM wdeg))",
        "r0 AS MATERIALIZED (SELECT v, 1.0/(SELECT n FROM wnn) AS rank FROM wverts)",
    ]
    for i in range(1, k + 1):
        ctes.append(
            f"dm{i - 1} AS MATERIALIZED (SELECT coalesce(sum(rank), 0) AS m "
            f"FROM r{i - 1} WHERE v IN (SELECT v FROM dangl))"
        )
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT wverts.v,
         (1-{DAMPING})/(SELECT n FROM wnn)
           + {DAMPING} * (coalesce(sum(r{i-1}.rank * wn.wn), 0)
                          + (SELECT m FROM dm{i-1})/(SELECT n FROM wnn)) AS rank
  FROM wverts LEFT JOIN wn ON wn.dst = wverts.v
  LEFT JOIN r{i-1} ON r{i-1}.v = wn.src
  GROUP BY wverts.v
)"""
        )
    return (
        ",\n".join(ctes)
        + f"\nSELECT v AS entity, round(rank, 6) AS rank FROM r{k}"
    )


def _hits_sql(k: int) -> str:
    """Unrolled k-iteration HITS as chained CTEs: each iteration is one
    authority gather over E + L2 normalize, then one hub gather over Eᵀ +
    L2 normalize — the literal recurrence of operators/centrality.hits."""
    ctes = [
        f"WITH base_edges AS MATERIALIZED ({ENTITY_EDGES_SQL}),",
        "e AS MATERIALIZED (SELECT src, dst FROM base_edges WHERE src <> dst),",
        "verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),",
        "nn AS (SELECT count(*) AS n FROM verts),",
        "h0 AS MATERIALIZED (SELECT v, 1.0/sqrt((SELECT n FROM nn)) AS s FROM verts)",
    ]
    body = "\n".join(ctes)
    for i in range(1, k + 1):
        body += f""",
a{i}r AS MATERIALIZED (
  SELECT verts.v, coalesce(sum(h{i-1}.s), 0) AS s
  FROM verts LEFT JOIN e ON e.dst = verts.v
  LEFT JOIN h{i-1} ON h{i-1}.v = e.src
  GROUP BY verts.v),
a{i} AS MATERIALIZED (
  SELECT v, s / (SELECT sqrt(sum(s*s)) FROM a{i}r) AS s FROM a{i}r),
h{i}r AS MATERIALIZED (
  SELECT verts.v, coalesce(sum(a{i}.s), 0) AS s
  FROM verts LEFT JOIN e ON e.src = verts.v
  LEFT JOIN a{i} ON a{i}.v = e.dst
  GROUP BY verts.v),
h{i} AS MATERIALIZED (
  SELECT v, s / (SELECT sqrt(sum(s*s)) FROM h{i}r) AS s FROM h{i}r)"""
    body += f"""
SELECT a{k}.v AS entity, round(a{k}.s, 6) AS auth, round(h{k}.s, 6) AS hub
FROM a{k} JOIN h{k} ON h{k}.v = a{k}.v"""
    return body


def _k_truss_sql(k: int, rounds: int) -> str:
    """Unrolled k-truss peel over the parts-co-ordered graph: `rounds`
    rounds of (common-neighbor support → drop sup < k−2), then one final
    support pass over the survivors — the literal capped sequence of
    operators/components.k_truss."""
    body = """WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS k, l_partkey AS p FROM lineitem),
s0 AS MATERIALIZED (
  SELECT DISTINCT l.p AS a, r.p AS b FROM li l JOIN li r ON l.k = r.k AND l.p < r.p)"""
    for i in range(1, rounds + 1):
        body += f""",
u{i} AS MATERIALIZED (SELECT a, b FROM s{i-1} UNION ALL SELECT b, a FROM s{i-1}),
s{i} AS MATERIALIZED (
  SELECT e.a, e.b FROM s{i-1} e
  LEFT JOIN u{i} u1 ON u1.a = e.a
  LEFT JOIN u{i} u2 ON u2.a = e.b AND u2.b = u1.b
  GROUP BY e.a, e.b HAVING count(u2.b) >= {k - 2})"""
    body += f""",
uf AS MATERIALIZED (SELECT a, b FROM s{rounds} UNION ALL SELECT b, a FROM s{rounds})
SELECT e.a AS part_a, e.b AS part_b, count(u2.b) AS sup
FROM s{rounds} e
LEFT JOIN uf u1 ON u1.a = e.a
LEFT JOIN uf u2 ON u2.a = e.b AND u2.b = u1.b
GROUP BY e.a, e.b"""
    return body


def _salsa_sql(k: int) -> str:
    """Unrolled k-iteration SALSA as chained CTEs: the literal
    degree-normalized alternating-walk recurrence of
    operators/centrality.salsa (hub gather with 1/indeg(dst), authority
    gather with 1/outdeg(src); no normalization — mass is preserved)."""
    body = f"""WITH base_edges AS MATERIALIZED ({ENTITY_EDGES_SQL}),
e AS MATERIALIZED (SELECT src, dst FROM base_edges WHERE src <> dst),
verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
indeg AS MATERIALIZED (SELECT dst AS v, count(*) AS ind FROM e GROUP BY dst),
outdeg AS MATERIALIZED (SELECT src AS v, count(*) AS outd FROM e GROUP BY src),
ew AS MATERIALIZED (
  SELECT e.src, e.dst, 1.0/indeg.ind AS w_in, 1.0/outdeg.outd AS w_out
  FROM e JOIN indeg ON indeg.v = e.dst JOIN outdeg ON outdeg.v = e.src),
a0 AS MATERIALIZED (
  SELECT verts.v,
         CASE WHEN indeg.v IS NULL THEN 0.0
              ELSE 1.0/(SELECT count(*) FROM indeg) END AS s
  FROM verts LEFT JOIN indeg ON indeg.v = verts.v)"""
    for i in range(1, k + 1):
        body += f""",
h{i} AS MATERIALIZED (
  SELECT verts.v, coalesce(sum(a{i-1}.s * ew.w_in), 0) AS s
  FROM verts LEFT JOIN ew ON ew.src = verts.v
  LEFT JOIN a{i-1} ON a{i-1}.v = ew.dst
  GROUP BY verts.v),
a{i} AS MATERIALIZED (
  SELECT verts.v, coalesce(sum(h{i}.s * ew.w_out), 0) AS s
  FROM verts LEFT JOIN ew ON ew.dst = verts.v
  LEFT JOIN h{i} ON h{i}.v = ew.src
  GROUP BY verts.v)"""
    body += f"""
SELECT a{k}.v AS entity, round(a{k}.s, 6) AS auth, round(h{k}.s, 6) AS hub
FROM a{k} JOIN h{k} ON h{k}.v = a{k}.v"""
    return body


def _eigen_sql(k: int) -> str:
    """Unrolled k-round power iteration x ← Aᵀx with an L2 normalize per
    round over the deduped self-loop-free events transition graph — the
    literal recurrence of operators/centrality.eigenvector_centrality
    (the authority half of _hits_sql run on A alone)."""
    body = f"""WITH et AS ({_EVENT_EDGES}),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM et WHERE src <> dst),
verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
nn AS (SELECT count(*) AS n FROM verts),
x0 AS MATERIALIZED (SELECT v, 1.0/sqrt((SELECT n FROM nn)) AS s FROM verts)"""
    for i in range(1, k + 1):
        body += f""",
x{i}r AS MATERIALIZED (
  SELECT verts.v, coalesce(sum(x{i-1}.s), 0) AS s
  FROM verts LEFT JOIN e ON e.dst = verts.v
  LEFT JOIN x{i-1} ON x{i-1}.v = e.src
  GROUP BY verts.v),
x{i} AS MATERIALIZED (
  SELECT v, s / (SELECT sqrt(sum(s*s)) FROM x{i}r) AS s FROM x{i}r)"""
    body += f"\nSELECT v AS entity, round(s, 6) AS score FROM x{k}"
    return body


def _ppr_sql(k: int) -> str:
    """Unrolled k-iteration personalized PageRank (teleport uniform over
    the 's…' supplier vertices, start at the teleport vector, universal
    self-loops) — the literal recurrence of
    operators/centrality.personalized_pagerank."""
    body = f"""WITH {_GRAPH_CTES.strip()},
seeds AS MATERIALIZED (SELECT v FROM verts WHERE v LIKE 's%'),
tp AS MATERIALIZED (
  SELECT verts.v,
         CASE WHEN seeds.v IS NULL THEN 0.0
              ELSE 1.0 / (SELECT count(*) FROM seeds) END AS p
  FROM verts LEFT JOIN seeds ON seeds.v = verts.v),
p0 AS MATERIALIZED (SELECT v, p AS rank FROM tp)"""
    for i in range(1, k + 1):
        body += f""",
p{i} AS MATERIALIZED (
  SELECT tp.v,
         (1-{DAMPING})*tp.p
           + {DAMPING} * coalesce(sum(p{i-1}.rank * ew.w), 0) AS rank
  FROM tp LEFT JOIN ew ON ew.dst = tp.v
  LEFT JOIN p{i-1} ON p{i-1}.v = ew.src
  GROUP BY tp.v, tp.p)"""
    body += f"\nSELECT v AS entity, round(rank, 6) AS rank FROM p{k}"
    return body


def _spam_mass_sql(k: int) -> str:
    """Dual unrolled k-iteration PPR (centrality.trustrank_spam_mass):
    `rank` = PPR seeded by EVERY vertex (uniform teleport ≡ plain
    PageRank), `trust` = PPR seeded by the customer entities ('c…');
    spam_mass = (rank − trust)/rank computed on the UNROUNDED values —
    both chains are the literal _ppr_sql recurrence over the same
    self-looped `ew` graph."""
    body = f"""WITH {_GRAPH_CTES.strip()},
seeds AS MATERIALIZED (SELECT v FROM verts WHERE v LIKE 'c%'),
tpu AS MATERIALIZED (SELECT v, 1.0 / (SELECT n FROM nn) AS p FROM verts),
tpt AS MATERIALIZED (
  SELECT verts.v,
         CASE WHEN seeds.v IS NULL THEN 0.0
              ELSE 1.0 / (SELECT count(*) FROM seeds) END AS p
  FROM verts LEFT JOIN seeds ON seeds.v = verts.v),
u0 AS MATERIALIZED (SELECT v, p AS rank FROM tpu),
t0 AS MATERIALIZED (SELECT v, p AS rank FROM tpt)"""
    for i in range(1, k + 1):
        for nm, tp in (("u", "tpu"), ("t", "tpt")):
            body += f""",
{nm}{i} AS MATERIALIZED (
  SELECT {tp}.v,
         (1-{DAMPING})*{tp}.p
           + {DAMPING} * coalesce(sum({nm}{i-1}.rank * ew.w), 0) AS rank
  FROM {tp} LEFT JOIN ew ON ew.dst = {tp}.v
  LEFT JOIN {nm}{i-1} ON {nm}{i-1}.v = ew.src
  GROUP BY {tp}.v, {tp}.p)"""
    body += f"""
SELECT u.v AS entity, round(u.rank, 6) AS rank, round(t.rank, 6) AS trust,
       round((u.rank - t.rank) / u.rank, 6) AS spam_mass
FROM u{k} u JOIN t{k} t ON t.v = u.v"""
    return body


def _absorption_sql(rounds: int) -> str:
    """Unrolled truncated absorbing-walk recurrence
    (centrality.absorption_probability): h_0 = [v LIKE 'r%'];
    h_{i+1}(v) = 1 for targets else mean over out-neighbors of h_i —
    LEFT JOINs make dangling non-targets coalesce to 0, the literal
    Spark loop."""
    body = f"""WITH base_edges AS MATERIALIZED ({ENTITY_EDGES_SQL}),
e AS MATERIALIZED (SELECT src, dst FROM base_edges WHERE src <> dst),
verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),
h0 AS MATERIALIZED (
  SELECT v, CASE WHEN v LIKE 'r%' THEN 1.0 ELSE 0.0 END AS h FROM verts)"""
    for i in range(1, rounds + 1):
        body += f""",
h{i} AS MATERIALIZED (
  SELECT verts.v,
         CASE WHEN verts.v LIKE 'r%' THEN 1.0
              ELSE coalesce(avg(h{i-1}.h), 0.0) END AS h
  FROM verts LEFT JOIN e ON e.src = verts.v
  LEFT JOIN h{i-1} ON h{i-1}.v = e.dst
  GROUP BY verts.v)"""
    body += f"""
SELECT v AS entity, round(h, 6) AS p_absorb FROM h{rounds}"""
    return body


def _dedup_matching_sql(rounds: int) -> str:
    """Full replay of q_dedup_matching: injected triple corpus → distinct
    3-shingles → exact Jaccard ≥ 0.5 pairs with exact-integer shared
    counts → `rounds` weighted local-max matching rounds (key order
    (−w, md5-hash, src, dst) — row_number replay of the Spark
    struct-min).  Extra rounds past convergence are no-ops."""
    parts = [
        """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 200),
docs2 AS (
  SELECT doc_id, text FROM d
  UNION ALL SELECT doc_id + 1000000, text || ' !!!!!!!!!!' FROM d
  UNION ALL SELECT doc_id + 2000000, text || ' ??????????' FROM d
),
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 1) + 1),
      i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i+2), ' ')
  ))) AS s
  FROM docs2
),
sizes AS (SELECT doc_id AS id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
canon AS MATERIALIZED (
  SELECT id_a AS src, id_b AS dst, -i AS nw,
         CAST(concat('0x', substr(md5(CAST(id_a AS VARCHAR) || '|' || CAST(id_b AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
),
live0 AS MATERIALIZED (SELECT src, dst, nw, h FROM canon)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""inc{r} AS (
  SELECT src AS v, nw, h, src, dst FROM live{r}
  UNION ALL SELECT dst AS v, nw, h, src, dst FROM live{r}),
vm{r} AS (
  SELECT v, nw, h, src, dst FROM (
    SELECT v, nw, h, src, dst,
           row_number() OVER (PARTITION BY v ORDER BY nw, h, src, dst) AS rn
    FROM inc{r}) s WHERE rn = 1),
win{r} AS MATERIALIZED (
  SELECT l.src, l.dst FROM live{r} l
  JOIN vm{r} a ON a.v = l.src AND a.nw = l.nw AND a.h = l.h
              AND a.src = l.src AND a.dst = l.dst
  JOIN vm{r} b ON b.v = l.dst AND b.nw = l.nw AND b.h = l.h
              AND b.src = l.src AND b.dst = l.dst),
live{r + 1} AS MATERIALIZED (
  SELECT l.src, l.dst, l.nw, l.h FROM live{r} l
  WHERE l.src NOT IN (SELECT src FROM win{r} UNION SELECT dst FROM win{r})
    AND l.dst NOT IN (SELECT src FROM win{r} UNION SELECT dst FROM win{r}))"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT src, dst FROM win{r}" for r in range(rounds)
    )
    return (
        ",\n".join(parts)
        + f""",
m AS ({union})
SELECT c.src, c.dst, (m.src IS NOT NULL) AS matched
FROM canon c LEFT JOIN m ON m.src = c.src AND m.dst = c.dst"""
    )


def _topo_levels_sql(rounds: int) -> str:
    """Unrolled Kahn peel (graph.topological_levels): per round, live
    vertices with no live predecessor peel at that level; extra rounds
    past the longest path are no-ops (empty lvl CTEs)."""
    parts = [
        f"""WITH base_edges AS MATERIALIZED ({ENTITY_EDGES_SQL}),
e AS MATERIALIZED (SELECT src, dst FROM base_edges WHERE src <> dst),
live0 AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""lvl{r} AS MATERIALIZED (
  SELECT l.v FROM live{r} l
  WHERE l.v NOT IN (SELECT e.dst FROM e JOIN live{r} s ON s.v = e.src)),
live{r + 1} AS MATERIALIZED (
  SELECT l.v FROM live{r} l WHERE l.v NOT IN (SELECT v FROM lvl{r}))"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT v, {r} AS level FROM lvl{r}" for r in range(rounds)
    )
    return (
        ",\n".join(parts)
        + f"\nSELECT v AS entity, CAST(level AS INTEGER) AS level FROM ({union}) u"
    )


def _densest_sql(rounds: int, eps_num: int = 1, eps_den: int = 10) -> str:
    """Full replay of q_densest_core (webgraph.densest_subgraph): entity
    graph ∪ generated K80, per-round exact-integer peel
    (deg·V·den ≤ 2·E·(den+num)), best iterate by cross-multiplied
    density argmax (ties → earliest round).  Extra unrolled rounds are
    empty no-ops excluded by the nv > 0 filter, exactly as the Spark
    loop's n_v == 0 break."""
    parts = [
        f"""WITH base_edges AS MATERIALIZED ({ENTITY_EDGES_SQL}),
xc AS (
  SELECT 'x' || a.r AS src, 'x' || b.r AS dst
  FROM (SELECT unnest(range(80)) AS r) a, (SELECT unnest(range(80)) AS r) b
  WHERE a.r < b.r),
alle AS (SELECT src, dst FROM base_edges UNION ALL SELECT src, dst FROM xc),
und AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM alle WHERE src <> dst),
live0 AS MATERIALIZED (SELECT a, b FROM und),
vl0 AS MATERIALIZED (SELECT a AS v FROM und UNION SELECT b FROM und)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""deg{r} AS MATERIALIZED (
  SELECT vl.v, coalesce(d.deg, 0) AS deg FROM vl{r} vl
  LEFT JOIN (SELECT v, count(*) AS deg FROM (
    SELECT a AS v FROM live{r} UNION ALL SELECT b FROM live{r}) i GROUP BY v) d
  ON d.v = vl.v),
st{r} AS MATERIALIZED (
  SELECT {r} AS r, (SELECT count(*) FROM vl{r}) AS nv,
         (SELECT count(*) FROM live{r}) AS ne),
out{r} AS MATERIALIZED (
  SELECT d.v FROM deg{r} d, st{r} s
  WHERE d.deg * s.nv * {eps_den} <= 2 * s.ne * {eps_den + eps_num}),
vl{r + 1} AS MATERIALIZED (
  SELECT vl.v FROM vl{r} vl WHERE vl.v NOT IN (SELECT v FROM out{r})),
live{r + 1} AS MATERIALIZED (
  SELECT l.a, l.b FROM live{r} l
  WHERE l.a NOT IN (SELECT v FROM out{r})
    AND l.b NOT IN (SELECT v FROM out{r}))"""
        )
    stats = " UNION ALL ".join(f"SELECT * FROM st{r}" for r in range(rounds))
    peeled = "\nUNION ALL ".join(
        f"SELECT v, {r} AS peel_round FROM out{r}" for r in range(rounds)
    )
    return (
        ",\n".join(parts)
        + f""",
stats AS (SELECT * FROM ({stats}) s WHERE nv > 0),
best AS (SELECT r FROM stats s WHERE NOT EXISTS (
  SELECT 1 FROM stats t
  WHERE t.ne * s.nv > s.ne * t.nv
     OR (t.ne * s.nv = s.ne * t.nv AND t.r < s.r))),
peeled AS ({peeled})
SELECT v, CAST(peel_round AS INTEGER) AS peel_round,
       peel_round >= (SELECT r FROM best) AS in_densest
FROM peeled"""
    )


def _temporal_reach_sql(hops: int) -> str:
    """Bounded recursive twin of q_temporal_reach
    (graph.temporal_reachability): enumerate every (v, arrival, ≤hops)
    state of time-respecting paths (stamps non-decreasing) from the
    %37 seed users, then min arrival per vertex — equal to the Spark
    label-correcting loop because smaller arrivals dominate."""
    return f"""
WITH RECURSIVE ev2 AS (
  SELECT 'u' || user_id AS u,
         CAST(regexp_extract(props, '[0-9]+') AS INT) AS k, ts, event_id
  FROM events),
tr AS (
  SELECT LAG(u) OVER (PARTITION BY k ORDER BY ts, event_id) AS src,
         u AS dst, event_id AS seq
  FROM ev2),
e AS MATERIALIZED (
  SELECT DISTINCT src, dst, CAST(seq AS BIGINT) AS seq
  FROM tr WHERE src IS NOT NULL),
seeds AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e) i
  WHERE CAST(substr(v, 2) AS INT) % 37 = 0),
reach(v, arr, hops) AS (
  SELECT v, CAST(-1 AS BIGINT) AS arr, 0 AS hops FROM seeds
  UNION
  SELECT e.dst, e.seq, r.hops + 1
  FROM reach r JOIN e ON e.src = r.v AND e.seq >= r.arr
  WHERE r.hops < {hops})
SELECT v, CAST(min(arr) AS BIGINT) AS arrival FROM reach GROUP BY v
"""


_DESPAN_SQL = f"""
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' {_SPAN_INJECT}'
              ELSE text END AS text
  FROM documents),
tk AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
  FROM injected),
w AS MATERIALIZED (
  SELECT doc_id, r.i - 1 AS pos,
         CAST(concat('0x', substr(md5(array_to_string(list_slice(t, r.i, r.i + 11), ' ')), 1, 15)) AS BIGINT) AS wh
  FROM tk, unnest(range(1, greatest(len(t) - 11, 0) + 1)) AS r(i)),
ag AS (SELECT wh FROM w GROUP BY wh HAVING count(DISTINCT doc_id) > 1),
dw AS (
  SELECT w.doc_id, w.pos,
         row_number() OVER (PARTITION BY w.wh ORDER BY w.doc_id, w.pos) AS rn
  FROM w JOIN ag ON ag.wh = w.wh),
cov AS (
  SELECT DISTINCT doc_id, pos + r.j AS p
  FROM dw, unnest(range(0, 12)) AS r(j) WHERE rn > 1),
tp AS (
  SELECT doc_id, r.i - 1 AS p, t[r.i] AS tok
  FROM tk, unnest(range(1, len(t) + 1)) AS r(i)),
kept AS (
  SELECT tp.doc_id, tp.p, tp.tok FROM tp
  LEFT JOIN cov ON cov.doc_id = tp.doc_id AND cov.p = tp.p
  WHERE cov.p IS NULL),
res AS (
  SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id)
SELECT tk.doc_id, coalesce(res.clean_text, '') AS clean_text,
       CAST(len(tk.t) AS BIGINT) AS n_tokens,
       CAST(len(tk.t) - coalesce(res.n_kept, 0) AS BIGINT) AS n_removed
FROM tk LEFT JOIN res ON res.doc_id = tk.doc_id
"""


def _funnel_sql(steps: list[str]) -> str:
    """Chained filtered-min replay of temporal.funnel_steps: t_i = min ts
    of step_i events strictly after t_{i-1}."""
    ctes = [
        f"""s0 AS MATERIALIZED (
  SELECT user_id AS u, min(ts) AS t FROM events
  WHERE event_type = '{steps[0]}' GROUP BY user_id)"""
    ]
    for i in range(1, len(steps)):
        ctes.append(
            f"""s{i} AS MATERIALIZED (
  SELECT e.user_id AS u, min(e.ts) AS t
  FROM events e JOIN s{i - 1} ON s{i - 1}.u = e.user_id AND e.ts > s{i - 1}.t
  WHERE e.event_type = '{steps[i]}' GROUP BY e.user_id)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT u AS user_id, {i} AS step_idx, '{s}' AS step, "
        f"epoch_us(t) AS step_ts_us FROM s{i}"
        for i, s in enumerate(steps)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


def _host_pr_sql(k: int) -> str:
    """Contraction + unrolled k-round uniform-teleport PageRank over the
    host graph (q_host_pagerank): the `host_graph` mapping CTEs followed
    by the literal personalized_pagerank recurrence (universal
    self-loops, p0 = teleport = 1/N)."""
    body = f"""WITH e0 AS (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
m AS (
  SELECT 'c' || c_custkey AS v, 'n' || c_nationkey AS g FROM customer
  UNION ALL
  SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
  UNION ALL
  SELECT 'p' || p_partkey, 'b:' || p_brand FROM part
),
he AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT COALESCE(ms.g, e0.src) AS src, COALESCE(md.g, e0.dst) AS dst
    FROM e0 LEFT JOIN m ms ON ms.v = e0.src LEFT JOIN m md ON md.v = e0.dst
  ) c WHERE src <> dst),
verts AS MATERIALIZED (SELECT src AS v FROM he UNION SELECT dst FROM he),
edges AS MATERIALIZED (SELECT src, dst FROM he UNION SELECT v, v FROM verts),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS outdeg FROM edges GROUP BY src),
nn AS MATERIALIZED (SELECT count(*) AS n FROM verts),
ew AS MATERIALIZED (
  SELECT edges.src, edges.dst, 1.0 / deg.outdeg AS w
  FROM edges JOIN deg ON deg.v = edges.src),
p0 AS MATERIALIZED (SELECT v, 1.0 / (SELECT n FROM nn) AS rank FROM verts)"""
    for i in range(1, k + 1):
        body += f""",
p{i} AS MATERIALIZED (
  SELECT verts.v,
         (1-{DAMPING})/(SELECT n FROM nn)
           + {DAMPING} * coalesce(sum(p{i-1}.rank * ew.w), 0) AS rank
  FROM verts LEFT JOIN ew ON ew.dst = verts.v
  LEFT JOIN p{i-1} ON p{i-1}.v = ew.src
  GROUP BY verts.v)"""
    body += f"\nSELECT v AS host, round(rank, 6) AS rank FROM p{k}"
    return body


_NEGATIVE_SAMPLES_SQL = f"""
WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
verts AS (
  SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)),
d AS MATERIALIZED (
  SELECT v AS entity, row_number() OVER (ORDER BY v) - 1 AS id FROM verts),
enc AS MATERIALIZED (
  SELECT ds.id AS src, dd.id AS dst
  FROM e JOIN d ds ON ds.entity = e.src JOIN d dd ON dd.entity = e.dst),
srcs AS (SELECT DISTINCT src FROM enc),
nn AS (SELECT count(*) AS n FROM d),
cand AS (
  SELECT src, r.j,
         (src * 2654435761 + r.j * 40503 + 12345) % (SELECT n FROM nn) AS dst
  FROM srcs, unnest(range(0, 8)) AS r(j)),
surv AS (
  SELECT c.src, c.j, c.dst FROM cand c
  LEFT JOIN enc ON enc.src = c.src AND enc.dst = c.dst
  WHERE c.dst <> c.src AND enc.src IS NULL),
rk AS (
  SELECT src, j, dst, row_number() OVER (PARTITION BY src ORDER BY j) AS rn
  FROM surv)
SELECT ds.entity AS src_entity, dd.entity AS dst_entity,
       CAST(rk.j AS INT) AS attempt
FROM rk JOIN d ds ON ds.id = rk.src JOIN d dd ON dd.id = rk.dst
WHERE rn <= 3
"""


_RETENTION_SQL = """
WITH act AS MATERIALIZED (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
f AS MATERIALIZED (SELECT u, min(d) AS cohort_day FROM act GROUP BY u)
SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
       CAST(act.d - f.cohort_day AS INT) AS day_offset,
       count(DISTINCT act.u) AS n_users
FROM act JOIN f ON f.u = act.u
GROUP BY 1, 2
"""


_CENTROIDS_SQL = """
SELECT label, CAST(t.i AS INT) AS dim,
       round(avg(CAST(embedding[t.i + 1] AS DOUBLE)), 6) AS centroid,
       count(*) AS n
FROM embeddings, unnest(range(len(embedding))) AS t(i)
GROUP BY label, t.i
"""

_COVARIANCE_SQL = """
WITH x AS MATERIALIZED (
  SELECT vec_id, CAST(t.i AS INT) AS i,
         CAST(embedding[t.i + 1] AS DOUBLE) AS v
  FROM embeddings, unnest(range(len(embedding))) AS t(i)
),
nn AS (SELECT count(*) AS n FROM embeddings),
mu AS MATERIALIZED (SELECT i, avg(v) AS mu FROM x GROUP BY i),
g AS (
  SELECT a.i AS i, b.i AS j, sum(a.v * b.v) AS s
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND b.i >= a.i
  GROUP BY a.i, b.i
)
SELECT g.i, g.j,
       round(s / (SELECT n FROM nn) - ma.mu * mb.mu, 6) AS cov
FROM g JOIN mu ma ON ma.i = g.i JOIN mu mb ON mb.i = g.j
"""


_INTERLEAVE_SQL = """
WITH w AS (
  SELECT source, (CAST(substr(source, 4, 10) AS INT) % 5) + 1 AS w
  FROM (SELECT DISTINCT source FROM documents)
),
k AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1 AS k
  FROM documents
)
SELECT k.doc_id, k.source, CAST(k.k AS BIGINT) AS k,
       CAST(((k.k + 1) * 1000000) // w.w AS BIGINT) AS vt
FROM k JOIN w USING (source)
"""


def _kcore_sql(k: int, rounds: int) -> str:
    """Unrolled `rounds`-round k-core peel over the undirected simple
    entity graph — the literal chain of operators/centrality.k_core
    (capped at the same round count, so cap-short-of-fixpoint inputs
    still agree)."""
    body = f"""WITH base_edges AS MATERIALIZED ({ENTITY_EDGES_SQL}),
e0 AS MATERIALIZED (
  SELECT src, dst FROM base_edges WHERE src <> dst
  UNION
  SELECT dst, src FROM base_edges WHERE src <> dst)"""
    for i in range(1, rounds + 1):
        body += f""",
d{i} AS MATERIALIZED (
  SELECT src AS v FROM e{i-1} GROUP BY src HAVING count(*) >= {k}),
e{i} AS MATERIALIZED (
  SELECT e{i-1}.src, e{i-1}.dst FROM e{i-1}
  WHERE e{i-1}.src IN (SELECT v FROM d{i})
    AND e{i-1}.dst IN (SELECT v FROM d{i}))"""
    body += f"""
SELECT src AS entity, count(*) AS deg FROM e{rounds} GROUP BY src"""
    return body


def _shingles_sql(id_limit: int) -> str:
    return f"""
SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 1) + 1),
    i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i+2), ' ')
))) AS s
FROM documents WHERE doc_id < {id_limit}
"""


def _jaccard_pairs_sql(id_limit: int, threshold: float = 0.5) -> str:
    return f"""
WITH sh AS ({_shingles_sql(id_limit)}),
sizes AS (SELECT doc_id AS id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= {threshold}
"""


_SHINGLES = _shingles_sql(200)


def _lpa_sql(rounds: int = 10) -> str:
    """Unrolled synchronous LPA over the events transition graph: each round
    every vertex adopts the most frequent neighbor label (ties → smallest),
    isolated vertices keep theirs."""
    ev = f"""
WITH trans AS (
  SELECT 'u' || (user_id % 16) || ':' || event_type AS dst,
         LAG('u' || (user_id % 16) || ':' || event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS src
    FROM events
)
SELECT DISTINCT src, dst FROM trans WHERE src IS NOT NULL
"""
    ctes = [
        f"edges AS MATERIALIZED ({ev})",
        "und AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges)",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)",
        "l0 AS (SELECT v, v AS lab FROM verts)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT verts.v, coalesce(w.lab, l{i-1}.lab) AS lab
  FROM verts
  JOIN l{i-1} ON l{i-1}.v = verts.v
  LEFT JOIN (
    SELECT u.dst AS v, p.lab,
           ROW_NUMBER() OVER (PARTITION BY u.dst ORDER BY count(*) DESC, p.lab ASC) AS rn
    FROM und u JOIN l{i-1} p ON p.v = u.src
    GROUP BY u.dst, p.lab
  ) w ON w.v = verts.v AND w.rn = 1
)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT v, lab AS label FROM l{rounds}"


def _lang_case() -> tuple[str, str]:
    """(hit column list, winner CASE expr) for the language-ID heuristic."""
    langs = sorted(STOPWORDS)
    hit_cols = []
    for lg in langs:
        pat = r"(?i)\b(" + "|".join(STOPWORDS[lg]) + r")\b"
        hit_cols.append(f"len(regexp_extract_all(text, '{pat}')) AS h_{lg}")
    best = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    case = "CASE "
    for lg in langs:
        case += f"WHEN {best} > 0 AND h_{lg} = {best} THEN '{lg}' "
    case += "ELSE 'und' END"
    return ", ".join(hit_cols), case


def _lang_sql(src: str = "documents") -> str:
    hit_cols, case = _lang_case()
    return f"""
WITH hits AS (SELECT doc_id, {hit_cols} FROM {src})
SELECT doc_id, {case} AS lang_pred FROM hits
"""


_INJ_DOCS = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id, text FROM documents
"""

_INJ_SHINGLES = """
SELECT doc_id, unnest(list_distinct(list_transform(
    range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 1) + 1),
    i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i+2), ' ')
))) AS s
FROM (SELECT doc_id, text FROM documents WHERE doc_id < 200
      UNION ALL
      SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 200)
"""


def _dedup_clusters_sql() -> str:
    """Jaccard-pair graph over the dup-injected corpus → recursive-CTE
    transitive closure → (doc_id, min reachable id)."""
    return f"""
WITH RECURSIVE sh AS ({_INJ_SHINGLES}),
sizes AS (SELECT doc_id AS id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
),
und AS (SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs),
verts AS (SELECT DISTINCT s AS v FROM und),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.v
)
SELECT v AS doc_id, min(r) AS keeper_id FROM reach GROUP BY v
"""


def _decontamination_sql(threshold: float = 0.5) -> str:
    """DuckDB twin of q_decontamination: same distinct-3-gram shingles,
    same containment-of-eval-set metric, same injected contamination."""
    shingle = (
        "unnest(list_distinct(list_transform("
        "range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 1) + 1), "
        "i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i+2), ' ')"
        "))) AS s"
    )
    return f"""
WITH ev AS (SELECT doc_id, {shingle} FROM documents WHERE doc_id < 20),
train_docs AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 20
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id < 20
),
tr AS (SELECT doc_id, {shingle} FROM train_docs),
evs AS (SELECT doc_id AS eval_id, count(*) AS esz FROM ev GROUP BY doc_id),
inter AS (
  SELECT t.doc_id AS train_id, e.doc_id AS eval_id, count(*) AS i
  FROM tr t JOIN ev e USING (s) GROUP BY 1, 2
)
SELECT train_id, eval_id, round(i * 1.0 / esz, 6) AS containment
FROM inter JOIN evs USING (eval_id)
WHERE i * 1.0 / esz >= {threshold}
"""


_MIX_SQL = "(doc_id * 2654435761 + 12345) % 1000000"


def _text_scrub_sql() -> str:
    """DuckDB twin of q_text_scrub: same PII patterns (RE2/Java-compatible
    by construction), same replacement order, counts on the original text."""
    clean = "text"
    count_terms = []
    for pat, tag in PII_PATTERNS:
        count_terms.append(f"len(regexp_extract_all(text, '{pat}'))")
        clean = f"regexp_replace({clean}, '{pat}', '{tag}', 'g')"
    counts = " + ".join(count_terms)
    return f"""
WITH aug AS (
  SELECT doc_id,
         text || ' mail user' || CAST(doc_id AS VARCHAR)
              || '@example.com ip 10.0.0.' || CAST(doc_id % 256 AS VARCHAR) AS text
  FROM documents
)
SELECT doc_id,
       trim(regexp_replace({clean}, '\\s+', ' ', 'g')) AS clean_text,
       CAST({counts} AS BIGINT) AS n_redactions
FROM aug
"""


def _doc_chunks_sql(chunk_size: int = 32, overlap: int = 8) -> str:
    stride = chunk_size - overlap
    return f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
),
s AS (
  SELECT doc_id, toks,
         unnest(generate_series(1, greatest(len(toks), 1), {stride})) AS start
  FROM t
)
SELECT doc_id,
       CAST((start - 1) // {stride} AS BIGINT) AS chunk_id,
       array_to_string(toks[start:start + {chunk_size - 1}], ' ') AS chunk_text,
       CAST(least({chunk_size}, len(toks) - start + 1) AS BIGINT) AS n_tokens
FROM s
"""


def _corpus_filter_sql() -> str:
    hit_cols, case = _lang_case()
    en_pat = r"(?i)\b(" + "|".join(STOPWORDS["en"]) + r")\b"
    return rf"""
WITH docs AS ({_INJ_DOCS}),
keep AS (SELECT min(doc_id) AS doc_id FROM docs GROUP BY text),
kept AS (SELECT d.doc_id, d.text FROM docs d JOIN keep k ON k.doc_id = d.doc_id),
hits AS (SELECT doc_id, {hit_cols} FROM kept),
lang AS (SELECT doc_id, {case} AS lang_pred FROM hits),
t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS n_tok,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
         len(regexp_extract_all(text, '{en_pat}')) AS n_stop,
         length(text) AS n_chars
  FROM kept
),
q AS (
  SELECT doc_id,
         round(0.4 * least(n_tok / 100.0, 1.0)
             + 0.3 * least((n_stop * 1.0 / greatest(n_tok, 1)) * 5.0, 1.0)
             + 0.3 * (1.0 - least((n_punct * 1.0 / greatest(n_chars, 1)) * 4.0, 1.0)),
             6) AS quality
  FROM t
)
SELECT k.doc_id, l.lang_pred, q.quality
FROM kept k JOIN lang l ON l.doc_id = k.doc_id JOIN q ON q.doc_id = k.doc_id
WHERE l.lang_pred = 'en' AND q.quality >= 0.35
"""


def _katz_sql(alpha: float, beta: float, iters: int) -> str:
    """Unrolled Katz recurrence over the events transition graph —
    mirrors operators/centrality.katz state-for-state (x0 = β·1)."""
    ctes = [
        f"WITH et AS ({_EVENT_EDGES}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM et WHERE src <> dst),",
        "verts AS MATERIALIZED (SELECT src AS v FROM e UNION SELECT dst FROM e),",
        f"x0 AS MATERIALIZED (SELECT v, CAST({beta} AS DOUBLE) AS s FROM verts)",
    ]
    for i in range(1, iters):
        ctes.append(
            f""",
x{i} AS MATERIALIZED (
  SELECT verts.v, {beta} + {alpha} * coalesce(sum(x{i-1}.s), 0) AS s
  FROM verts LEFT JOIN e ON e.dst = verts.v
  LEFT JOIN x{i-1} ON x{i-1}.v = e.src
  GROUP BY verts.v)"""
        )
    return (
        "\n".join(ctes)
        + f"\nSELECT v AS entity, round(s, 6) AS katz FROM x{iters - 1}"
    )


def _betweenness_sql(depth: int) -> str:
    """Unrolled Brandes: forward levels lev0‥levT (σ path counts, visited
    exclusion), backward dependency CTEs dT‥d1, bc = Σ non-source δ —
    mirrors operators/centrality.betweenness level-for-level."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL}) WHERE src <> dst),",
        "lev0 AS MATERIALIZED (SELECT DISTINCT src AS s, src AS v, CAST(1 AS DOUBLE) AS sig"
        " FROM e WHERE regexp_matches(src, '^c1?[0-9]$')),",
        "vis0 AS MATERIALIZED (SELECT s, v FROM lev0)",
    ]
    for t in range(1, depth + 1):
        parts.append(
            f""",
lev{t} AS MATERIALIZED (
  SELECT lev{t-1}.s, e.dst AS v, sum(lev{t-1}.sig) AS sig
  FROM lev{t-1} JOIN e ON e.src = lev{t-1}.v
  WHERE NOT EXISTS (SELECT 1 FROM vis{t-1} x WHERE x.s = lev{t-1}.s AND x.v = e.dst)
  GROUP BY lev{t-1}.s, e.dst),
vis{t} AS MATERIALIZED (SELECT s, v FROM vis{t-1} UNION ALL SELECT s, v FROM lev{t})"""
        )
    parts.append(
        f",\nd{depth} AS MATERIALIZED (SELECT s, v, sig, CAST(0 AS DOUBLE) AS delta FROM lev{depth})"
    )
    for t in range(depth - 1, 0, -1):
        parts.append(
            f""",
d{t} AS MATERIALIZED (
  SELECT lev{t}.s, lev{t}.v, lev{t}.sig,
         coalesce(sum(lev{t}.sig / d{t+1}.sig * (1 + d{t+1}.delta)), 0) AS delta
  FROM lev{t} LEFT JOIN e ON e.src = lev{t}.v
  LEFT JOIN d{t+1} ON d{t+1}.s = lev{t}.s AND d{t+1}.v = e.dst
  GROUP BY lev{t}.s, lev{t}.v, lev{t}.sig)"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT v, delta FROM d{t}" for t in range(1, depth + 1)
    )
    return (
        "\n".join(parts)
        + f"\nSELECT v, round(sum(delta), 6) AS bc FROM ({union}) GROUP BY v"
    )


def _walk_sql(steps: int, seed: int) -> str:
    """Unrolled hash-argmin walk oracle: per step, join the current
    frontier to the edge table, 60-bit md5('walk_id#step#dst#seed') each
    candidate, keep the (hash, dst)-min row per walk — the exact rule of
    operators/walks.deterministic_walks with md5_walk_hash."""
    parts = [
        f"WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),",
        "w0 AS (SELECT DISTINCT src AS walk_id, src AS v FROM e"
        " WHERE regexp_matches(src, '^c[0-9]{1,2}$'))",
    ]
    for t in range(1, steps + 1):
        parts.append(
            f""",
s{t} AS (
  SELECT w{t-1}.walk_id, e.dst AS v,
         CAST(concat('0x', substr(md5(concat_ws('#', w{t-1}.walk_id, '{t}', e.dst, '{seed}')), 1, 15)) AS BIGINT) AS h
  FROM w{t-1} JOIN e ON e.src = w{t-1}.v),
w{t} AS (SELECT walk_id, v FROM (
  SELECT walk_id, v, row_number() OVER (PARTITION BY walk_id ORDER BY h, v) AS rn
  FROM s{t}) WHERE rn = 1)"""
        )
    sel = "\nUNION ALL ".join(
        f"SELECT walk_id, {t} AS step, v FROM w{t}" for t in range(steps + 1)
    )
    return "\n".join(parts) + "\n" + sel


def _coreness_sql(rounds: int) -> str:
    """Unrolled h-index coreness iteration (centrality.coreness contract):
    c0 = degree on the undirected simple entity graph; each stage t is
    c_t(v) = max over desc-ranked neighbor values of min(value, rank) —
    the per-vertex h-index — exactly the operator's per-round window."""
    stages = []
    for t in range(1, rounds + 1):
        stages.append(
            f"""c{t} AS MATERIALIZED (
  SELECT src AS v, max(least(nc, rn)) AS c FROM (
    SELECT u.src, p.c AS nc,
           row_number() OVER (PARTITION BY u.src ORDER BY p.c DESC, u.dst) AS rn
    FROM und u JOIN c{t - 1} p ON p.v = u.dst) s
  GROUP BY src
)"""
        )
    body = ",\n".join(stages)
    return f"""
WITH be AS MATERIALIZED ({ENTITY_EDGES_SQL}),
simple AS MATERIALIZED (SELECT DISTINCT src, dst FROM be WHERE src <> dst),
und AS MATERIALIZED (SELECT src, dst FROM simple UNION SELECT dst, src FROM simple),
c0 AS MATERIALIZED (SELECT src AS v, count(*) AS c FROM und GROUP BY src),
{body}
SELECT v, c AS coreness FROM c{rounds}
"""


def _louvain_sql(rounds: int) -> str:
    """Unrolled synchronized-move Louvain (components.louvain_moves
    contract): per round — neighbor-community counts k(v,c), community
    degree sums Σtot, exact-integer score 2m·k − d·(Σtot − [cc=cur]·d),
    direction-gated candidates (even rounds cc < cur, odd cc > cur),
    strict-improvement move with (score DESC, cc ASC) tie-break."""
    parts = [
        f"""WITH ev AS ({_EVENT_EDGES}),
simple AS (SELECT DISTINCT src, dst FROM ev WHERE src <> dst),
und AS MATERIALIZED (SELECT src, dst FROM simple UNION SELECT dst, src FROM simple),
twom AS (SELECT count(*) AS tm FROM und),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM und GROUP BY src),
c0 AS MATERIALIZED (SELECT v, v AS c FROM deg)"""
    ]
    for t in range(rounds):
        op = "<" if t % 2 == 0 else ">"
        parts.append(
            f"""k{t} AS (
  SELECT u.src AS v, c.c AS cc, count(*) AS k
  FROM und u JOIN c{t} c ON c.v = u.dst GROUP BY u.src, c.c),
kk{t} AS (
  SELECT v, cc, max(k) AS k FROM (
    SELECT v, cc, k FROM k{t}
    UNION ALL SELECT v, c AS cc, 0 AS k FROM c{t}
  ) GROUP BY v, cc),
st{t} AS (SELECT c.c AS cc, CAST(sum(deg.d) AS BIGINT) AS stot
          FROM c{t} c JOIN deg ON deg.v = c.v GROUP BY c.c),
cand{t} AS (
  SELECT q.v, q.cc, cur.c AS curc,
         (SELECT tm FROM twom) * q.k
           - deg.d * (st.stot - CASE WHEN q.cc = cur.c THEN deg.d ELSE 0 END)
           AS score
  FROM kk{t} q
  JOIN c{t} cur ON cur.v = q.v
  JOIN st{t} st ON st.cc = q.cc
  JOIN deg ON deg.v = q.v
  WHERE q.cc = cur.c OR q.cc {op} cur.c),
best{t} AS (
  SELECT v, cc, curc, score,
         row_number() OVER (PARTITION BY v ORDER BY score DESC, cc ASC) AS rn
  FROM cand{t}),
c{t + 1} AS MATERIALIZED (
  SELECT b.v, CASE WHEN b.score > s.score THEN b.cc ELSE b.curc END AS c
  FROM best{t} b
  JOIN (SELECT v, score FROM cand{t} WHERE cc = curc) s ON s.v = b.v
  WHERE b.rn = 1)"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT v, c AS community FROM c{rounds}"
    )


_MIS_PRELUDE = f"""WITH ev AS ({{ev}}),
simple AS (SELECT DISTINCT src, dst FROM ev WHERE src <> dst),
und AS MATERIALIZED (SELECT src, dst FROM simple UNION SELECT dst, src FROM simple),
live0 AS MATERIALIZED (
  SELECT src AS v, CAST(concat('0x', substr(md5(src), 1, 15)) AS BIGINT) AS h
  FROM und GROUP BY src)"""


def _luby_rounds_sql(rounds: int, color: bool) -> str:
    """Unrolled Luby/Jones–Plassmann rounds (graph.maximal_independent_set
    / jp_coloring contract): per round the live-subgraph neighbor minimum
    of (hash, id), winners = local minima (tuple comparison — the same
    struct ordering the Spark loop uses), then winners (+ neighbors, MIS
    only) leave the live set.  Extra rounds past convergence are no-ops,
    so any unroll ≥ the actual round count is exact."""
    parts = [_MIS_PRELUDE.format(ev=_EVENT_EDGES)]
    for r in range(rounds):
        remove = (
            f"win{r}"
            if color
            else f"""(SELECT v FROM win{r}
       UNION SELECT u.dst AS v FROM und u JOIN win{r} w ON w.v = u.src)"""
        )
        parts.append(
            f"""el{r} AS (
  SELECT u.src, u.dst FROM und u
  JOIN live{r} a ON a.v = u.src JOIN live{r} b ON b.v = u.dst),
nm{r} AS (
  SELECT v, mnh, mdst FROM (
    SELECT e.src AS v, l.h AS mnh, e.dst AS mdst,
           row_number() OVER (PARTITION BY e.src ORDER BY l.h, e.dst) AS rn
    FROM el{r} e JOIN live{r} l ON l.v = e.dst) s WHERE rn = 1),
win{r} AS MATERIALIZED (
  SELECT l.v FROM live{r} l LEFT JOIN nm{r} m ON m.v = l.v
  WHERE m.v IS NULL OR (l.h, l.v) < (m.mnh, m.mdst)),
live{r + 1} AS MATERIALIZED (
  SELECT l.v, l.h FROM live{r} l
  WHERE l.v NOT IN (SELECT v FROM {remove}))"""
        )
    if color:
        union = "\nUNION ALL ".join(
            f"SELECT v, {r} AS color FROM win{r}" for r in range(rounds)
        )
        return ",\n".join(parts) + f"\nSELECT v, CAST(color AS INTEGER) AS color FROM ({union}) w"
    union = "\nUNION ALL ".join(f"SELECT v FROM win{r}" for r in range(rounds))
    return (
        ",\n".join(parts)
        + f""",
mis AS ({union})
SELECT l.v, l.v IN (SELECT v FROM mis) AS mis FROM live0 l"""
    )


def _matching_rounds_sql(rounds: int) -> str:
    """Unrolled greedy maximal-matching rounds (graph.maximal_matching
    contract): per round, over the LIVE canonical edge set, an edge is
    matched iff its (md5-hash, src, dst) key is the minimum among live
    edges at BOTH endpoints (row_number replay of the struct-min the
    Spark loop aggregates); both matched endpoints then leave.  Extra
    unrolled rounds past convergence are no-ops, so any unroll ≥ the
    actual round count is exact."""
    parts = [
        f"""WITH ev AS ({_EVENT_EDGES}),
simple AS (SELECT DISTINCT src, dst FROM ev WHERE src <> dst),
canon AS MATERIALIZED (
  SELECT src, dst,
         CAST(concat('0x', substr(md5(src || '|' || dst), 1, 15)) AS BIGINT) AS h
  FROM (SELECT DISTINCT least(src, dst) AS src, greatest(src, dst) AS dst
        FROM simple)),
live0 AS MATERIALIZED (SELECT src, dst, h FROM canon)"""
    ]
    for r in range(rounds):
        parts.append(
            f"""inc{r} AS (
  SELECT src AS v, h, src, dst FROM live{r}
  UNION ALL SELECT dst AS v, h, src, dst FROM live{r}),
vm{r} AS (
  SELECT v, h, src, dst FROM (
    SELECT v, h, src, dst,
           row_number() OVER (PARTITION BY v ORDER BY h, src, dst) AS rn
    FROM inc{r}) s WHERE rn = 1),
win{r} AS MATERIALIZED (
  SELECT l.src, l.dst FROM live{r} l
  JOIN vm{r} a ON a.v = l.src AND a.h = l.h AND a.src = l.src AND a.dst = l.dst
  JOIN vm{r} b ON b.v = l.dst AND b.h = l.h AND b.src = l.src AND b.dst = l.dst),
live{r + 1} AS MATERIALIZED (
  SELECT l.src, l.dst, l.h FROM live{r} l
  WHERE l.src NOT IN (SELECT src FROM win{r} UNION SELECT dst FROM win{r})
    AND l.dst NOT IN (SELECT src FROM win{r} UNION SELECT dst FROM win{r}))"""
        )
    union = "\nUNION ALL ".join(
        f"SELECT src, dst FROM win{r}" for r in range(rounds)
    )
    return (
        ",\n".join(parts)
        + f""",
m AS ({union})
SELECT c.src, c.dst, (m.src IS NOT NULL) AS matched
FROM canon c LEFT JOIN m ON m.src = c.src AND m.dst = c.dst"""
    )


def _distance_distribution_sql(rounds: int, k: int) -> str:
    """Exact twin of webgraph.distance_distribution: bounded min-dist
    closure → per-(t, v) KMV register (k smallest md5 hashes of the true
    ≤t-hop ball) → per-vertex estimate floored to milli-units → BIGINT
    sums, so the comparison needs no float-sum tolerance."""
    return f"""
WITH RECURSIVE e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
),
reach(v, u, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT r.v, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.u WHERE r.d < {rounds}
),
rd AS MATERIALIZED (SELECT v, u, min(d) AS d FROM reach GROUP BY v, u),
h AS MATERIALIZED (
  SELECT v, d, CAST(concat('0x', substr(md5(u), 1, 15)) AS BIGINT) AS h FROM rd
),
ts AS (SELECT unnest(range(0, {rounds} + 1)) AS t),
ranked AS (
  SELECT ts.t, h.v, h.h,
         row_number() OVER (PARTITION BY ts.t, h.v ORDER BY h.h) AS rn
  FROM ts JOIN h ON h.d <= ts.t
),
agg AS (
  SELECT t, v, count(*) AS n_sketch, max(h) AS kth
  FROM ranked WHERE rn <= {k} GROUP BY t, v
),
est AS (
  SELECT t, n_sketch,
         CASE WHEN n_sketch < {k} THEN CAST(n_sketch AS DOUBLE)
              ELSE {k - 1}.0 * 1152921504606846976 / kth END AS e
  FROM agg
)
SELECT t, count(*) AS n_vertices,
       CAST(sum(CASE WHEN n_sketch >= {k} THEN 1 ELSE 0 END) AS BIGINT) AS n_saturated,
       CAST(sum(CAST(floor(e * 1000.0) AS BIGINT)) AS BIGINT) AS pairs_milli
FROM est GROUP BY t
"""


def _rich_club_sql(max_k: int) -> str:
    """Direct threshold-count twin of webgraph.rich_club over the
    undirected simple entity graph."""
    return f"""
WITH e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
e AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
nd AS MATERIALIZED (
  SELECT v, count(*) AS d
  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
),
ks AS (SELECT unnest(range(1, {max_k} + 1)) AS k),
n_k AS (SELECT ks.k, count(*) AS n_nodes FROM ks JOIN nd ON nd.d > ks.k GROUP BY ks.k),
em AS MATERIALIZED (
  SELECT least(da.d, db.d) AS m
  FROM e JOIN nd da ON da.v = e.a JOIN nd db ON db.v = e.b
),
e_k AS (SELECT ks.k, count(*) AS n_edges FROM ks JOIN em ON em.m > ks.k GROUP BY ks.k)
SELECT n_k.k, n_nodes, COALESCE(n_edges, 0) AS n_edges,
       2.0 * COALESCE(n_edges, 0) / (n_nodes * (n_nodes - 1.0)) AS phi
FROM n_k LEFT JOIN e_k ON e_k.k = n_k.k
WHERE n_nodes >= 2
"""


def _seeded_lpa_sql(rounds: int) -> str:
    """Unrolled NULL-aware seeded LPA over the entity graph: seeds
    (suppliers → their nation) clamped every round; winners computed only
    from labeled sources; the literal capped sequence of
    components.seeded_label_propagation."""
    ctes = [
        f"edges AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL}))",
        "und AS MATERIALIZED (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges)",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS v FROM und)",
        "seeds AS MATERIALIZED ("
        "SELECT 's' || s_suppkey AS v, min('n' || s_nationkey) AS lab "
        "FROM supplier GROUP BY 1)",
        "l0 AS (SELECT verts.v, seeds.lab FROM verts LEFT JOIN seeds ON seeds.v = verts.v)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT verts.v,
         CASE WHEN s.lab IS NOT NULL THEN s.lab
              ELSE coalesce(w.lab, p0.lab) END AS lab
  FROM verts
  JOIN l{i-1} p0 ON p0.v = verts.v
  LEFT JOIN seeds s ON s.v = verts.v
  LEFT JOIN (
    SELECT u.dst AS v, p.lab,
           ROW_NUMBER() OVER (PARTITION BY u.dst ORDER BY count(*) DESC, p.lab ASC) AS rn
    FROM und u JOIN l{i-1} p ON p.v = u.src AND p.lab IS NOT NULL
    GROUP BY u.dst, p.lab
  ) w ON w.v = verts.v AND w.rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v AS entity, lab AS label FROM l{rounds}"
    )


def _dedup_best_sql() -> str:
    """Twin of q_dedup_best: punctuation-degraded injected corpus →
    exact-Jaccard pairs → recursive-CTE closure → per-cluster argmax
    (round(quality·10⁶) DESC, doc_id ASC) with window rank."""
    en_pat = r"(?i)\b(" + "|".join(STOPWORDS["en"]) + r")\b"
    return rf"""
WITH RECURSIVE corpus AS MATERIALIZED (
  SELECT doc_id, text FROM documents WHERE doc_id < 200
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' !!!!!!!!!!' AS text
  FROM documents WHERE doc_id < 200
),
sh AS MATERIALIZED (
  SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 1) + 1),
      i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i+2), ' ')
  ))) AS s
  FROM corpus
),
sizes AS (SELECT doc_id AS id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.id = id_a
  JOIN sizes sb ON sb.id = id_b
  WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
),
und AS (SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs),
cverts AS (SELECT DISTINCT s AS v FROM und),
reach(v, r) AS (
  SELECT v, v FROM cverts
  UNION
  SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.v
),
cl AS (SELECT v AS doc_id, min(r) AS keeper_id FROM reach GROUP BY v),
q AS (
  SELECT doc_id,
         CAST(round((0.4 * least(len(regexp_extract_all(text, '\S+')) / 100.0, 1.0)
           + 0.3 * least((len(regexp_extract_all(text, '{en_pat}')) * 1.0
                          / greatest(len(regexp_extract_all(text, '\S+')), 1)) * 5.0, 1.0)
           + 0.3 * (1.0 - least((len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) * 1.0
                                 / greatest(length(text), 1)) * 4.0, 1.0))) * 1000000)
              AS BIGINT) AS q_key
  FROM corpus
),
member AS (
  SELECT COALESCE(cl.keeper_id, q.doc_id) AS cluster_id, q.doc_id, q.q_key
  FROM q LEFT JOIN cl ON cl.doc_id = q.doc_id
),
ranked AS (
  SELECT cluster_id, doc_id, q_key,
         row_number() OVER (PARTITION BY cluster_id ORDER BY q_key DESC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM member
)
SELECT cluster_id, doc_id AS rep_id, q_key AS rep_q_key, n_members
FROM ranked WHERE rn = 1
"""


def oracle_sql() -> dict[str, str]:
    en_pat = r"(?i)\b(" + "|".join(STOPWORDS["en"]) + r")\b"
    return {
        "entity_edges": ENTITY_EDGES_SQL,
        "temporal_edges": _EVENT_EDGES,
        "out_degrees": f"SELECT src AS entity, count(*) AS outdeg FROM ({ENTITY_EDGES_SQL}) GROUP BY src",
        "in_degrees": f"SELECT dst AS entity, count(*) AS indeg FROM ({ENTITY_EDGES_SQL}) GROUP BY dst",
        "graph_summary": f"""
WITH {_GRAPH_CTES.strip()}
SELECT (SELECT n FROM nn) AS n_vertices,
       (SELECT count(*) FROM base_edges) AS n_edges_raw,
       (SELECT count(*) FROM edges) AS n_edges_selflooped,
       (SELECT count(*) FROM edges WHERE src = dst) AS n_selfloops
""",
        "transpose": f"SELECT dst AS src, src AS dst FROM ({ENTITY_EDGES_SQL})",
        "symmetrize": f"""
WITH e AS ({ENTITY_EDGES_SQL})
SELECT src, dst FROM e UNION SELECT dst, src FROM e
""",
        "tidy_batch": f"""
WITH et AS ({_EVENT_EDGES}),
cut AS (SELECT cast(floor(0.9 * count(*)) AS bigint) AS c FROM et),
base AS (SELECT DISTINCT src, dst FROM et WHERE seq < (SELECT c FROM cut)),
ins_raw AS (SELECT DISTINCT src, dst FROM et WHERE seq >= (SELECT c FROM cut)),
del_raw AS (SELECT DISTINCT src, dst FROM et
            WHERE seq < (SELECT c FROM cut) AND seq % 13 = 0)
SELECT 'del' AS op, src, dst FROM del_raw
 WHERE (src, dst) IN (SELECT (src, dst) FROM base)
UNION ALL
SELECT 'ins' AS op, src, dst FROM ins_raw
 WHERE (src, dst) NOT IN (SELECT (src, dst) FROM base)
""",
        "apply_batch_count": f"""
WITH et AS ({_EVENT_EDGES}),
cut AS (SELECT cast(floor(0.9 * count(*)) AS bigint) AS c FROM et),
base AS (SELECT DISTINCT src, dst FROM et WHERE seq < (SELECT c FROM cut)),
ins_raw AS (SELECT DISTINCT src, dst FROM et WHERE seq >= (SELECT c FROM cut)),
del_raw AS (SELECT DISTINCT src, dst FROM et
            WHERE seq < (SELECT c FROM cut) AND seq % 13 = 0),
dels AS (SELECT src, dst FROM del_raw WHERE (src, dst) IN (SELECT (src, dst) FROM base)),
ins AS (SELECT src, dst FROM ins_raw WHERE (src, dst) NOT IN (SELECT (src, dst) FROM base)),
after AS (
  SELECT src, dst FROM base WHERE (src, dst) NOT IN (SELECT (src, dst) FROM dels)
  UNION
  SELECT src, dst FROM ins
)
SELECT count(*) AS n_edges_after FROM after
""",
        "pagerank_1iter": _pr_sql(1),
        "pagerank_20iters": _pr_sql(20),
        "pagerank_top20": _pr_sql(20) + " ORDER BY round(rank, 6) DESC, v ASC LIMIT 20",
        # converged ranks pinned at 6 dp: an 80-iteration unrolled CTE is
        # within ~1e-12 of the 1e-10-L∞ fixpoint the Spark loop reaches, so
        # both sides round identically (boundary-collision odds ~1e-3)
        "pagerank_converged": _pr_sql(80),
        "pagerank_weighted": _wpr_sql(10),
        "pagerank_weighted_tcp": _wpr_sql(10),
        "pagerank_time_decay": _decay_wpr_sql(10),
        "triangles": f"""
WITH e0 AS MATERIALIZED ({ENTITY_EDGES_SQL}),
und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
e AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)
SELECT count(*) AS n_triangles
FROM e ab JOIN e bc ON ab.dst = bc.src
WHERE EXISTS (SELECT 1 FROM e ac WHERE ac.src = ab.src AND ac.dst = bc.dst)
""",
        "connected_components": f"""
WITH RECURSIVE et AS ({_EVENT_EDGES}),
edges AS (SELECT DISTINCT src, dst FROM et),
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT src AS v FROM und),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.v
)
SELECT v, min(r) AS component FROM reach GROUP BY v
""",
        "cc_sizes": f"""
WITH RECURSIVE et AS ({_EVENT_EDGES}),
edges AS (SELECT DISTINCT src, dst FROM et),
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT src AS v FROM und),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.v
),
comp AS (SELECT v, min(r) AS component FROM reach GROUP BY v)
SELECT component, count(*) AS size FROM comp GROUP BY component
""",
        "subgraph_filter": f"""
SELECT src, dst FROM ({ENTITY_EDGES_SQL})
WHERE src LIKE 'c%' AND dst LIKE 'p%'
""",
        "degree_histogram": f"""
WITH deg AS (
  SELECT src, count(*) AS outdeg FROM ({ENTITY_EDGES_SQL}) GROUP BY src
)
SELECT outdeg, count(*) AS n_vertices FROM deg GROUP BY outdeg
""",
        "l1_norm_1iter": _pr_sql(1).replace(
            "SELECT v AS entity, round(rank, 6) AS rank FROM r1",
            "SELECT round(sum(abs(round(rank, 6) - 1.0/(SELECT n FROM nn))), 6) AS l1 FROM r1",
        ),
        "l2_norm_1iter": _pr_sql(1).replace(
            "SELECT v AS entity, round(rank, 6) AS rank FROM r1",
            "SELECT round(sqrt(sum(pow(round(rank, 6) - 1.0/(SELECT n FROM nn), 2))), 6) AS l2 FROM r1",
        ),
        "bfs_reachable": f"""
WITH RECURSIVE e AS MATERIALIZED ({ENTITY_EDGES_SQL}),
reach(v) AS (
  SELECT 'c1'
  UNION
  SELECT e.dst FROM reach JOIN e ON e.src = reach.v
)
SELECT v FROM reach
""",
        "modularity_cc": f"""
WITH RECURSIVE et AS ({_EVENT_EDGES}),
edges AS (SELECT DISTINCT src, dst FROM et),
und0 AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT src AS v FROM und0),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, reach.r FROM reach JOIN und0 u ON u.src = reach.v
),
comp AS (SELECT v, min(r) AS community FROM reach GROUP BY v),
und AS (SELECT src, dst FROM und0 WHERE src <> dst),
lab AS (
  SELECT cs.community AS c_src, cd.community AS c_dst
  FROM und JOIN comp cs ON cs.v = und.src JOIN comp cd ON cd.v = und.dst
),
two_m AS (SELECT count(*) AS m2 FROM lab),
per_c AS (
  SELECT c_src, count(*) AS deg_sum,
         sum(CASE WHEN c_src = c_dst THEN 1 ELSE 0 END) AS internal
  FROM lab GROUP BY c_src
)
SELECT round(sum(internal * 1.0 / (SELECT m2 FROM two_m)
         - pow(deg_sum * 1.0 / (SELECT m2 FROM two_m), 2)), 6) AS modularity
FROM per_c
""",
        "lpa": _lpa_sql(10),
        "dedup_exact": """
SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
FROM documents GROUP BY text HAVING count(*) > 1
""",
        "dedup_exact_injected": """
WITH doubled AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents
)
SELECT min(doc_id) AS keeper_id, count(*) AS n_copies
FROM doubled GROUP BY text HAVING count(*) > 1
""",
        "fingerprints": """
SELECT doc_id,
       array_to_string(list_sort(list_distinct(
           regexp_extract_all(lower(text), '[a-z0-9]+'))), ' ') AS fingerprint
FROM documents
""",
        "token_stats": rf"""
SELECT doc_id,
       length(text) AS n_chars,
       len(regexp_extract_all(text, '\S+')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{BPE_ISH_RE}')) AS n_bpe_tokens
FROM documents
""",
        "quality_score": rf"""
WITH t AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '\S+')) AS n_tok,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
         len(regexp_extract_all(text, '{en_pat}')) AS n_stop,
         length(text) AS n_chars
  FROM documents
)
SELECT doc_id,
       round(0.4 * least(n_tok / 100.0, 1.0)
           + 0.3 * least((n_stop * 1.0 / greatest(n_tok, 1)) * 5.0, 1.0)
           + 0.3 * (1.0 - least((n_punct * 1.0 / greatest(n_chars, 1)) * 4.0, 1.0)),
           6) AS quality
FROM t
""",
        "language_id": _lang_sql(),
        "text_scrub": _text_scrub_sql(),
        "doc_chunks": _doc_chunks_sql(32, 8),
        "decontamination": _decontamination_sql(0.5),
        "repetition_stats": f"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT 999999, '{_SPAM_TEXT}'
),
t AS (
  SELECT doc_id,
         regexp_split_to_array(trim(text), '\\s+') AS toks,
         string_split(text, chr(10)) AS lines
  FROM aug
),
base AS (
  SELECT doc_id,
         round(1.0 - len(list_distinct(lines)) * 1.0 / greatest(len(lines), 1), 6) AS dup_line_frac,
         round(1.0 - len(list_distinct(toks)) * 1.0 / greatest(len(toks), 1), 6) AS dup_token_frac,
         len(toks) AS n
  FROM t
),
bg AS (
  SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS b
  FROM t, unnest(range(1, greatest(len(toks), 1))) AS u(i)
),
top AS (
  SELECT doc_id, max(c) AS top_bg
  FROM (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY doc_id, b)
  GROUP BY doc_id
)
SELECT base.doc_id, dup_line_frac, dup_token_frac,
       round(coalesce(top_bg, 0) * 2.0 / greatest(n, 1), 6) AS top_bigram_frac
FROM base LEFT JOIN top ON base.doc_id = top.doc_id
""",
        "tfidf_keywords": """
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n FROM documents),
s AS (
  SELECT doc_id, term,
         tf * ln((SELECT n FROM n) * 1.0 / df) AS score
  FROM tf JOIN df USING (term)
),
r AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM s
)
SELECT doc_id, term, round(score, 6) AS score FROM r WHERE rn <= 5
""",
        "pack_sequences": """
WITH base AS (
  SELECT doc_id,
         CAST((doc_id * 2654435761 + 12345) % 8 AS INT) AS shard,
         CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
  FROM documents
)
SELECT doc_id, shard,
       CAST(floor((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) - n_tokens) / 512) AS BIGINT) AS pack_id,
       n_tokens
FROM base
""",
        "quality_filter": rf"""
WITH t AS (
  SELECT doc_id, lang,
         len(regexp_extract_all(text, '\S+')) AS n_tok,
         len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS n_punct,
         len(regexp_extract_all(text, '{en_pat}')) AS n_stop,
         length(text) AS n_chars
  FROM documents
),
q AS (
  SELECT doc_id, lang,
         round(0.4 * least(n_tok / 100.0, 1.0)
             + 0.3 * least((n_stop * 1.0 / greatest(n_tok, 1)) * 5.0, 1.0)
             + 0.3 * (1.0 - least((n_punct * 1.0 / greatest(n_chars, 1)) * 4.0, 1.0)),
             6) AS quality
  FROM t
),
c AS (
  SELECT doc_id, lang, quality,
         cume_dist() OVER (PARTITION BY lang ORDER BY quality) AS cume
  FROM q
)
SELECT doc_id, lang, quality FROM c WHERE cume > 0.5
""",
        "quantize_embeddings": """
WITH b AS (
  SELECT vec_id AS id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x,
         CAST(list_min(embedding) AS DOUBLE) AS zero,
         (CAST(list_max(embedding) AS DOUBLE)
          - CAST(list_min(embedding) AS DOUBLE)) / 255.0 AS scale
  FROM embeddings)
SELECT id, dim,
       CAST(CASE WHEN scale > 0
                 THEN floor((x - zero) / scale + 0.5) ELSE 0 END AS INTEGER) AS q,
       round(zero, 6) AS zero, round(scale, 6) AS scale
FROM b
""",
        "temperature_mix": f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents
           WHERE lang IS NOT NULL GROUP BY lang),
mn AS (SELECT min(n) AS n0 FROM c),
r AS (SELECT c.lang, pow(CAST(mn.n0 AS DOUBLE) / c.n, 0.5) AS rate FROM c, mn)
SELECT d.doc_id, d.lang
FROM documents d JOIN r ON r.lang = d.lang
WHERE {_MIX_SQL} < r.rate * 1000000
""",
        "stratified_sample": f"""
SELECT doc_id, lang FROM documents
WHERE {_MIX_SQL} < CASE lang WHEN 'en' THEN 1000000
                             WHEN 'de' THEN 300000 ELSE 0 END
""",
        "split_corpus": f"""
SELECT doc_id,
       CASE WHEN {_MIX_SQL} < 100000 THEN 'val'
            WHEN {_MIX_SQL} < 200000 THEN 'test'
            ELSE 'train' END AS split
FROM documents
""",
        "dedup_clusters": _dedup_clusters_sql(),
        "corpus_filter": _corpus_filter_sql(),
        "ngram_jaccard": f"""
WITH sh AS ({_SHINGLES}),
sizes AS (SELECT doc_id AS id, count(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       round(i * 1.0 / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.id = id_a
JOIN sizes sb ON sb.id = id_b
WHERE i * 1.0 / (sa.sz + sb.sz - i) >= 0.5
""",
        "cosine_pairs": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE a.vec_id < 400 AND b.vec_id < 400
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
""",
        "embedding_dup_clusters": """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE a.vec_id < 400 AND b.vec_id < 400
    AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.35
),
und AS (SELECT id_a AS s, id_b AS d FROM pairs UNION SELECT id_b, id_a FROM pairs),
verts AS (SELECT DISTINCT s AS v FROM und),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.d, reach.r FROM reach JOIN und u ON u.s = reach.v
)
SELECT v AS vec_id, min(r) AS keeper_id FROM reach GROUP BY v
""",
        "embedding_topk": """
WITH sims AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
  WHERE a.vec_id < 500 AND b.vec_id < 500
),
rk AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rn
  FROM sims
)
SELECT query_id, neighbor_id FROM rk WHERE rn <= 5
""",
        "connected_components_pj": f"""
WITH RECURSIVE et AS ({_EVENT_EDGES}),
edges AS (SELECT DISTINCT src, dst FROM et),
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT src AS v FROM und),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.v
)
SELECT v, min(r) AS component FROM reach GROUP BY v
""",
        "minhash_verified": _jaccard_pairs_sql(300, 0.5),
        # full reimplementation of the banded-LSH candidate pipeline on the
        # md5 cross-engine hash: 32 seeded minhashes, 8 bands of 4, pairs
        # sharing any band (band-key hashing on the Spark side is a pure
        # bucketing detail — equal slices ⇔ equal keys)
        "minhash_candidates": """
WITH sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
      range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 1) + 1),
      i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i+2), ' ')
  ))) AS s
  FROM documents WHERE doc_id < 300
),
mh AS (
  SELECT doc_id, j,
         min(CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), '#', s)), 1, 15)) AS BIGINT)) AS h
  FROM sh, range(32) r(j) GROUP BY doc_id, j
),
band AS (
  SELECT doc_id, CAST(j // 4 AS INTEGER) AS b,
         list(h ORDER BY j) AS slice
  FROM mh GROUP BY doc_id, CAST(j // 4 AS INTEGER)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
  FROM band a JOIN band c ON a.b = c.b AND a.slice = c.slice AND a.doc_id < c.doc_id
)
SELECT id_a, id_b FROM cand
""",
        # full simhash recomputation in SQL: per-occurrence 60-bit md5 token
        # hashes (bits 60–63 of the 64-bit kernel are vote-negative zeros),
        # per-bit majority votes, then exhaustive hamming ≤ 8 pairs —
        # matches the banded Spark query because banding recall is exact
        "simhash_pairs": """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM documents WHERE doc_id < 300
),
h AS (SELECT doc_id, CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS hv FROM tok),
bits AS (
  SELECT doc_id, k, SUM(CASE WHEN (hv >> k) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM h, range(60) r(k) GROUP BY doc_id, k
),
sim AS (
  SELECT doc_id, SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << CAST(k AS INTEGER)) ELSE 0 END) AS sh
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 8
""",
        "token_vocabulary": """
WITH t AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
)
SELECT token, count(*) AS tf, count(DISTINCT doc_id) AS df
FROM t GROUP BY token ORDER BY tf DESC, token ASC LIMIT 200
""",
        "line_dedup": """
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 2 = 0
              THEN text || chr(10) || 'subscribe to our newsletter today'
                        || chr(10) || 'copyright example corp 2026'
              ELSE text END AS text
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM injected
),
keyed AS (
  SELECT doc_id, pos, line,
         CASE WHEN len(trim(lower(line))) >= 5
              THEN md5(trim(lower(line))) END AS lkey
  FROM lines
),
hot AS (
  SELECT lkey FROM keyed WHERE lkey IS NOT NULL
  GROUP BY lkey HAVING count(DISTINCT doc_id) > 1
),
kept AS (
  SELECT k.* FROM keyed k LEFT JOIN hot h ON k.lkey = h.lkey
  WHERE h.lkey IS NULL
),
reass AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id, coalesce(r.text, '') AS text
FROM documents d LEFT JOIN reass r ON d.doc_id = r.doc_id
""",
        "session_stats": """
WITH s AS (
  SELECT user_id, event_id, ts, event_type, epoch_us(ts) AS ts_us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_us
  FROM events
),
s2 AS (
  SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800 * 1000000
                 THEN 1 ELSE 0 END AS new_sess
  FROM s
),
s3 AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM s2
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       min(ts_us) AS t_start_us, max(ts_us) AS t_end_us,
       round((max(ts_us) - min(ts_us)) / 1000000.0, 6) AS duration_sec,
       count(DISTINCT event_type) AS n_event_types
FROM s3 GROUP BY user_id, session_seq
""",
        "asof_join": """
WITH l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
r AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us,
       round(r.value, 6) AS value_asof
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
""",
        "hits": _hits_sql(20),
        "salsa": _salsa_sql(20),
        "k_truss": _k_truss_sql(12, 6),
        "ppr_suppliers": _ppr_sql(30),
        "k_core_30": _kcore_sql(30, 6),
        # SCC ≡ mutual reachability: scc(v) = min u with v→*u and u→*v
        # (self-loops dropped for propagation; loop endpoints stay vertices)
        "scc": f"""
WITH RECURSIVE et AS ({_EVENT_EDGES}),
ed AS (SELECT DISTINCT src, dst FROM et),
verts AS (SELECT src AS v FROM ed UNION SELECT dst FROM ed),
e AS (SELECT src, dst FROM ed WHERE src <> dst),
reach(a, b) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
)
SELECT r1.a AS entity, min(r1.b) AS scc
FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
GROUP BY r1.a
""",
        "link_pred_copurchase": f"""
WITH be AS MATERIALIZED ({ENTITY_EDGES_SQL}),
cp AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM be
  WHERE src LIKE 'c%' AND dst LIKE 'p%'),
outdeg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM cp GROUP BY src),
indeg AS MATERIALIZED (SELECT dst, count(*) AS d FROM cp GROUP BY dst),
pairs AS MATERIALIZED (
  SELECT a.src AS a, b.src AS b, count(*) AS cn,
         sum(1.0 / ln(i.d)) AS aa
  FROM cp a JOIN cp b ON a.dst = b.dst AND a.src < b.src
  JOIN indeg i ON i.dst = a.dst
  GROUP BY a.src, b.src
  HAVING count(*) >= 4)
SELECT p.a, p.b, p.cn,
       round(p.cn * 1.0 / (da.d + db.d - p.cn), 6) AS jaccard,
       round(p.aa, 6) AS adamic_adar
FROM pairs p
JOIN outdeg da ON da.v = p.a
JOIN outdeg db ON db.v = p.b
""",
        "multi_source_distances": f"""
WITH RECURSIVE e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
reach(s, v, dist) AS (
  SELECT s, s, 0 FROM (VALUES ('c1'), ('c2'), ('c3')) seeds(s)
  UNION
  SELECT reach.s, e.dst, reach.dist + 1 FROM reach JOIN e ON e.src = reach.v)
SELECT s, v, min(dist) AS dist FROM reach GROUP BY s, v
""",
        "harmonic_centrality": f"""
WITH RECURSIVE e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
srcs AS MATERIALIZED (
  SELECT DISTINCT src AS s FROM e WHERE regexp_matches(src, '^c[0-9]{{1,2}}$')),
reach(s, v, dist) AS (
  SELECT s, s, 0 FROM srcs
  UNION
  SELECT reach.s, e.dst, reach.dist + 1 FROM reach JOIN e ON e.src = reach.v),
md AS (SELECT s, v, min(dist) AS d FROM reach GROUP BY s, v)
SELECT v, round(sum(CAST(1.0 AS DOUBLE) / d), 6) AS harmonic
FROM md WHERE d > 0 GROUP BY v
""",
        "closeness": f"""
WITH RECURSIVE e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
srcs AS MATERIALIZED (
  SELECT DISTINCT src AS s FROM e WHERE regexp_matches(src, '^c[0-9]{{1,2}}$')),
reach(s, v, dist) AS (
  SELECT s, s, 0 FROM srcs
  UNION
  SELECT reach.s, e.dst, reach.dist + 1 FROM reach JOIN e ON e.src = reach.v),
md AS (SELECT s, v, min(dist) AS d FROM reach GROUP BY s, v)
SELECT v, count(*) AS n_reached,
       round(CAST(count(*) AS DOUBLE) / sum(d), 6) AS closeness
FROM md WHERE d > 0 GROUP BY v
""",
        "eigenvector_20": _eigen_sql(20),
        "walk_corpus": _walk_sql(4, 0),
        "local_clustering": f"""
WITH et AS ({_EVENT_EDGES}),
e0 AS (SELECT DISTINCT src, dst FROM et),
p AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM e0 WHERE src <> dst),
deg AS (SELECT v, count(*) AS d FROM
        (SELECT a AS v FROM p UNION ALL SELECT b FROM p) GROUP BY v),
tri AS (SELECT p1.a AS x, p1.b AS y, p2.b AS z
        FROM p p1 JOIN p p2 ON p2.a = p1.b
        JOIN p p3 ON p3.a = p1.a AND p3.b = p2.b),
credit AS (SELECT v, count(*) AS tri FROM
           (SELECT x AS v FROM tri UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri) GROUP BY v)
SELECT deg.v AS entity, deg.d, coalesce(credit.tri, 0) AS tri,
       round(CASE WHEN deg.d >= 2
                  THEN 2.0 * coalesce(credit.tri, 0) / (deg.d * (deg.d - 1))
                  ELSE 0.0 END, 6) AS lcc
FROM deg LEFT JOIN credit ON credit.v = deg.v
""",
        "neighbor_sample": f"""
WITH e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
ranked AS (
  SELECT src, dst,
         row_number() OVER (
           PARTITION BY src
           ORDER BY CAST(concat('0x', substr(md5(concat_ws('#', src, '0', dst, '0')), 1, 15)) AS BIGINT), dst
         ) AS pos
  FROM e)
SELECT src, dst, pos FROM ranked WHERE pos <= 3
""",
        "feature_propagation": f"""
WITH et AS ({_EVENT_EDGES}),
e0 AS (SELECT DISTINCT src, dst FROM et),
verts AS (SELECT DISTINCT src AS v FROM e0 UNION SELECT dst FROM e0),
e AS (SELECT src, dst FROM e0 UNION SELECT v, v FROM verts),
vmap AS (SELECT v,
  CAST(concat('0x', substr(md5(v), 1, 15)) AS BIGINT)
    % (SELECT count(*) FROM embeddings) AS vec_id FROM verts),
x0 AS (SELECT vmap.v, generate_subscripts(em.embedding, 1) - 1 AS dim,
              CAST(unnest(em.embedding) AS DOUBLE) AS val
       FROM vmap JOIN embeddings em ON em.vec_id = vmap.vec_id),
x1 AS (SELECT e.dst AS v, dim, avg(val) AS val
       FROM e JOIN x0 ON x0.v = e.src GROUP BY e.dst, dim),
x2 AS (SELECT e.dst AS v, dim, avg(val) AS val
       FROM e JOIN x1 ON x1.v = e.src GROUP BY e.dst, dim)
SELECT v, dim, round(val, 6) AS val FROM x2
""",
        "katz_10": _katz_sql(0.05, 1.0, 10),
        "betweenness": _betweenness_sql(4),
        "reciprocity": f"""
WITH et AS ({_EVENT_EDGES}),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM et WHERE src <> dst),
rec AS (SELECT count(*) AS c FROM e JOIN e r ON r.src = e.dst AND r.dst = e.src),
tot AS (SELECT count(*) AS n FROM e)
SELECT n AS n_edges, c AS n_reciprocal,
       round(CAST(c AS DOUBLE) / n, 6) AS reciprocity
FROM rec, tot
""",
        "assortativity": f"""
WITH be AS MATERIALIZED ({ENTITY_EDGES_SQL}),
und AS MATERIALIZED (
  SELECT src, dst FROM be WHERE src <> dst
  UNION SELECT dst, src FROM be WHERE src <> dst),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM und GROUP BY src),
j AS (SELECT dx.d AS dx, dy.d AS dy
      FROM und JOIN deg dx ON dx.v = und.src JOIN deg dy ON dy.v = und.dst),
mo AS (SELECT count(*) AS m, sum(dx) AS sx, sum(dy) AS sy,
              sum(dx * dy) AS sxy, sum(dx * dx) AS sxx, sum(dy * dy) AS syy
       FROM j)
SELECT m,
       round((CAST(sxy AS DOUBLE) / m - (CAST(sx AS DOUBLE) / m) * (CAST(sy AS DOUBLE) / m))
             / (sqrt(CAST(sxx AS DOUBLE) / m - (CAST(sx AS DOUBLE) / m) * (CAST(sx AS DOUBLE) / m))
                * sqrt(CAST(syy AS DOUBLE) / m - (CAST(sy AS DOUBLE) / m) * (CAST(sy AS DOUBLE) / m))),
             6) AS r
FROM mo
""",
        "avg_neighbor_degree": f"""
WITH be AS MATERIALIZED ({ENTITY_EDGES_SQL}),
und AS MATERIALIZED (
  SELECT src, dst FROM be WHERE src <> dst
  UNION SELECT dst, src FROM be WHERE src <> dst),
deg AS MATERIALIZED (SELECT src AS v, count(*) AS d FROM und GROUP BY src)
SELECT deg.v, deg.d, round(avg(dn.d), 6) AS knn
FROM und JOIN deg ON deg.v = und.src JOIN deg dn ON dn.v = und.dst
GROUP BY deg.v, deg.d
""",
        # dynamic-CC oracle = from-scratch CC of the FULL graph: insertions
        # only merge components, so the incremental result must be
        # indistinguishable from a recompute over base ∪ batch
        "cc_incremental": f"""
WITH RECURSIVE et AS ({_EVENT_EDGES}),
edges AS (SELECT DISTINCT src, dst FROM et),
und AS (SELECT src, dst FROM edges UNION SELECT dst, src FROM edges),
verts AS (SELECT DISTINCT src AS v FROM und),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.v
)
SELECT v, min(r) AS component FROM reach GROUP BY v
""",
        # decremental oracle: closure over SURVIVING directed edges (the md5
        # split mirrors _edge_split_pred(7) exactly), seeded from the FULL
        # original vertex set so vertices isolated by the deletions remain
        "cc_decremental": f"""
WITH RECURSIVE et AS ({_EVENT_EDGES}),
edges AS (SELECT DISTINCT src, dst FROM et),
verts AS (SELECT src AS v FROM edges UNION SELECT dst FROM edges),
keep AS (SELECT src, dst FROM edges
         WHERE CAST(concat('0x', substr(md5(src || '|' || dst), 1, 15)) AS BIGINT) % 7 <> 0),
und AS (SELECT src, dst FROM keep UNION SELECT dst, src FROM keep),
reach(v, r) AS (
  SELECT v, v FROM verts
  UNION
  SELECT u.dst, reach.r FROM reach JOIN und u ON u.src = reach.v
)
SELECT v, min(r) AS component FROM reach GROUP BY v
""",
        # incremental triangle oracle = full-union recount over the EVENT
        # graph (160 triangles at sf0.01 — the entity graph is
        # near-bipartite and triangle-free, which would make the check
        # vacuous): base + delta must equal the recount exactly
        "triangles_incremental": f"""
WITH et AS ({_EVENT_EDGES}),
e0 AS (SELECT DISTINCT src, dst FROM et),
und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
e AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)
SELECT count(*) AS n_triangles
FROM e ab JOIN e bc ON ab.dst = bc.src
WHERE EXISTS (SELECT 1 FROM e ac WHERE ac.src = ab.src AND ac.dst = bc.dst)
""",
        "coreness": _coreness_sql(6),
        "louvain": _louvain_sql(4),
        # KMV sketch oracles: identical k-min-hash sets and the identical
        # single IEEE-double division ((k-1)·2^60 is exactly representable)
        "corpus_profile": """
SELECT lang AS stratum, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(quantile_cont(n_chars, 0.5), 4) AS p50,
       round(quantile_cont(n_chars, 0.9), 4) AS p90,
       round(quantile_cont(n_chars, 0.99), 4) AS p99,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
""",
        "duplicate_spans": f"""
WITH injected AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' {_SPAN_INJECT}' ELSE text END AS text
  FROM documents),
tk AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM injected),
w AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(t) - 11, 0) + 1),
           i -> CAST(concat('0x', substr(md5(array_to_string(list_slice(t, i, i + 11), ' ')), 1, 15)) AS BIGINT))) AS wh
  FROM tk),
dup AS (SELECT wh FROM w GROUP BY wh HAVING count(DISTINCT doc_id) > 1),
nd AS (SELECT doc_id, count(*) AS n_dup_windows FROM w WHERE wh IN (SELECT wh FROM dup) GROUP BY doc_id)
SELECT w.doc_id, count(*) AS n_windows,
       coalesce(any_value(nd.n_dup_windows), 0) AS n_dup_windows
FROM w LEFT JOIN nd ON nd.doc_id = w.doc_id
GROUP BY w.doc_id
""",
        "mis": _luby_rounds_sql(8, color=False),
        "jp_coloring": _luby_rounds_sql(10, color=True),
        "maximal_matching": _matching_rounds_sql(12),
        "spam_mass": _spam_mass_sql(20),
        "absorption_regions": _absorption_sql(6),
        "dedup_matching": _dedup_matching_sql(8),
        "topo_levels": _topo_levels_sql(6),
        "interleave_mix": _INTERLEAVE_SQL,
        "densest_core": _densest_sql(6),
        "temporal_reach": _temporal_reach_sql(4),
        "embedding_centroids": _CENTROIDS_SQL,
        "embedding_covariance": _COVARIANCE_SQL,
        "despan_corpus": _DESPAN_SQL,
        "funnel": _funnel_sql(_FUNNEL_STEPS),
        "retention": _RETENTION_SQL,
        "host_pagerank": _host_pr_sql(10),
        "negative_samples": _NEGATIVE_SAMPLES_SQL,
        # bloom prefilter is output-identical to the broadcast one by
        # contract (exact-join rescan), so the oracle is the same SQL
        "decontamination_bloom": _decontamination_sql(0.5),
        "butterflies": f"""
WITH be AS MATERIALIZED ({ENTITY_EDGES_SQL}),
cp AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM be
  WHERE src LIKE 'c%' AND dst LIKE 'p%'),
pairs AS MATERIALIZED (
  SELECT a.dst AS v1, b.dst AS v2, count(*) AS c
  FROM cp a JOIN cp b ON a.src = b.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst)
SELECT CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT) AS butterflies,
       count(*) AS wedge_pairs,
       CAST(coalesce(sum(c), 0) AS BIGINT) AS shared_wedges
FROM pairs
""",
        "transitivity": f"""
WITH e0 AS MATERIALIZED ({ENTITY_EDGES_SQL}),
und AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
e AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),
tri AS (
  SELECT count(*) AS t
  FROM e ab JOIN e bc ON ab.dst = bc.src
  WHERE EXISTS (SELECT 1 FROM e ac WHERE ac.src = ab.src AND ac.dst = bc.dst)),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT src AS v FROM e UNION ALL SELECT dst FROM e) GROUP BY v),
wed AS (SELECT CAST(coalesce(sum((d * (d - 1)) // 2), 0) AS BIGINT) AS w FROM deg)
SELECT tri.t AS n_triangles, wed.w AS n_wedges,
       round(CASE WHEN wed.w = 0 THEN 0.0 ELSE 3.0 * tri.t / wed.w END, 6)
         AS transitivity
FROM tri, wed
""",
        "fastrp": f"""
WITH {_FASTRP_CTES}
SELECT v, dim, round(val, 6) AS val FROM emb
""",
        "fastrp_edge_scores": f"""
WITH {_FASTRP_CTES},
nrm AS MATERIALIZED (
  SELECT v, sqrt(sum(val * val)) AS nrm FROM emb GROUP BY v),
cp AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM ed
  WHERE src LIKE 'c%' AND dst LIKE 'p%'),
dots AS MATERIALIZED (
  SELECT cp.src, cp.dst, sum(a.val * b.val) AS dot
  FROM cp JOIN emb a ON a.v = cp.src
          JOIN emb b ON b.v = cp.dst AND b.dim = a.dim
  GROUP BY cp.src, cp.dst)
SELECT d.src, d.dst,
       round(CASE WHEN na.nrm > 0 AND nb.nrm > 0
                  THEN d.dot / (na.nrm * nb.nrm) ELSE 0.0 END, 6) AS cosine
FROM dots d JOIN nrm na ON na.v = d.src JOIN nrm nb ON nb.v = d.dst
""",
        "kmv_vocab": f"""
WITH tok AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents),
h AS (SELECT DISTINCT CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) AS h
      FROM tok ORDER BY h LIMIT 256),
agg AS (SELECT max(h) AS kth_hash, count(*) AS n_sketch FROM h)
SELECT kth_hash, n_sketch,
       CASE WHEN n_sketch < 256 THEN CAST(n_sketch AS DOUBLE)
            ELSE CAST({255 * (1 << 60)} AS DOUBLE) / CAST(kth_hash AS DOUBLE) END AS estimate
FROM agg
""",
        "kmv_users_by_type": f"""
WITH h0 AS (
  SELECT DISTINCT event_type AS g,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
  FROM events),
h AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn FROM h0),
agg AS (SELECT g, max(h) AS kth_hash, count(*) AS n_sketch FROM h WHERE rn <= 64 GROUP BY g)
SELECT g AS event_type, kth_hash, n_sketch,
       CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE)
            ELSE CAST({63 * (1 << 60)} AS DOUBLE) / CAST(kth_hash AS DOUBLE) END AS estimate
FROM agg
""",
        # exact integer DSIR: identical scaled-integer likelihood ratios
        # (// is the same floor division as Spark's `div` on positives),
        # so scores are BIGINT-equal — no float tolerance anywhere
        "dsir_weights": """
WITH tok AS (
  SELECT doc_id, source IN ('src1','src2','src3') AS is_target,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
  FROM documents
),
tb AS MATERIALIZED (
  SELECT doc_id, is_target,
         CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) % 1024 AS b
  FROM tok
),
tot AS (SELECT sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS nt,
               sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS ns FROM tb),
ctb AS (SELECT b, sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
               sum(CASE WHEN is_target THEN 0 ELSE 1 END) AS cs
        FROM tb GROUP BY b),
ratio AS (SELECT b,
                 ((ct + 1) * ((SELECT ns FROM tot) + 1024) * 1000000)
                   // ((cs + 1) * ((SELECT nt FROM tot) + 1024)) AS r
          FROM ctb)
SELECT tb.doc_id, CAST(sum(ratio.r) AS BIGINT) AS dsir_score
FROM tb JOIN ratio ON ratio.b = tb.b
WHERE NOT tb.is_target
GROUP BY tb.doc_id
""",
        "host_graph": f"""
WITH e AS (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
m AS (
  SELECT 'c' || c_custkey AS v, 'n' || c_nationkey AS g FROM customer
  UNION ALL
  SELECT 's' || s_suppkey, 'n' || s_nationkey FROM supplier
  UNION ALL
  SELECT 'p' || p_partkey, 'b:' || p_brand FROM part
),
c AS (
  SELECT COALESCE(ms.g, e.src) AS src, COALESCE(md.g, e.dst) AS dst
  FROM e LEFT JOIN m ms ON ms.v = e.src LEFT JOIN m md ON md.v = e.dst
)
SELECT src, dst, count(*) AS weight
FROM c WHERE src <> dst GROUP BY src, dst
""",
        "bowtie": f"""
WITH RECURSIVE et AS ({_EVENT_EDGES}),
ed AS (SELECT DISTINCT src, dst FROM et WHERE seq < 300),
verts AS (
  SELECT DISTINCT v FROM (SELECT src AS v FROM ed UNION ALL SELECT dst FROM ed)
),
e AS (SELECT src, dst FROM ed WHERE src <> dst),
reach(a, b) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.a, e.dst FROM reach r JOIN e ON e.src = r.b
),
scc AS (
  SELECT r1.a AS v, min(r1.b) AS scc
  FROM reach r1 JOIN reach r2 ON r2.a = r1.b AND r2.b = r1.a
  GROUP BY r1.a
),
core_id AS (
  SELECT scc FROM (SELECT scc, count(*) AS n FROM scc GROUP BY scc)
  ORDER BY n DESC, scc ASC LIMIT 1
),
core AS (SELECT v FROM scc WHERE scc = (SELECT scc FROM core_id)),
fwd AS (SELECT DISTINCT r.b AS v FROM reach r JOIN core c ON r.a = c.v),
bwd AS (SELECT DISTINCT r.a AS v FROM reach r JOIN core c ON r.b = c.v),
ue AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
u(a, b) AS (
  SELECT v, v FROM verts
  UNION
  SELECT r.a, ue.dst FROM u r JOIN ue ON ue.src = r.b
),
weak AS (SELECT DISTINCT r.b AS v FROM u r JOIN core c ON r.a = c.v)
SELECT verts.v AS entity,
       CASE WHEN verts.v IN (SELECT v FROM core) THEN 'core'
            WHEN verts.v IN (SELECT v FROM bwd) THEN 'in'
            WHEN verts.v IN (SELECT v FROM fwd) THEN 'out'
            WHEN verts.v IN (SELECT v FROM weak) THEN 'tendril'
            ELSE 'disconnected' END AS region
FROM verts
""",
        "cocitation": f"""
WITH base AS MATERIALIZED ({ENTITY_EDGES_SQL}),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM base WHERE src <> dst),
keep AS (SELECT src AS k FROM e GROUP BY src HAVING count(*) <= 100),
kept AS MATERIALIZED (
  SELECT e.src AS k, e.dst AS x FROM e JOIN keep ON keep.k = e.src)
SELECT l.x AS entity_a, r.x AS entity_b, count(*) AS w
FROM kept l JOIN kept r ON l.k = r.k AND l.x < r.x
GROUP BY l.x, r.x HAVING count(*) >= 2
""",
        "bib_coupling": f"""
WITH base AS MATERIALIZED ({ENTITY_EDGES_SQL}),
e AS MATERIALIZED (SELECT DISTINCT src, dst FROM base WHERE src <> dst),
keep AS (SELECT dst AS k FROM e GROUP BY dst HAVING count(*) <= 100),
kept AS MATERIALIZED (
  SELECT e.dst AS k, e.src AS x FROM e JOIN keep ON keep.k = e.dst)
SELECT l.x AS entity_a, r.x AS entity_b, count(*) AS w
FROM kept l JOIN kept r ON l.k = r.k AND l.x < r.x
GROUP BY l.x, r.x HAVING count(*) >= 2
""",
        "distance_distribution": _distance_distribution_sql(3, 32),
        "rich_club": _rich_club_sql(40),
        "dedup_best": _dedup_best_sql(),
        "seeded_lpa": _seeded_lpa_sql(4),
        "source_overlap": """
WITH sh AS MATERIALIZED (
  SELECT DISTINCT s, g FROM (
    SELECT source AS s, unnest(list_distinct(list_transform(
        range(1, greatest(len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 2, 1) + 1),
        i -> array_to_string(list_slice(regexp_extract_all(lower(text), '[a-z0-9]+'), i, i+2), ' ')
    ))) AS g
    FROM documents
  )
),
sizes AS (SELECT s, count(*) AS sz FROM sh GROUP BY s),
rare AS (SELECT g FROM sh GROUP BY g HAVING count(*) <= 10000),
kept AS (SELECT sh.s, sh.g FROM sh JOIN rare USING (g)),
inter AS (
  SELECT a.s AS source_a, b.s AS source_b, count(*) AS n_shared
  FROM kept a JOIN kept b ON a.g = b.g AND a.s < b.s
  GROUP BY a.s, b.s
)
SELECT source_a, source_b, n_shared,
       round(n_shared * 1.0 / (sa.sz + sb.sz - n_shared), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.s = source_a
JOIN sizes sb ON sb.s = source_b
""",
        "degree_powerlaw": f"""
WITH e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
e AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM e0 WHERE src <> dst
),
deg AS (
  SELECT v, count(*) AS d
  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v
)
SELECT count(*) AS n_vertices,
       CAST(sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
       CAST(2 AS BIGINT) AS d_min,
       round(1.0 + sum(CASE WHEN d >= 2 THEN 1 ELSE 0 END)
                 / sum(CASE WHEN d >= 2 THEN ln(d / 1.5) ELSE 0.0 END),
             6) AS alpha
FROM deg
""",
        "pseudo_diameter": f"""
WITH RECURSIVE e0 AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
und AS MATERIALIZED (
  SELECT src, dst FROM e0 WHERE src <> dst
  UNION SELECT dst, src FROM e0 WHERE src <> dst
),
verts AS (SELECT DISTINCT src AS v FROM und),
s0 AS (SELECT min(v) AS v FROM verts),
r0(v, d) AS (
  SELECT v, 0 FROM s0
  UNION
  SELECT u.dst, r0.d + 1 FROM r0 JOIN und u ON u.src = r0.v WHERE r0.d < 32
),
d0 AS (SELECT v, min(d) AS d FROM r0 GROUP BY v),
s1 AS (SELECT v FROM d0 ORDER BY d DESC, v ASC LIMIT 1),
r1(v, d) AS (
  SELECT v, 0 FROM s1
  UNION
  SELECT u.dst, r1.d + 1 FROM r1 JOIN und u ON u.src = r1.v WHERE r1.d < 32
),
d1 AS (SELECT v, min(d) AS d FROM r1 GROUP BY v)
SELECT (SELECT v FROM s0) AS start_v,
       (SELECT v FROM s1) AS far_v,
       CAST((SELECT max(d) FROM d0) AS BIGINT) AS ecc_start,
       CAST((SELECT max(d) FROM d1) AS BIGINT) AS diameter_lb
""",
        "lm_score": """
WITH t AS MATERIALIZED (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk FROM documents
),
bp AS MATERIALIZED (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
                i -> struct_pack(w1 := tk[i], bg := tk[i] || ' ' || tk[i + 1]))) AS p
  FROM t
),
b AS (SELECT doc_id, p.w1 AS w1, p.bg AS bg FROM bp),
uc AS (SELECT w1, count(*) AS c1
       FROM (SELECT unnest(tk) AS w1 FROM t) GROUP BY w1),
bc AS (SELECT bg, count(*) AS c12 FROM b GROUP BY bg),
v AS (SELECT count(*) AS v FROM uc),
lp AS (
  SELECT b.doc_id, ln((bc.c12 + 1.0) / (uc.c1 + v.v)) AS lp
  FROM b JOIN bc USING (bg) JOIN uc USING (w1) CROSS JOIN v
),
sc AS (
  SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_logprob
  FROM lp GROUP BY doc_id
)
SELECT d.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams, sc.avg_logprob
FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
""",
        "neighborhood_function": f"""
WITH RECURSIVE e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({ENTITY_EDGES_SQL})),
verts AS MATERIALIZED (
  SELECT DISTINCT v FROM (SELECT src AS v FROM e UNION ALL SELECT dst FROM e)
),
reach(v, u, d) AS (
  SELECT v, v, 0 FROM verts
  UNION
  SELECT r.v, e.dst, r.d + 1 FROM reach r JOIN e ON e.src = r.u WHERE r.d < 3
),
rs AS (SELECT DISTINCT v, u FROM reach),
h AS (
  SELECT v, CAST(concat('0x', substr(md5(u), 1, 15)) AS BIGINT) AS h FROM rs
),
ranked AS (
  SELECT v, h, row_number() OVER (PARTITION BY v ORDER BY h) AS rn FROM h
),
agg AS (
  SELECT v, count(*) AS n_sketch, max(h) AS kth_hash
  FROM ranked WHERE rn <= 32 GROUP BY v
)
SELECT v AS entity, n_sketch, kth_hash,
       CASE WHEN n_sketch < 32 THEN CAST(n_sketch AS DOUBLE)
            ELSE 31.0 * 1152921504606846976 / kth_hash END AS estimate
FROM agg
""",
        "heavy_hitter_tokens": """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
  FROM documents
)
SELECT token, count(*) AS cnt
FROM tok GROUP BY token
HAVING count(*) * 65 > (SELECT count(*) FROM tok)
""",
        "weighted_sample": """
SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents
FROM orders
WHERE (o_orderkey * 2654435761 + 12345) % 1000000 * 5000000000
      < CAST(round(o_totalprice * 100) AS BIGINT) * 1 * 1000000
""",
    }


if __name__ == "__main__":
    from pagerank_cuda_dynamic_spark.session import get_spark

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    df = entry(spark)
    df.show(10, truncate=False)
