"""Text-analysis operators for training-data pipelines — all built-in
column expressions (JVM-side, whole-stage-codegen friendly), no Python in
the hot path.

  language-ID    : stopword-hit n-gram heuristic over a small lang table
  quality score  : length / punctuation / stopword / uppercase ratios
  token counting : whitespace + BPE-ish regex token counts
  fingerprinting : normalization fingerprint (see dedup.fingerprint_key)
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from pagerank_cuda_dynamic_spark.operators.dedup import TOKEN_RE, fingerprint_key

# tiny deterministic stopword inventories (public common-word lists)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "fr": ["le", "la", "les", "et", "est", "pas", "des", "une", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "no", "con", "una", "por", "que"],
}

BPE_ISH_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _stopword_hits(text_col: str, lang: str) -> F.Column:
    """Count of stopword occurrences (word-boundary regex, case-insensitive)."""
    pat = r"(?i)\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0))


def language_id(docs: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Argmax of per-language stopword hit counts; tie-break by language
    code order (deterministic); 'und' when no hits at all."""
    hits = [ _stopword_hits(text_col, lg).alias(f"_h_{lg}") for lg in sorted(STOPWORDS) ]
    with_hits = docs.select("*", *hits)
    best = F.greatest(*[F.col(f"_h_{lg}") for lg in sorted(STOPWORDS)])
    pred = F.lit("und")
    # reversed so earlier codes win ties via later .when overriding semantics
    for lg in sorted(STOPWORDS, reverse=True):
        pred = F.when((F.col(f"_h_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(pred)
    return with_hits.withColumn(out_col, pred).drop(*[f"_h_{lg}" for lg in sorted(STOPWORDS)])


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, n_chars, n_ws_tokens, n_bpe_tokens) — whitespace tokens and
    BPE-ish regex tokens (letters / digits / single punctuation)."""
    return docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).cast("long").alias("n_chars"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)).cast("long").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_RE), 0)).cast("long").alias("n_bpe_tokens"),
    )


def quality_expr(text_col: str) -> F.Column:
    """The quality heuristic as a composable column expression (un-rounded):
    score = 0.4·min(n_ws_tokens/100,1) + 0.3·min(stop_ratio·5,1)
          + 0.3·(1 − min(punct_ratio·4,1))."""
    t = F.col(text_col)
    n_tok = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_stop = _stopword_hits(text_col, "en")
    safe_tok = F.greatest(n_tok, F.lit(1))
    stop_ratio = n_stop / safe_tok
    punct_ratio = n_punct / F.greatest(F.length(t), F.lit(1))
    return (
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0)))
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic [0,1] quality heuristic: longer docs with moderate
    punctuation and healthy English-stopword density score higher; 6 dp."""
    return docs.select(F.col(id_col), F.round(quality_expr(text_col), 6).alias("quality"))


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint) — see dedup.fingerprint_key."""
    return docs.select(F.col(id_col), fingerprint_key(text_col).alias("fingerprint"))


# PII scrub patterns: ordered, mutually non-overlapping by construction
# (phone requires a leading '+', so it never matches an SSN-shaped string;
# counts are taken per-pattern on the ORIGINAL text so sequential
# replacement and counting agree).  RE2-and-Java compatible — no
# lookaround/backrefs — so the DuckDB oracle runs the very same patterns.
PII_PATTERNS = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\+\d{1,2}[ -]\d{3}[ -]\d{3,4}[ -]\d{3,4}", "<PHONE>"),
]


def scrub_exprs(text_col: str) -> tuple[F.Column, F.Column]:
    """(clean_text, n_redactions) as composable column expressions —
    sequential PII replacement plus whitespace normalization; counts taken
    per-pattern on the original text (patterns are mutually
    non-overlapping, so the tallies agree with the replacements)."""
    clean = F.col(text_col)
    counts = []
    for pat, repl in PII_PATTERNS:
        counts.append(F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)))
        clean = F.regexp_replace(clean, pat, repl)
    clean = F.trim(F.regexp_replace(clean, r"\s+", " "))
    n_red = counts[0]
    for c in counts[1:]:
        n_red = n_red + c
    return clean, n_red.cast("long")


def text_scrub(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, clean_text, n_redactions) — PII redaction (email / IPv4 / SSN /
    intl phone → typed placeholder tokens) followed by whitespace
    normalization (collapse runs, trim).  Pure JVM regexp_replace chain —
    whole-stage codegen, no Python, no shuffle; the canonical pre-training
    scrub pass shape."""
    clean, n_red = scrub_exprs(text_col)
    return docs.select(
        F.col(id_col),
        clean.alias("clean_text"),
        n_red.alias("n_redactions"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 32,
    overlap: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, chunk_id, chunk_text, n_tokens) — split each document into
    whitespace-token windows of `chunk_size` tokens advancing by
    `chunk_size - overlap` (context-window packing for training).  Fully
    declarative: split → sequence of starts → posexplode → slice/array_join,
    all JVM expressions.  Row count grows ~n_tokens/stride per doc — the
    intended training-example shape; no Python, no extra shuffle (the
    explode is pipelined into the scan)."""
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("chunk_size must exceed overlap")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(F.col(id_col), toks.alias("_toks"))
    starts = F.sequence(F.lit(1), F.greatest(F.size("_toks"), F.lit(1)), F.lit(stride))
    return base.select(
        F.col(id_col),
        F.col("_toks"),
        F.posexplode(starts).alias("chunk_id", "_start"),
    ).select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join(F.slice("_toks", F.col("_start"), F.lit(chunk_size)), " ").alias(
            "chunk_text"
        ),
        F.least(F.lit(chunk_size), F.size("_toks") - F.col("_start") + 1)
        .cast("long")
        .alias("n_tokens"),
    )


def tfidf_keywords(
    docs: DataFrame,
    top_k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k TF-IDF keywords per document: tf = in-doc term count, idf =
    ln(N / df) (natural log, no smoothing — deterministic and
    SQL-portable), score = tf·idf, ties broken by term.  The relational
    staple: explode lowercase tokens → (doc, term) counts → document
    frequencies → score → per-doc window top-k (partitioned by doc id, so
    the window never concentrates on one task).  Returns
    (id, term, score) with score rounded to 6 dp."""
    from pyspark.sql import Window

    from pagerank_cuda_dynamic_spark.functions import tokens

    n_docs = docs.count()
    terms = docs.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy(id_col).orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        tf.join(df, "term")
        .withColumn("score", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= top_k)
        .select(id_col, "term", F.round("score", 6).alias("score"))
    )


def pack_sequences(
    docs: DataFrame,
    token_budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents (in deterministic
    order) and cut at fixed token budgets — each doc gets the pack index
    where its tokens START (floor(cumsum_before / budget)).  Returns
    (id, shard, pack_id, n_tokens).

    Scale shape: docs are first salted into `n_shards` deterministic
    shards by an id mix, and the running-token cumsum window runs WITHIN a
    shard — never a global single-partition window; each shard's sort is
    an ordinary shuffle partition.  Shard and pack assignment are pure
    functions of (id, corpus content), so reruns and layouts agree."""
    from pyspark.sql import Window

    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    base = docs.select(
        F.col(id_col),
        F.pmod(F.col(id_col) * F.lit(2654435761) + F.lit(12345), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        id_col,
        "shard",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / token_budget)
        .cast("long")
        .alias("pack_id"),
        "n_tokens",
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition metrics (the Gopher-rules family):

      dup_line_frac   1 − |distinct lines| / |lines|
      dup_token_frac  1 − |distinct tokens| / |tokens|
      top_bigram_frac fraction of tokens covered by the single most
                      frequent adjacent token bigram

    Line/token fractions are per-row array expressions (no shuffle).  The
    bigram mode is the relational shape — explode bigrams → count per
    (doc, bigram) → max per doc — NOT a per-doc quadratic scan, so a
    1k-token document costs 1k rows, not 10⁶ comparisons; one shuffle
    keyed by doc id.  Returns (id, dup_line_frac, dup_token_frac,
    top_bigram_frac), all rounded to 6 dp."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    lines = F.split(F.col(text_col), "\n")
    base = docs.select(
        F.col(id_col),
        F.round(
            1.0 - F.size(F.array_distinct(lines)) / F.greatest(F.size(lines), F.lit(1)),
            6,
        ).alias("dup_line_frac"),
        F.round(
            1.0 - F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1)),
            6,
        ).alias("dup_token_frac"),
        F.size(toks).alias("_n_toks"),
        toks.alias("_toks"),
    )
    bigrams = base.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.col("_n_toks") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.col("_n_toks") - 1),
                    lambda i: F.concat_ws(
                        " ", F.element_at("_toks", i), F.element_at("_toks", i + 1)
                    ),
                ),
            ).otherwise(F.array()),
        ).alias("bg"),
    )
    top = (
        bigrams.groupBy(id_col, "bg")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_bg"))
    )
    return (
        base.join(top, id_col, "left")
        .select(
            F.col(id_col),
            "dup_line_frac",
            "dup_token_frac",
            F.round(
                F.coalesce(F.col("top_bg"), F.lit(0)) * 2.0
                / F.greatest(F.col("_n_toks"), F.lit(1)),
                6,
            ).alias("top_bigram_frac"),
        )
    )


def repetition_filter(
    docs: DataFrame,
    max_dup_line_frac: float = 0.3,
    max_dup_token_frac: float = 0.9,
    max_top_bigram_frac: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents whose repetition metrics exceed the Gopher-style
    gates — the standard boilerplate/spam pass of a pre-training corpus."""
    stats = repetition_stats(docs, id_col, text_col)
    keep = stats.where(
        (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_token_frac") <= max_dup_token_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    ).select(id_col)
    return docs.join(keep, id_col, "left_semi")


def token_vocabulary(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 1000,
) -> DataFrame:
    """Tokenizer-vocabulary counting: (token, tf, df) over the corpus —
    tf = total occurrences, df = documents containing the token — with a
    DETERMINISTIC top-N cut ordered by (tf desc, token asc) so boundary
    ties never flap between runs.  This is the frequency table a BPE/
    unigram tokenizer trainer consumes.

    Plan: explode(lowercased alnum tokens) → one token-keyed aggregate
    (tf partial-aggregates map-side; df is the standard two-phase
    count-distinct expansion) → global top-N.  All JVM expressions."""
    from pagerank_cuda_dynamic_spark.functions import tokens

    toks = docs.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    agg = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.countDistinct(id_col).alias("df"),
    )
    return agg.orderBy(F.desc("tf"), F.asc("token")).limit(top_n)


def corpus_profile(
    docs: DataFrame,
    strata_col: str = "lang",
    length_col: str = "n_chars",
    source_col: str = "source",
) -> DataFrame:
    """Per-stratum corpus profile: doc count, total/exact-percentile
    lengths (p50/p90/p99 via Spark's EXACT `percentile`, linear
    interpolation — the same definition as DuckDB's quantile_cont, so the
    oracle matches to double precision, unlike approx_percentile whose
    sketch is engine-private), and distinct source count.

    One hash aggregate; exact percentiles buffer each group's length
    column on one reducer — lengths are ints (8 B/row), so a stratum of
    10⁹ docs costs ~8 GB on its reducer: acceptable for profiling runs;
    switch to approx_percentile for unattended pipelines at larger
    strata (the accuracy knob, not a correctness knob)."""
    return docs.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(length_col).cast("long").alias("total_chars"),
        F.round(F.expr(f"percentile({length_col}, 0.5)"), 4).alias("p50"),
        F.round(F.expr(f"percentile({length_col}, 0.9)"), 4).alias("p90"),
        F.round(F.expr(f"percentile({length_col}, 0.99)"), 4).alias("p99"),
        F.count_distinct(F.col(source_col)).alias("n_sources"),
    )


__all__ = [
    "corpus_profile",
    "STOPWORDS",
    "BPE_ISH_RE",
    "TOKEN_RE",
    "PII_PATTERNS",
    "language_id",
    "token_stats",
    "token_vocabulary",
    "quality_expr",
    "quality_score",
    "fingerprints",
    "scrub_exprs",
    "text_scrub",
    "chunk_documents",
    "pack_sequences",
    "repetition_stats",
    "repetition_filter",
    "lm_score",
]


def lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Self-trained bigram language-model score per document — the
    model-based quality filter of CCNet-style pipelines (Wenzek et al.
    2020), here with the LM trained on the corpus itself so outlier
    documents (boilerplate, garbled text, wrong-language) score low
    against the corpus's own statistics.

    Model: add-one (Laplace) smoothed bigram LM over lowercased alnum
    tokens.  P(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), V = |vocab|.
    score(doc) = mean over the doc's bigrams of ln P(w2|w1); documents
    with < 2 tokens have no bigrams and are returned with n_bigrams = 0
    and NULL avg_logprob (nothing to judge).

    Scale posture: ALL JVM built-ins — tokens/bigrams via regexp +
    slice/zip_with array ops, counts via two hash aggregates (unigram
    and bigram, both map-side combinable), scoring = the exploded
    bigram instances joined against the two count tables on their
    natural keys + one id-keyed average.  The count tables are
    vocab-/bigram-vocab-sized (≪ instance count; Zipf head keys are
    hot on the INSTANCE side of the join, which is the probe side).
    V is a 1-row scalar cross-joined in.  No Python, no windows,
    no driver traffic.

    Returns (id_col, n_bigrams, avg_logprob) — avg_logprob rounded to
    6 dp (ln() agreement regime shared with linkpred's adamic_adar).
    """
    from pagerank_cuda_dynamic_spark.functions import tokens

    t = docs.select(F.col(id_col), tokens(text_col).alias("tk"))
    n = F.size("tk")
    big = t.select(
        F.col(id_col),
        F.explode(
            F.when(
                n >= 2,
                F.zip_with(
                    F.slice("tk", 1, n - 1),
                    F.slice("tk", 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("bg")),
                ),
            ).otherwise(F.array())
        ).alias("p"),
    ).select(id_col, "p.w1", "p.bg")
    uni = (
        t.select(F.explode("tk").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bg_counts = big.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    vocab = uni.agg(F.count(F.lit(1)).alias("v"))
    scored = (
        big.join(bg_counts, "bg")
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.log((F.col("c12") + F.lit(1.0)) / (F.col("c1") + F.col("v"))).alias("lp"),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )
    ids = docs.select(F.col(id_col))
    return ids.join(scored, id_col, "left").select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "avg_logprob",
    )


def quality_filter(
    docs: DataFrame,
    keep_fraction: float = 0.5,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keep the top `keep_fraction` of documents by quality_score —
    PER STRATUM when `strata_col` is given (the FineWeb/Gopher-style
    curation cut computed against each language's own distribution, so
    a global threshold can't wipe out low-resource strata).

    A row survives iff cume_dist of its (stratum, quality) —
    #rows with quality ≤ its own / stratum size — exceeds
    1 − keep_fraction.  cume_dist is a pure function of the quality
    MULTISET (ties share one value), so reruns, layouts and engines
    agree row-for-row; the 6-dp quality key makes ties exact, not
    float-fuzzy.

    Scale shape: NO per-row window.  The cume map is computed on the
    distinct (stratum, quality) VALUE table — tiny, because quality is
    a 6-dp quantized heuristic — with one small window over values and
    broadcast back onto the corpus scan.  A naive cume_dist() window
    over the rows would serialize each stratum (or, unstratified, the
    whole corpus) through one task.

    Returns (id, [stratum,] quality) for surviving rows.
    """
    if not (0.0 <= keep_fraction <= 1.0):
        raise ValueError("quality_filter: keep_fraction must be in [0, 1]")
    from pyspark.sql import Window

    keys = [strata_col] if strata_col is not None else []
    base = docs.select(
        F.col(id_col),
        *keys,
        F.round(quality_expr(text_col), 6).alias("quality"),
    )
    vals = base.groupBy(*keys, "quality").agg(F.count(F.lit(1)).alias("_c"))
    w_cum = (
        Window.partitionBy(*keys)
        .orderBy("quality")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_tot = Window.partitionBy(*keys)
    cume = vals.select(
        *keys,
        "quality",
        (F.sum("_c").over(w_cum) / F.sum("_c").over(w_tot)).alias("_cume"),
    )
    return (
        base.join(F.broadcast(cume), keys + ["quality"])
        .where(F.col("_cume") > F.lit(1.0 - keep_fraction))
        .drop("_cume")
    )
