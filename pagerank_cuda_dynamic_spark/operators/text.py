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


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic [0,1] quality heuristic: longer docs with moderate
    punctuation and healthy English-stopword density score higher.
    score = 0.4·min(n_ws_tokens/100,1) + 0.3·min(stop_ratio·5,1)
          + 0.3·(1 − min(punct_ratio·4,1)); rounded to 6 dp."""
    t = F.col(text_col)
    n_tok = F.size(F.regexp_extract_all(t, F.lit(r"\S+"), 0))
    n_punct = F.size(F.regexp_extract_all(t, F.lit(r"[^A-Za-z0-9\s]"), 0))
    n_stop = _stopword_hits(text_col, "en")
    safe_tok = F.greatest(n_tok, F.lit(1))
    stop_ratio = n_stop / safe_tok
    punct_ratio = n_punct / F.greatest(F.length(t), F.lit(1))
    score = (
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0)))
    )
    return docs.select(F.col(id_col), F.round(score, 6).alias("quality"))


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, fingerprint) — see dedup.fingerprint_key."""
    return docs.select(F.col(id_col), fingerprint_key(text_col).alias("fingerprint"))


__all__ = [
    "STOPWORDS",
    "BPE_ISH_RE",
    "TOKEN_RE",
    "language_id",
    "token_stats",
    "quality_score",
    "fingerprints",
]
