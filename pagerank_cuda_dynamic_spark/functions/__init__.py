"""Shared vectorized column expressions — the engine's scalar vocabulary,
all built-in JVM functions (whole-stage-codegen friendly, no Python UDFs).
The reference's scalar vocabulary is abs/max/divide/fma (pagerank.hxx:139);
the data-pipeline operators add tokenization and vector math on top."""

from __future__ import annotations

import pyspark.sql.functions as F

TOKEN_RE = "[A-Za-z0-9]+"


def tokens(col: str = "text") -> F.Column:
    """Lowercased alphanumeric tokens (array<string>), JVM-side regex."""
    return F.regexp_extract_all(F.lower(F.col(col)), F.lit(TOKEN_RE), 0)


def word_shingles(col: str = "text", k: int = 3) -> F.Column:
    """Distinct word k-gram shingles as strings (JVM-side, no UDF).  Short
    docs (< k tokens) collapse to their single joined-token shingle."""
    toks = tokens(col)
    return F.when(F.size(toks) < k, F.array(F.array_join(toks, " "))).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
            )
        )
    )


def cosine_expr(a: str, b: str) -> F.Column:
    """cos(a,b) with built-in higher-order functions (JVM-side), computed
    in float64 regardless of the array element type (oracle parity)."""
    ca = F.transform(F.col(a), lambda x: x.cast("double"))
    cb = F.transform(F.col(b), lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(ca, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(cb, F.lit(0.0), lambda acc, x: acc + x * x))
    return dot / (na * nb)


__all__ = ["TOKEN_RE", "tokens", "word_shingles", "cosine_expr"]
