"""Shared vectorized column expressions (built-in functions only — the
reference's scalar vocabulary is abs/max/divide/fma, pagerank.hxx:139)."""
