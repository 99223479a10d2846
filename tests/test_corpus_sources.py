"""JSONL corpus reader/writer (sources/corpus.py) — external corpora onto
the engine's documents schema, with corrupt-line quarantine and
deterministic minted ids, feeding the pipeline operators end-to-end."""

from __future__ import annotations

import json

from pagerank_cuda_dynamic_spark.sources.corpus import (
    read_jsonl_documents,
    write_jsonl_documents,
)


def _write_jsonl(tmp_path, name, objs, raw_lines=()):
    p = tmp_path / name
    lines = [json.dumps(o) for o in objs] + list(raw_lines)
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_full_fields(spark, tmp_path):
    path = _write_jsonl(
        tmp_path,
        "a.jsonl",
        [
            {"doc_id": 7, "text": "hello world", "lang": "en", "source": "web"},
            {"doc_id": 9, "text": "bonjour", "lang": "fr", "source": "books"},
        ],
    )
    rows = {r.doc_id: r for r in read_jsonl_documents(spark, path).collect()}
    assert set(rows) == {7, 9}
    assert rows[7].n_chars == 11 and rows[7].source == "web"
    assert rows[9].lang == "fr"


def test_read_jsonl_mints_ids_and_defaults(spark, tmp_path):
    path = _write_jsonl(
        tmp_path,
        "b.jsonl",
        [{"text": "alpha"}, {"text": "beta"}, {"text": "alpha"}],
    )
    df = read_jsonl_documents(spark, path, default_source="crawl")
    rows = df.collect()
    assert len(rows) == 3
    assert all(r.source == "crawl" and r.doc_id is not None and r.doc_id >= 0 for r in rows)
    ids = {r.text: r.doc_id for r in rows}
    assert len({ids["alpha"], ids["beta"]}) == 2  # content hash: distinct texts differ
    # identical texts mint the identical id — exact-dup collapse downstream
    assert sum(1 for r in rows if r.doc_id == ids["alpha"]) == 2


def test_read_jsonl_corrupt_quarantine(spark, tmp_path):
    path = _write_jsonl(
        tmp_path,
        "c.jsonl",
        [{"text": "good"}],
        raw_lines=['{broken json', '{"no_text_field": 1}'],
    )
    clean = read_jsonl_documents(spark, path)
    assert [r.text for r in clean.collect()] == ["good"]
    with_bad = read_jsonl_documents(spark, path, keep_corrupt=True)
    rows = with_bad.collect()
    quarantined = [r for r in rows if r.source == "_corrupt"]
    # BOTH failure modes quarantined: the broken JSON line AND the valid
    # record with no text field — nothing vanishes silently
    assert len(quarantined) == 2 and all(r.text is None for r in quarantined)
    assert len(rows) == 3


def test_read_jsonl_alternate_text_field(spark, tmp_path):
    path = _write_jsonl(tmp_path, "d.jsonl", [{"content": "xyz", "lang": "en"}])
    rows = read_jsonl_documents(spark, path, text_field="content").collect()
    assert rows[0].text == "xyz" and rows[0].n_chars == 3


def test_jsonl_roundtrip_feeds_pipeline(spark, tmp_path):
    from pagerank_cuda_dynamic_spark.operators.text import token_stats

    path = _write_jsonl(
        tmp_path,
        "e.jsonl",
        [{"doc_id": 1, "text": "one two three"}, {"doc_id": 2, "text": "four"}],
    )
    docs = read_jsonl_documents(spark, path)
    stats = {r.doc_id: r.n_ws_tokens for r in token_stats(docs).select("doc_id", "n_ws_tokens").collect()}
    assert stats == {1: 3, 2: 1}
    out = str(tmp_path / "shards")
    write_jsonl_documents(docs, out)
    back = read_jsonl_documents(spark, out)
    assert {r.doc_id for r in back.collect()} == {1, 2}
