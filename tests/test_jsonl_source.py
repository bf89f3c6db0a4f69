"""JSONL source: schema-enforced scan, corruption audit, loud gate."""

from __future__ import annotations

import gzip
import json

import pytest

from proyecto_gasto_publico_etl_per__spark.sources import jsonl_source as J


def _write_lines(path, lines):
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")


GOOD = [
    {"doc_id": 1, "text": "hello world", "lang": "en", "source": "s0", "n_chars": 11},
    {"doc_id": 2, "text": "hola mundo", "lang": "es", "source": "s1", "n_chars": 10},
    {"doc_id": 3, "text": "bonjour", "lang": "fr", "source": "s0", "n_chars": 7},
]


def test_read_jsonl_clean_and_corrupt(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    _write_lines(
        p,
        [json.dumps(GOOD[0]), "{not json at all", json.dumps(GOOD[1])],
    )
    df = J.read_jsonl(spark, str(p))
    total, bad = J.corruption_stats(df)
    assert (total, bad) == (3, 1)
    # corrupt row: schema fields NULL, raw line captured
    corrupt = df.filter(df[J.CORRUPT_COL].isNotNull()).collect()
    assert len(corrupt) == 1
    assert corrupt[0][J.CORRUPT_COL] == "{not json at all"
    assert corrupt[0]["doc_id"] is None


def test_validate_jsonl_gate(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    _write_lines(p, [json.dumps(GOOD[0]), "oops", "also oops"])
    df = J.read_jsonl(spark, str(p))
    with pytest.raises(ValueError, match="corruption ratio"):
        J.validate_jsonl(df, max_corrupt_ratio=0.5)
    # permissive threshold passes and strips the audit column
    clean = J.validate_jsonl(df, max_corrupt_ratio=0.9)
    assert J.CORRUPT_COL not in clean.columns
    assert [r.doc_id for r in clean.collect()] == [1]


def test_jsonl_roundtrip_and_gzip(spark, tmp_path):
    src = tmp_path / "in.jsonl"
    _write_lines(src, [json.dumps(r) for r in GOOD])
    df = J.validate_jsonl(J.read_jsonl(spark, str(src)))
    out = tmp_path / "out"
    J.write_jsonl(df, str(out))
    back = J.validate_jsonl(J.read_jsonl(spark, str(out)))
    assert sorted((r.doc_id, r.text) for r in back.collect()) == sorted(
        (r["doc_id"], r["text"]) for r in GOOD
    )
    # gzip container reads transparently (unsplittable — SCALE.md note)
    gz = tmp_path / "corpus.jsonl.gz"
    with gzip.open(gz, "wt", encoding="utf-8") as f:
        for r in GOOD:
            f.write(json.dumps(r) + "\n")
    total, bad = J.corruption_stats(J.read_jsonl(spark, str(gz)))
    assert (total, bad) == (3, 0)
