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


def test_streaming_jsonl_incremental_ingest(spark, tmp_path):
    """JSONL corpus drops stream in incrementally (AvailableNow), corrupt
    lines filtered in-flight; re-runs never reprocess a file."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from proyecto_gasto_publico_etl_per__spark.streaming.incremental import (
        incremental_load,
    )

    src = tmp_path / "arrivals"
    src.mkdir()
    tgt = str(tmp_path / "corpus_parquet")
    ckp = str(tmp_path / "ckp")
    full = T.StructType(
        list(J.DOCUMENTS_SCHEMA.fields)
        + [T.StructField(J.CORRUPT_COL, T.StringType())]
    )

    def clean(stream):
        return stream.filter(F.col(J.CORRUPT_COL).isNull()).drop(J.CORRUPT_COL)

    _write_lines(src / "b0.jsonl", [json.dumps(GOOD[0]), "corrupt line"])
    incremental_load(spark, str(src), tgt, ckp, full, clean, fmt="json")
    assert {r.doc_id for r in spark.read.parquet(tgt).collect()} == {1}

    # idempotent re-run: nothing new, nothing duplicated
    incremental_load(spark, str(src), tgt, ckp, full, clean, fmt="json")
    assert spark.read.parquet(tgt).count() == 1

    # late-arriving batch picked up incrementally
    _write_lines(src / "b1.jsonl", [json.dumps(GOOD[1]), json.dumps(GOOD[2])])
    incremental_load(spark, str(src), tgt, ckp, full, clean, fmt="json")
    assert {r.doc_id for r in spark.read.parquet(tgt).collect()} == {1, 2, 3}
