"""BPE trainer/encoder vs a hand-rolled pure-Python reference."""

from __future__ import annotations

import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.operators import bpe


def _ref_train(word_freqs: dict[str, int], n_merges: int, min_freq: int = 2):
    """Classic single-machine BPE with the engine's tie-break order."""
    vocab = {w: list(w) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += word_freqs[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        (a, b), _n = best
        merges.append((a, b))
        for w, syms in vocab.items():
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            vocab[w] = out
    return merges, vocab


CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower widest widest widest"),
    (3, "newest newest newest newest newest newest"),
]
WORD_FREQS = {
    "low": 5, "lower": 2, "widest": 3, "newest": 6,
}


def test_bpe_train_matches_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id LONG, text STRING")
    got_merges, got_vocab = bpe.bpe_train(docs, n_merges=6)
    ref_merges, ref_vocab = _ref_train(WORD_FREQS, 6)
    assert got_merges == ref_merges
    got_syms = {r.w: list(r.symbols) for r in got_vocab.collect()}
    assert got_syms == ref_vocab
    # freq sanity: the vocab pass counted the corpus correctly
    freqs = {r.w: r.freq for r in got_vocab.collect()}
    assert freqs == WORD_FREQS


def test_bpe_train_early_stop(spark):
    # every word unique, every char pair freq 1 < min_pair_freq → 0 merges
    docs = spark.createDataFrame([(1, "ab cd ef")], "doc_id LONG, text STRING")
    merges, vocab = bpe.bpe_train(docs, n_merges=5, min_pair_freq=2)
    assert merges == []
    assert {r.w: list(r.symbols) for r in vocab.collect()} == {
        "ab": ["a", "b"], "cd": ["c", "d"], "ef": ["e", "f"],
    }


def test_bpe_encode_applies_learned_merges(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id LONG, text STRING")
    merges, _ = bpe.bpe_train(docs, n_merges=6)
    ref_merges, ref_vocab = _ref_train(WORD_FREQS, 6)
    assert merges == ref_merges
    # encode a NEW doc mixing known words — token stream must be the
    # per-word reference segmentations in document order; a token-less
    # doc must come back as (id, []), not vanish
    new = spark.createDataFrame(
        [(9, "newest low lower"), (10, "   ")], "doc_id LONG, text STRING"
    )
    # checkpoint_every=2 exercises the chain-cut path
    out = {
        r.doc_id: list(r.tokens)
        for r in bpe.bpe_encode(new, merges, checkpoint_every=2).collect()
    }
    expect = ref_vocab["newest"] + ref_vocab["low"] + ref_vocab["lower"]
    assert out == {9: expect, 10: []}


def test_apply_merge_overlap_is_leftmost_first(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["a", "a", "a"],)], "symbols ARRAY<STRING>")
    got = df.select(
        bpe._apply_merge("symbols", "a", "a").alias("m")
    ).collect()[0].m
    assert list(got) == ["aa", "a"]


def test_model_store_roundtrip(spark, tmp_path):
    from proyecto_gasto_publico_etl_per__spark.operators import model_store

    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    p = str(tmp_path / "bpe_model")
    model_store.save_bpe(spark, p, merges)
    assert model_store.load_bpe(spark, p) == merges

    import pytest

    with pytest.raises(ValueError, match="kind"):
        model_store.load_model(spark, p, "logreg")

    lp = str(tmp_path / "lr_model")
    model_store.save_logreg(spark, lp, [0.5, -1.25], 0.75, ["f0", "f1"])
    w, b, feats = model_store.load_logreg(spark, lp)
    assert (w, b, feats) == ([0.5, -1.25], 0.75, ["f0", "f1"])

    # encode with reloaded merges == encode with originals
    from proyecto_gasto_publico_etl_per__spark.operators import bpe

    docs = spark.createDataFrame([(1, "test lot")], "doc_id LONG, text STRING")
    a = {r.doc_id: list(r.tokens) for r in bpe.bpe_encode(docs, merges).collect()}
    b2 = {
        r.doc_id: list(r.tokens)
        for r in bpe.bpe_encode(docs, model_store.load_bpe(spark, p)).collect()
    }
    assert a == b2


def test_band_signatures_partition_invariant(spark):
    """MinHash band signatures must not depend on physical partitioning
    (min is associative; the band md5 is over a sorted slice) — the
    property that makes the streaming bucket table consistent with any
    batch recomputation."""
    from proyecto_gasto_publico_etl_per__spark.operators.dedup import (
        band_signatures,
    )

    rows = [(i, f"doc {i} body text with shared words {i%3}") for i in range(20)]
    df1 = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(1)
    df8 = spark.createDataFrame(rows, "doc_id LONG, text STRING").repartition(8)
    sig = lambda df: {  # noqa: E731
        (r.doc, r.band): r.band_sig for r in band_signatures(df).collect()
    }
    assert sig(df1) == sig(df8)
