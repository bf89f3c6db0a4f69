"""Logistic-regression trainer vs a pure-Python reference."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from proyecto_gasto_publico_etl_per__spark.operators import classifier


def _ref_train(rows, n_iters, lr, l2=0.0):
    d = len(rows[0][0])
    w, b = [0.0] * d, 0.0
    n = len(rows)
    for _ in range(n_iters):
        gb, gw = 0.0, [0.0] * d
        for x, y in rows:
            z = b + sum(wi * xi for wi, xi in zip(w, x))
            e = 1.0 / (1.0 + math.exp(-z)) - y
            gb += e
            for i, xi in enumerate(x):
                gw[i] += e * xi
        b -= lr * gb / n
        w = [wi - lr * (gi / n + l2 * wi) for wi, gi in zip(w, gw)]
    return w, b


ROWS = [
    # two gaussian-ish blobs, linearly separable on x0+x1
    ([0.1, 0.2], 0), ([0.3, 0.1], 0), ([0.2, 0.4], 0), ([0.0, 0.3], 0),
    ([0.4, 0.2], 0), ([1.1, 1.3], 1), ([1.4, 0.9], 1), ([0.9, 1.2], 1),
    ([1.2, 1.1], 1), ([1.0, 1.4], 1),
]


@pytest.fixture()
def frame(spark):
    return spark.createDataFrame(
        [(x[0], x[1], y) for x, y in ROWS], "f0 DOUBLE, f1 DOUBLE, label INT"
    )


def test_logreg_train_matches_reference(frame):
    w, b = classifier.logreg_train(frame, ["f0", "f1"], n_iters=10, lr=0.5)
    rw, rb = _ref_train(ROWS, 10, 0.5)
    assert b == pytest.approx(rb, rel=1e-9)
    for wi, rwi in zip(w, rw):
        assert wi == pytest.approx(rwi, rel=1e-9)


def test_logreg_learns_separable_data(frame):
    w, b = classifier.logreg_train(frame, ["f0", "f1"], n_iters=80, lr=2.0)
    scored = classifier.logreg_score(frame, ["f0", "f1"], w, b)
    rows = scored.collect()
    assert all(
        (r.p_keep > 0.5) == (r.label == 1) for r in rows
    ), [(r.label, round(r.p_keep, 3)) for r in rows]
    # and training reduced the loss vs the zero model
    zero = classifier.logloss(frame, ["f0", "f1"], [0.0, 0.0], 0.0)
    trained = classifier.logloss(frame, ["f0", "f1"], w, b)
    assert trained < zero / 2


def test_l2_shrinks_weights(frame):
    w0, _ = classifier.logreg_train(frame, ["f0", "f1"], n_iters=20, lr=0.5)
    w2, _ = classifier.logreg_train(
        frame, ["f0", "f1"], n_iters=20, lr=0.5, l2=0.5
    )
    assert sum(x * x for x in w2) < sum(x * x for x in w0)


def test_empty_frame_raises(spark):
    empty = spark.createDataFrame([], "f0 DOUBLE, f1 DOUBLE, label INT")
    with pytest.raises(ValueError):
        classifier.logreg_train(empty, ["f0", "f1"])


def test_null_features_refused(spark):
    df = spark.createDataFrame(
        [(0.1, 0.2, 0), (None, 0.3, 1)], "f0 DOUBLE, f1 DOUBLE, label INT"
    )
    with pytest.raises(ValueError, match="NULLs.*f0"):
        classifier.logreg_train(df, ["f0", "f1"])


def test_quality_filter_end_to_end(spark):
    """The fastText-style workflow on real engine features: label docs
    by source affinity, train on quality_stats signals, score the
    corpus.  Pins that textstats features + the trainer compose (the
    localCheckpoint-before-filter discipline included) and that the
    learned filter beats the zero model on held-out loss."""
    from proyecto_gasto_publico_etl_per__spark.operators.textstats import (
        quality_stats,
    )
    from proyecto_gasto_publico_etl_per__spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    feats = ["mean_token_len", "punct_ratio", "upper_ratio", "stopword_ratio"]
    stats = quality_stats(docs).select(
        "doc_id", "lang", *feats
    ).localCheckpoint(eager=True)  # consumer-hazard discipline
    labeled = stats.withColumn(
        "label", (stats.lang == "en").cast("int")
    ).cache()
    train = labeled.where(labeled.doc_id % 5 != 0)
    held = labeled.where(labeled.doc_id % 5 == 0)
    w, b = classifier.logreg_train(train, feats, n_iters=40, lr=1.0)
    zero_loss = classifier.logloss(held, feats, [0.0] * len(feats), 0.0)
    trained_loss = classifier.logloss(held, feats, w, b)
    assert trained_loss < zero_loss
    scored = classifier.logreg_score(held, feats, w, b)
    assert scored.where("p_keep IS NULL").count() == 0
