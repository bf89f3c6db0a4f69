"""Distributed training for the quality-classifier slot.

Round 5 shipped classifier INFERENCE (``quality_classifier_filter``:
linear scoring with literal weights, oracle-checked).  This module
closes the loop with logistic-regression TRAINING as pure Spark
aggregates — the fastText-style quality-filter workflow (label a few
thousand docs "reference-like"/"crawl-like", train, score the corpus)
without leaving the engine:

- per iteration, ONE aggregate pass computes the full batch gradient
  (d+1 sums — O(d) driver state, the model-artifact collect pattern);
- the weight update happens driver-side (the model IS driver state, a
  few floats, exactly like IVF centroids between Lloyd steps);
- features never leave the executors; at 100 TB each iteration is one
  map-side-combined agg over the feature frame, no shuffle wider than
  d+1 doubles per partition.

Full-batch gradient descent, not SGD: deterministic up to float-sum
ordering, embarrassingly data-parallel, and the d ≪ corpus regime a
quality filter lives in (a handful of engineered features) converges in
tens of iterations.  Cache/checkpoint the feature frame before calling
— each iteration re-reads it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _margin(feature_cols: list[str], weights: list[float], bias: float):
    z = F.lit(bias)
    for c, w in zip(feature_cols, weights):
        z = z + F.col(c) * F.lit(w)
    return z


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_iters: int = 50,
    lr: float = 0.5,
    l2: float = 0.0,
) -> tuple[list[float], float]:
    """Train logistic regression; returns (weights, bias).

    ``label_col`` must be 0/1.  Gradient of mean log-loss:
    ``(1/n) Σ (σ(z) − y) x``, computed as one ``F.sum`` per feature in a
    single aggregate pass; σ runs JVM-side (built-in exp).
    """
    n = df.count()
    if n == 0:
        raise ValueError("cannot train on an empty frame")
    # F.sum silently skips NULLs while `n` counts every row, which would
    # bias every gradient with no error — refuse NULLs up front instead
    null_counts = df.agg(
        *[
            F.count(F.when(F.col(c).isNull(), 1)).alias(c)
            for c in [*feature_cols, label_col]
        ]
    ).collect()[0]
    bad = {c: null_counts[c] for c in null_counts.asDict() if null_counts[c]}
    if bad:
        raise ValueError(
            f"NULLs in training columns {bad}: impute or filter before "
            "training (sum-skips-null would silently bias the gradient)"
        )
    weights = [0.0] * len(feature_cols)
    bias = 0.0
    y = F.col(label_col).cast("double")
    for _ in range(n_iters):
        z = _margin(feature_cols, weights, bias)
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - y
        sums = df.agg(
            F.sum(err).alias("g_bias"),
            *[
                F.sum(err * F.col(c)).alias(f"g_{i}")
                for i, c in enumerate(feature_cols)
            ],
        ).collect()[0]  # d+1 doubles: the model-artifact collect pattern
        bias -= lr * sums["g_bias"] / n
        weights = [
            w - lr * (sums[f"g_{i}"] / n + l2 * w)
            for i, w in enumerate(weights)
        ]
    return weights, bias


def logreg_score(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    bias: float,
    out_col: str = "p_keep",
) -> DataFrame:
    """Attach σ(w·x + b) — the learned-model inference path, same shape
    as ``quality_classifier_filter``'s literal-weight scoring."""
    z = _margin(feature_cols, weights, bias)
    return df.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


def logloss(
    df: DataFrame,
    feature_cols: list[str],
    weights: list[float],
    bias: float,
    label_col: str = "label",
) -> float:
    """Mean log-loss of a model on a frame (one aggregate pass) — the
    train/eval metric for early stopping and for tests."""
    z = _margin(feature_cols, weights, bias)
    y = F.col(label_col).cast("double")
    # numerically stable: log(1+e^z) - y*z  ==  -[y log p + (1-y) log(1-p)]
    loss = F.when(z > 0, z + F.log(F.lit(1.0) + F.exp(-z))).otherwise(
        F.log(F.lit(1.0) + F.exp(z))
    ) - y * z
    row = df.agg(
        F.avg(loss).alias("ll"), F.count("*").alias("n")
    ).collect()[0]
    if row["n"] == 0:
        raise ValueError("cannot score an empty frame")
    return float(row["ll"])
