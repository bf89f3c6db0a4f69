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
    standardize: bool = False,
) -> tuple[list[float], float]:
    """Train logistic regression; returns (weights, bias).

    ``label_col`` must be 0/1.  Gradient of mean log-loss:
    ``(1/n) Σ (σ(z) − y) x``, computed as one ``F.sum`` per feature in a
    single aggregate pass; σ runs JVM-side (built-in exp).

    ``standardize=True`` trains on z-scored features and maps the
    weights back to RAW feature space before returning — callers score
    raw frames either way.  Use it whenever the features aren't already
    unit-ish scale: full-batch GD on ill-conditioned geometry (a
    near-constant feature like the profile zone's ``mean_token_len``
    ≈ 4.5, next to 0-1 ratios) oscillates at any lr big enough to make
    progress.  Cost: ONE extra aggregate pass (per-feature mean/stddev,
    the model-artifact collect pattern).  With ``l2``, the penalty
    applies to the standardized weights — the scale-free regularization
    one usually wants.
    """
    if standardize:
        stats = df.agg(
            *[F.avg(c).alias(f"mu_{i}") for i, c in enumerate(feature_cols)],
            *[
                F.stddev_pop(c).alias(f"sd_{i}")
                for i, c in enumerate(feature_cols)
            ],
        ).collect()[0]
        if stats["mu_0"] is None:
            raise ValueError("cannot train on an empty frame")
        mus = [float(stats[f"mu_{i}"]) for i in range(len(feature_cols))]
        sds = [
            float(stats[f"sd_{i}"]) or 1.0  # constant feature → no-op
            for i in range(len(feature_cols))
        ]
        norm = df.select(
            F.col(label_col),
            *[
                ((F.col(c) - F.lit(m)) / F.lit(s)).alias(c)
                for c, m, s in zip(feature_cols, mus, sds)
            ],
        )
        w_std, b_std = logreg_train(
            norm, feature_cols, label_col, n_iters, lr, l2,
            standardize=False,
        )
        w = [wi / si for wi, si in zip(w_std, sds)]
        b = b_std - sum(wi * mi / si for wi, mi, si in zip(w_std, mus, sds))
        return w, b
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


def auc(df: DataFrame, score_col: str, label_col: str = "label") -> float:
    """ROC AUC of a scored frame via the Mann-Whitney rank statistic
    with mid-ranks for ties: group by score, cumulative-count the
    groups below each score, and every member of a tie group takes the
    tie's mid-rank — the exact AUC, not a trapezoid approximation.

    Scale shape: one hash agg to the distinct-score frame, then an
    ordered window over THAT frame.  The window is partition-less by
    necessity (ranks are global), so this is an EVAL-frame operation —
    labeled samples, held-out folds — not a corpus-wide one; quantize
    the score upstream if a corpus-sized frame must be AUC'd (mid-rank
    ties make bucketing well-defined)."""
    from pyspark.sql import Window

    g = df.groupBy(F.col(score_col).alias("s")).agg(
        F.count("*").alias("n"),
        F.sum(F.col(label_col).cast("long")).alias("np"),
    )
    w = Window.orderBy("s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = g.withColumn(
        "cum_less", F.coalesce(F.sum("n").over(w), F.lit(0))
    )
    row = ranked.agg(
        F.sum(
            F.col("np").cast("double")
            * (F.col("cum_less") + (F.col("n") + 1) / 2.0)
        ).alias("rank_sum"),
        F.sum("np").alias("n_pos"),
        F.sum("n").alias("n_all"),
    ).collect()[0]
    n_pos = int(row["n_pos"] or 0)
    n_neg = int(row["n_all"] or 0) - n_pos
    if n_pos == 0 or n_neg == 0:
        raise ValueError(
            f"AUC undefined: n_pos={n_pos}, n_neg={n_neg} (need both "
            "classes in the eval frame)"
        )
    return float(
        (row["rank_sum"] - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
    )


def kfold_eval(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    key_col: str = "doc_id",
    k: int = 5,
    n_iters: int = 40,
    lr: float = 1.0,
    l2: float = 0.0,
    standardize: bool = True,
) -> list[dict]:
    """K-fold cross-validation of the logistic-regression quality
    classifier: deterministic hash folds (the ``kfold_assign``
    mechanics — salt "fold", stable across runs/partitionings/appends,
    so experiments compare like with like), train on k−1 folds, report
    held-out AUC + log-loss per fold.  This is the measured quality
    number ``corpus-build --classifier-model`` should ship with —
    train-set loss alone flatters any model.

    Returns one dict per fold:
    ``{fold, n_train, n_eval, auc, logloss, logloss_zero}`` where
    ``logloss_zero`` is the all-zero model's held-out loss (the
    baseline a useful model must beat).  Scale: each fold is one
    ``logreg_train`` (n_iters bounded aggregate passes, d+1-double
    collects) over a frame the caller should cache/checkpoint."""
    from .sampling import hash_bucket

    folded = df.withColumn(
        "_fold", (hash_bucket(key_col, "fold") % k).cast("int")
    )
    out = []
    for i in range(k):
        train = folded.where(F.col("_fold") != i)
        held = folded.where(F.col("_fold") == i)
        w, b = logreg_train(
            train, feature_cols, label_col, n_iters=n_iters, lr=lr, l2=l2,
            standardize=standardize,
        )
        scored = logreg_score(held, feature_cols, w, b)
        out.append(
            {
                "fold": i,
                "n_train": train.count(),
                "n_eval": held.count(),
                "auc": round(auc(scored, "p_keep", label_col), 4),
                "logloss": round(
                    logloss(held, feature_cols, w, b, label_col), 4
                ),
                "logloss_zero": round(
                    logloss(
                        held,
                        feature_cols,
                        [0.0] * len(feature_cols),
                        0.0,
                        label_col,
                    ),
                    4,
                ),
            }
        )
    return out
