"""Optimization r15: the hyperplane sign masks precomputed at
plan-build time must be value-identical to the md5 parity rule the
per-row expression used to evaluate (operators/similarity.py,
``_plane_mask``) — the oracle SQL still computes the per-(plane, dim)
md5 inline, so a drifted mask would break every LSH-family hash gate.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from proyecto_gasto_publico_etl_per__spark.operators.similarity import (
    _PLANE_MAX_DIMS,
    _plane_mask,
    hyperplane_buckets,
)


def test_plane_mask_matches_md5_parity_rule():
    for p in (0, 1, 7, 19):
        mask = _plane_mask(p)
        assert len(mask) == _PLANE_MAX_DIMS
        for d in (0, 1, 2, 63, 64, 255):
            expected = (
                "1"
                if int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16)
                % 2
                == 0
                else "0"
            )
            assert mask[d] == expected, f"plane {p} dim {d}"


def test_buckets_match_inline_md5_expression(spark):
    """The literal-mask bucket must equal the former per-row md5
    expression bucket on real vectors (including an empty vector, whose
    NULL dot must set no bits)."""
    df = spark.createDataFrame(
        [
            (1, [0.5, -0.25, 1.0, 0.0] * 16),  # 64 dims
            (2, [float(i % 7) - 3.0 for i in range(64)]),
            (3, [1e-3] * 3),  # short vector
            (4, []),  # empty → bucket 0 (no bit set)
        ],
        "vec_id bigint, embedding array<double>",
    )
    n_planes = 8
    got = {
        r["doc"]: r["bucket"]
        for r in hyperplane_buckets(df, n_planes=n_planes).collect()
    }
    # reference: the pre-r15 inline md5 expression, verbatim
    v = F.transform(F.col("vec"), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        dot_p = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(F.col("vec")) - 1),
                lambda x, d: x
                * F.when(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(F.lit(f"{p}:"), d.cast("string"))
                            ),
                            1,
                            1,
                        ),
                        16,
                        10,
                    )
                    .cast("int")
                    .bitwiseAND(1)
                    == 0,
                    1.0,
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_p >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    ref = {
        r["doc"]: r["bucket"]
        for r in df.select(
            F.col("vec_id").alias("doc"),
            F.col("embedding").alias("vec"),
        )
        .withColumn("bucket", bucket)
        .collect()
    }
    assert got == ref
    assert got[4] == 0  # empty vector: NULL dots, no bit set


def test_wide_vectors_match_inline_md5(spark):
    """Vectors wider than the r15 256-dim bound (the advice's
    capability gap) must bucket identically to the inline md5-parity
    expression through the widened 4096-dim mask (round 16; a per-row
    fallback branch was rejected by measurement — see
    hyperplane_buckets)."""
    wide = [((-1.0) ** i) * (1.0 + i / 7.0) for i in range(300)]
    df = spark.createDataFrame(
        [(1, wide), (2, [0.5, -0.25, 1.0, 0.0] * 16)],
        "vec_id bigint, embedding array<double>",
    )
    n_planes = 4
    got = {
        r["doc"]: r["bucket"]
        for r in hyperplane_buckets(df, n_planes=n_planes).collect()
    }
    v = F.transform(F.col("vec"), lambda x: x.cast("double"))
    bucket = F.lit(0).cast("bigint")
    for p in range(n_planes):
        dot_p = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(F.col("vec")) - 1),
                lambda x, d: x
                * F.when(
                    F.conv(
                        F.substring(
                            F.md5(
                                F.concat(F.lit(f"{p}:"), d.cast("string"))
                            ),
                            1,
                            1,
                        ),
                        16,
                        10,
                    )
                    .cast("int")
                    .bitwiseAND(1)
                    == 0,
                    1.0,
                ).otherwise(-1.0),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot_p >= 0, F.lit(1 << p)).otherwise(
            F.lit(0)
        )
    ref = {
        r["doc"]: r["bucket"]
        for r in df.select(
            F.col("vec_id").alias("doc"), F.col("embedding").alias("vec")
        )
        .withColumn("bucket", bucket)
        .collect()
    }
    assert got == ref


def test_beyond_mask_raises_loudly(spark):
    """Past the mask bound the bucket expression must raise, naming the
    constant — never silently mis-weight (recall would quietly rot)."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, [0.5] * (_PLANE_MAX_DIMS + 1))],
        "vec_id bigint, embedding array<double>",
    )
    with _pytest.raises(Exception, match="_PLANE_MAX_DIMS"):
        hyperplane_buckets(df, n_planes=2).collect()
