"""Skew-mitigation joins.

The reference never meets skew (PostgreSQL single-node hash joins,
``ETL Gasto publico Perú/sql/ConsultasAlDataWarehouse.sql``), but at 100 TB
a shuffle join on a hot key (one giant ejecutora, one dominant expense
classifier) stalls a whole stage on one task.  Two engine answers:

1. AQE skew-join splitting (on by default, session.py) — handles skew the
   optimizer can SEE at runtime.
2. ``salted_join`` below — explicit salting for the planned-ahead case:
   the big side scatters each hot key across ``n_salt`` shuffle partitions
   with a deterministic per-row salt; the small side is replicated
   ``n_salt``× so every (key, salt) pair still meets its match.  Result is
   row-for-row identical to the unsalted join (the declared
   ``skew_salted_join`` query proves it against a plain-SQL oracle).

Use ``salted_join`` when the small side is too big to broadcast but small
enough to replicate n_salt times — the gap between broadcast-hash-join
and a skew-split shuffle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__gasto_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salt: int = 16,
) -> DataFrame:
    """Equi-join with the big side's hot keys scattered over ``n_salt``
    shuffle partitions.

    The per-row salt is ``xxhash64`` of the whole row (deterministic under
    task retry, unlike a random or monotonic id); the small side is
    exploded ``n_salt``× so matching pairs co-locate on (key, salt).
    Supports ``inner`` and ``left`` joins — the join types the engine's
    FK-resolution path uses (SURVEY.md §2.5).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if SALT_COL in big.columns or SALT_COL in small.columns:
        raise ValueError(f"{SALT_COL} column name is reserved")

    salted_big = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salt)),
    )
    salted_small = small.withColumn(
        SALT_COL, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    joined = salted_big.join(salted_small, [*on, SALT_COL], how)
    return joined.drop(SALT_COL)
