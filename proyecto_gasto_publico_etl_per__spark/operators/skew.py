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

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__gasto_salt"

#: every frame ``broadcast_if_bounded`` has pinned and not yet released
#: (round-9 lifecycle: persist() leaked executor memory across long
#: sessions — the 151-query bench held ~5 vocab frames forever)
_PINNED: list[DataFrame] = []


def broadcast_if_bounded(
    df: DataFrame, max_rows: int = 8_000_000
) -> DataFrame:
    """Guarded broadcast hint for vocab-shaped small sides (round-7
    advice): count the frame and attach ``F.broadcast`` only below
    ``max_rows``; above it, return the frame unhinted so the join falls
    back to a shuffled plan (AQE skew-split handles the hot keys)
    instead of failing on Spark's 8 GB broadcast hard cap.  The frame
    is ``persist()``ed first so the guard count feeds the subsequent
    join rather than being a wasted extra pass (and the cached blocks
    stay recomputable from lineage on executor loss, unlike a
    localCheckpoint pin).

    Default 8M rows: a vocab row (short string key + a count long) is
    ≲100 B serialized, keeping the broadcast well under 1 GB — an order
    of magnitude inside the hard limit.  Batch-only: the count is an
    eager action, so never call this on a streaming frame.

    Lifecycle: the pin is registered module-side; call
    ``release_pinned()`` between queries in a long-lived session to
    return the cached blocks (the operator itself cannot unpersist —
    its caller returns a LAZY frame, so the pin must survive until the
    caller's action has run).
    """
    pinned = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PINNED.append(pinned)
    if pinned.count() <= max_rows:
        return F.broadcast(pinned)
    return pinned


def release_pinned() -> int:
    """Unpersist every frame ``broadcast_if_bounded`` has pinned since
    the last release and return how many were freed.  Safe to call at
    any query boundary: a released frame that some still-lazy plan
    references is simply recomputed from lineage on the next action
    (correctness is unaffected — only the cache is dropped).  Long
    sessions (the 151-query bench loop, the correctness gate) call
    this between queries so vocab caches don't accumulate executor
    memory for the whole run."""
    n = 0
    while _PINNED:
        _PINNED.pop().unpersist()
        n += 1
    return n


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
