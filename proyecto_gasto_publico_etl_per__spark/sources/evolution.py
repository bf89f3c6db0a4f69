"""Schema evolution for partitioned parquet tables (SURVEY §2.13).

The reference evolves its warehouse with late DDL —
``ALTER TABLE fact_gasto_mensual ADD COLUMN ...`` / ``ALTER COLUMN ...
TYPE ...`` (``sql/CreacionDeDataWareHouse.sql:149-150``).  On a
partitioned parquet table the two cases split by cost, and the split IS
the 100 TB design:

- **Add a column: metadata-only.**  Nothing is rewritten — new writes
  carry the column, files written before it existed read as NULL under
  ``mergeSchema``, and ``conform_read`` pins the resulting frame to the
  declared contract so downstream plans see one stable schema either
  way.  Rewriting 100 TB to append a NULL column is never the answer.
- **Widen a column's type: rewrite, but only the stale partitions.**
  Parquet ``mergeSchema`` refuses conflicting primitive types (an
  ``int`` file next to a ``bigint`` file fails the read), so a widening
  genuinely requires rewriting files holding the narrow type.
  ``widen_column`` probes each partition's parquet footer DRIVER-side
  (one small ranged read per partition, no dataflow), rewrites only the
  partitions whose physical type differs, and swaps each one
  crash-safely (temp write → row-count verify → two renames, the
  ``maintenance.compact_parquet`` contract).  Partitions already at the
  target type keep their files byte-for-byte.

Only lossless widenings are allowed (``_WIDENINGS``); anything lossy
raises before any file is touched.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .maintenance import _swap_dir, _tmp_dir, _write_verified

#: lossless widenings (spark simpleString → allowed targets).
_WIDENINGS: dict[str, tuple[str, ...]] = {
    "tinyint": ("smallint", "int", "bigint", "double"),
    "smallint": ("int", "bigint", "double"),
    "int": ("bigint", "double", "decimal(18,4)", "decimal(38,18)"),
    "bigint": ("decimal(38,18)",),
    "float": ("double",),
    "decimal(18,4)": ("decimal(38,4)", "decimal(38,18)"),
    "date": ("timestamp_ntz",),
}


def _partition_dirs(table_dir: Path, partition_col: str) -> list[Path]:
    return sorted(
        p
        for p in table_dir.iterdir()
        if p.is_dir() and p.name.startswith(f"{partition_col}=")
    )


def _footer_type(part_dir: Path, column: str) -> str | None:
    """The column's physical Spark type in this partition, from one
    parquet footer (driver-side metadata read, no Spark job); None when
    the column predates this partition's files."""
    import pyarrow.parquet as pq

    files = sorted(part_dir.glob("*.parquet"))
    if not files:
        return None
    schema = pq.read_schema(files[0])
    if column not in schema.names:
        return None
    t = schema.field(column).type
    import pyarrow as pa

    mapping = {
        pa.int8(): "tinyint",
        pa.int16(): "smallint",
        pa.int32(): "int",
        pa.int64(): "bigint",
        pa.float32(): "float",
        pa.float64(): "double",
    }
    if t in mapping:
        return mapping[t]
    if pa.types.is_decimal(t):
        return f"decimal({t.precision},{t.scale})"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return "timestamp_ntz" if t.tz is None else "timestamp"
    return str(t)


def widen_column(
    spark: SparkSession,
    path: str,
    column: str,
    target_type: str,
    partition_col: str = "anio",
) -> list[str]:
    """Widen ``column`` to ``target_type`` across a partitioned parquet
    table, rewriting ONLY the partitions whose stored type is narrower.
    Returns the partition directory names that were rewritten.

    After it completes, a plain (non-mergeSchema) read of the table
    succeeds with the widened type — the parquet analog of the
    reference's ``ALTER COLUMN ... TYPE`` (DW:149-150).
    """
    table_dir = Path(path)
    stale: list[Path] = []
    for part in _partition_dirs(table_dir, partition_col):
        current = _footer_type(part, column)
        if current is None or current == target_type:
            continue
        allowed = _WIDENINGS.get(current, ())
        if target_type not in allowed:
            raise ValueError(
                f"refusing lossy type change {current} -> {target_type} "
                f"for {column} in {part.name}; allowed: {allowed}"
            )
        stale.append(part)
    for part in stale:
        df = spark.read.parquet(str(part)).withColumn(
            column, F.col(column).cast(target_type)
        )
        tmp = _tmp_dir(part)
        _write_verified(spark, df, tmp, partition_col=None)
        _swap_dir(part, tmp)
    return [p.name for p in stale]


def conform_read(
    spark: SparkSession,
    path: str,
    contract: dict[str, str],
    partition_col: str | None = None,
) -> DataFrame:
    """Read an evolved table against a declared column contract: a
    ``mergeSchema`` scan (so pre-evolution files surface added columns
    as NULL), then every contract column is cast/NULL-filled to its
    declared type and selected in contract order — downstream plans see
    ONE stable schema regardless of which schema era each file belongs
    to.  Casts here must still be lossless at read time; widenings that
    parquet cannot merge (int next to bigint) need ``widen_column``
    first."""
    df = spark.read.option("mergeSchema", True).parquet(path)
    cols = []
    for name, dtype in contract.items():
        if name in df.columns:
            cols.append(F.col(name).cast(dtype).alias(name))
        else:
            cols.append(F.lit(None).cast(dtype).alias(name))
    if partition_col and partition_col not in contract:
        cols.append(F.col(partition_col))
    return df.select(*cols)
