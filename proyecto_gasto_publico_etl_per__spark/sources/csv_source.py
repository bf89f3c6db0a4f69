"""CSV source with encoding fallback and malformed-line tolerance.

Reference behavior (ETL Gasto publico Perú/etl/transformar_mensual.py:131-179):
read ``dtype=str`` in 300k-row chunks with ``sep=","``, ``quotechar='"'``,
``on_bad_lines="skip"``, trying encodings utf-8 → utf-8-sig → latin-1 and a
python-engine fallback per encoding.

Spark restatement: one lazy partitioned scan per encoding attempt — chunking
is subsumed by the partitioned file scan (no driver-side loop over chunks),
malformed lines are dropped by ``mode=DROPMALFORMED``, and the BOM case
(utf-8-sig) is handled natively by Spark's UTF-8 reader.  The encoding retry
stays a driver-side loop (it is metadata discovery, not dataflow): we probe
by forcing a tiny action and fall through on decode errors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: transformar_mensual.py:131: utf-8 first, BOM variant, then latin-1.
ENCODINGS: tuple[str, ...] = ("UTF-8", "ISO-8859-1")


def read_monthly_csv(
    spark: SparkSession,
    path: str,
    encodings: tuple[str, ...] = ENCODINGS,
) -> DataFrame:
    """All-string CSV scan (SRC1/SRC2): header row, quoted fields, skip
    malformed lines, types deferred to normalization (schema-on-read)."""
    last_err: Exception | None = None
    for enc in encodings:
        df = (
            spark.read.option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .option("mode", "DROPMALFORMED")
            .option("encoding", enc)
            .option("inferSchema", False)
            .csv(path)
        )
        try:
            df.limit(1).collect()  # probe: decode errors surface here
            return df
        except Exception as err:  # noqa: BLE001 - fall through to next encoding
            last_err = err
    raise last_err if last_err else ValueError(f"no readable encoding for {path}")
