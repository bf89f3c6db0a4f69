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

import re
from collections.abc import Iterable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

#: transformar_mensual.py:131: utf-8 first, BOM variant, then latin-1.
ENCODINGS: tuple[str, ...] = ("UTF-8", "ISO-8859-1")

#: transformar_mensual.py:112-118: yearly extract filenames, daily files
#: excluded.
YEAR_FILE_RE = re.compile(r"^(20\d{2})-Gasto(-Mensual)?\.csv$", re.IGNORECASE)


def discover_year_files(
    raw_dir: str | Path,
    years: Iterable[int] | None = None,
) -> list[Path]:
    """SRC5/FLT8/SRT4 — glob the raw zone for yearly extracts, keep files
    matching the ``<year>-Gasto[-Mensual].csv`` pattern (never ``Diario``),
    optionally restricted to requested years, sorted by (year, name) —
    the reference CLI's file-planning step
    (transformar_mensual.py:208-224)."""
    wanted = set(years) if years else None
    found: list[tuple[int, str, Path]] = []
    for p in Path(raw_dir).glob("*.csv"):
        m = YEAR_FILE_RE.match(p.name)
        if not m or "diario" in p.name.lower():
            continue
        year = int(m.group(1))
        if wanted is not None and year not in wanted:
            continue
        found.append((year, p.name, p))
    return [p for _, _, p in sorted(found)]


def read_monthly_csv(
    spark: SparkSession,
    path: str | list[str],
    encodings: tuple[str, ...] = ENCODINGS,
) -> DataFrame:
    """All-string CSV scan (SRC1/SRC2): header row, quoted fields, skip
    malformed lines, types deferred to normalization (schema-on-read).
    ``path`` may be one file or a list — a list scans as one plan."""
    paths = [str(p) for p in path] if isinstance(path, list) else str(path)
    last_err: Exception | None = None
    for enc in encodings:
        df = (
            spark.read.option("header", True)
            .option("quote", '"')
            .option("escape", '"')
            .option("mode", "DROPMALFORMED")
            .option("encoding", enc)
            .option("inferSchema", False)
            .csv(paths)
        )
        try:
            df.limit(1).collect()  # probe: decode errors surface here
            return df
        except Exception as err:  # noqa: BLE001 - fall through to next encoding
            last_err = err
    raise last_err if last_err else ValueError(f"no readable encoding for {path}")


def sniff_csv(path: str | Path, sample_bytes: int = 64 * 1024) -> list[str]:
    """Separator/encoding sniffing report — the reference README documents
    a ``comprobacion.py`` utility for this that its repo never shipped
    (README.md:190-196); this is that tool.  Driver-side metadata probe
    over the first ``sample_bytes`` only.
    """
    raw = Path(path).open("rb").read(sample_bytes)
    enc = "UTF-8"
    if raw.startswith(b"\xef\xbb\xbf"):
        enc = "UTF-8-SIG"
    else:
        try:
            raw.decode("utf-8")
        except UnicodeDecodeError:
            enc = "ISO-8859-1"
    text = raw.decode(enc.replace("-SIG", ""), errors="replace")
    header = text.splitlines()[0] if text else ""
    seps = {s: header.count(s) for s in (",", ";", "\t", "|")}
    sep = max(seps, key=seps.get)
    return [
        f"encoding: {enc}",
        f"separator: {sep!r} (counts: {seps})",
        f"columns: {len(header.split(sep)) if header else 0}",
        f"header: {header[:120]}",
    ]
