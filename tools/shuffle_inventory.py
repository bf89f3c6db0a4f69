"""Shuffle inventory: count data-movement operators in every declared
query's PHYSICAL plan — the measured form of SCALE.md's design claims.

Usage: python tools/shuffle_inventory.py [sf_dir] [--markdown]

For each query, reports:
- n_shuffle:   ShuffleExchange nodes (hash/range repartitions — the
               operators that cost network at cluster scale)
- n_broadcast: BroadcastExchange nodes (small-side replication — cheap
               by design, but each one asserts "this side stays small";
               the count makes those assertions reviewable)
- n_scan:      file scans (re-reads of a source inside one plan)
- n_sort:      Sort nodes (global sorts outside TakeOrdered are the
               expensive kind)

Three caveats stated so the numbers are read honestly:
- iterative operators (connected components, k-means) build their
  final plan AFTER eagerly checkpointing per-round state — the per-round
  shuffles do not appear in the final plan's counts; SCALE.md documents
  those separately (O(log diameter) rounds × O(1) shuffles).
- localCheckpoint barriers hide everything upstream of them the same
  way: corpus_clean_final / corpus_select checkpoint a slim flag
  projection at build time (a deliberate, measured codegen-limit fix),
  so their reported counts cover only the post-barrier remainder (e.g.
  corpus_select shows 0 scans) — and iterating this inventory over all
  queries EXECUTES those profile scans at plan-build time.
- AQE may collapse or convert exchanges at runtime (broadcast promotion,
  partition coalescing), so these are static upper bounds.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

PATTERNS = {
    # real data-movement exchanges only: 'BroadcastExchange
    # HashedRelationBroadcastMode' must NOT match (the r6 code review
    # caught the case-insensitive 'Exchange Hashed' false positive that
    # double-counted every broadcast as a shuffle)
    "n_shuffle": re.compile(
        r"(?<!Broadcast)Exchange (?:hashpartitioning|rangepartitioning|"
        r"RoundRobinPartitioning|SinglePartition)"
    ),
    "n_broadcast": re.compile(r"BroadcastExchange"),
    "n_scan": re.compile(r"FileScan|Scan parquet"),
    # tree lines are prefixed "+-"/":-"/"*(n)"; match the node name
    # anywhere after such a prefix ("Sort [" is the operator's print
    # form; TakeOrderedAndProject deliberately does NOT match)
    "n_sort": re.compile(r"(?:\+-|:-|^)\s*\*?\(?\d*\)?\s*Sort \[", re.M),
}


def inventory(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    import __spark_entry__ as entry

    from proyecto_gasto_publico_etl_per__spark.operators.skew import (
        release_pinned,
    )

    out: dict[str, dict[str, int]] = {}
    for name, fn in sorted(entry.queries().items()):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        out[name] = {
            k: len(p.findall(plan)) for k, p in PATTERNS.items()
        }
        # release guarded-broadcast pins made during plan build
        # (round-9 lifecycle)
        release_pinned()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    md = "--markdown" in sys.argv
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    inv = inventory(spark, sf_dir)
    if md:
        print("| query | shuffles | broadcasts | scans | sorts |")
        print("|---|---|---|---|---|")
        for name, c in inv.items():
            print(
                f"| {name} | {c['n_shuffle']} | {c['n_broadcast']} "
                f"| {c['n_scan']} | {c['n_sort']} |"
            )
    else:
        w = max(len(n) for n in inv)
        for name, c in inv.items():
            print(
                f"{name:{w}s}  shuffle={c['n_shuffle']:<2d} "
                f"bcast={c['n_broadcast']:<2d} scan={c['n_scan']:<2d} "
                f"sort={c['n_sort']}"
            )
    tot = {k: sum(c[k] for c in inv.values()) for k in PATTERNS}
    print(f"\n{len(inv)} queries; totals: {tot}")
    worst = sorted(inv.items(), key=lambda kv: -kv[1]["n_shuffle"])[:5]
    print("most shuffles:", [(n, c["n_shuffle"]) for n, c in worst])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
