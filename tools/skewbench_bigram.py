"""A/B skew micro-bench for bigram_fluency_score's context join
(round-6 verdict #6).

The context-count join keys on bare ``w1`` — Zipf-skewed at corpus
scale: the top word appears in a large constant fraction of all bigram
positions, so a shuffled equi-join lands that whole posting list on one
reducer.  The fix broadcasts the vocab-bounded ``contexts`` table
(distinct words — bounded regardless of corpus size).

This script builds a deliberately hot-keyed synthetic corpus (50% of
all token positions are the single word ``the``; the rest uniform over
a 10k vocab — harsher skew than natural Zipf) and times the operator
(A) as shipped (broadcast contexts) and (B) with broadcasts disabled so
both joins shuffle — the pre-fix plan shape.  Run:

    python tools/skewbench_bigram.py [n_docs] [tokens_per_doc]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from proyecto_gasto_publico_etl_per__spark.operators import curation  # noqa: E402
from proyecto_gasto_publico_etl_per__spark.session import get_spark  # noqa: E402


def make_corpus(spark, n_docs: int, n_toks: int):
    """Deterministic hot-keyed corpus: position hash decides 'the'
    (p=0.5) vs one of 10k uniform words."""
    h = F.abs(F.hash(F.col("id"), F.col("j")))
    word = F.when(h % 2 == 0, F.lit("the")).otherwise(
        F.concat(F.lit("w"), ((h / 2).cast("long") % 10_000).cast("string"))
    )
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(n_toks)),
                    lambda j: F.when(
                        F.abs(F.hash(F.col("id"), j)) % 2 == 0, F.lit("the")
                    ).otherwise(
                        F.concat(
                            F.lit("w"),
                            (
                                (F.abs(F.hash(F.col("id"), j)) / 2).cast(
                                    "long"
                                )
                                % 10_000
                            ).cast("string"),
                        )
                    ),
                ),
            ).alias("text"),
        )
        # suppress the word-boundary cleaning cost from the measurement
    )


def time_op(df, runs: int = 2) -> float:
    df.write.format("noop").mode("overwrite").save()  # warm
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_toks = int(sys.argv[2]) if len(sys.argv) > 2 else 60
    spark = get_spark("skewbench-bigram")
    spark.sparkContext.setLogLevel("ERROR")

    corpus = make_corpus(spark, n_docs, n_toks)
    corpus.cache().count()

    def ab(op) -> tuple[float, float]:
        """(shipped, all-shuffle) walls for one operator."""
        a = time_op(op(corpus))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        orig = F.broadcast
        F.broadcast = lambda df: df  # neutralize the operator's hint
        try:
            b = time_op(op(corpus))
        finally:
            F.broadcast = orig
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.unset(
                "spark.sql.adaptive.autoBroadcastJoinThreshold"
            )
        return a, b

    print(f"n_docs={n_docs} toks/doc={n_toks} hot-key frac=0.5 vocab=10001")
    for label, op in (
        ("bigram_fluency_score", curation.bigram_fluency_score),
        ("unigram_freq_score", curation.unigram_freq_score),
    ):
        a, b = ab(op)
        print(
            f"{label}: broadcast (shipped) {a:.2f}s | "
            f"all-shuffle (pre-fix) {b:.2f}s | speedup {b / a:.2f}x"
        )


if __name__ == "__main__":
    main()
