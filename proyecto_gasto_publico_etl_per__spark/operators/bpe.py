"""BPE tokenizer induction and encoding at corpus scale.

The reference has no tokenizer surface at all; this is the training-data
extension of the `bpe_merge_step` declared query (one iteration, oracle-
checked) into the full loop a SentencePiece/GPT-style byte-pair encoder
needs:

- ``bpe_train``  — learn ``n_merges`` merge rules.  The corpus is read
  ONCE to build the (word, freq) vocabulary; every iteration after that
  runs over the vocab table — |vocab| rows, corpus-size-independent —
  exactly like the classic single-machine trick, but each iteration is
  a Spark aggregate so a 10⁹-type vocab still distributes.  Driver
  state is the merge list itself (the MODEL artifact — same collect
  policy as IVF centroids / SQ8 codebooks: a few KB by construction).
- ``bpe_encode`` — tokenize a document frame with learned rules.  Runs
  the merge folds over the frame's DISTINCT words, then broadcast-joins
  the word→tokens map back onto documents — encode cost is |vocab|
  folds + one join, not |corpus| folds.

Both use the same pure fold-left merge (``_apply_merge``): adjacent
(a, b) symbol pairs collapse leftmost-first, the standard BPE
application order.  Iterative lineage is cut with ``localCheckpoint``
per round (the dedup/CC pattern) and, in ``bpe_encode``, every
``checkpoint_every`` merges so the expression chain never outgrows
janino's method limit (the round-5 corpus_clean_final lesson).

Simplification vs production BPE: no end-of-word marker and character
(not byte) alphabet — the marker is one extra symbol in the initial
split and changes nothing structurally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens
from .skew import broadcast_if_bounded
from ..sources.tables import fan_out


def _empty_syms() -> Column:
    return F.array().cast("array<string>")


def _apply_merge(symbols: Column | str, a: str, b: str) -> Column:
    """Fold-left application of one merge rule: every adjacent (a, b)
    becomes a+b, leftmost-first, non-overlapping (merging "aa" in
    "aaa" yields ["aa", "a"])."""
    merged = a + b
    return F.aggregate(
        symbols,
        _empty_syms(),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def build_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq, symbols): the one corpus-pass; symbols start as the
    word's characters."""
    uni = fan_out(docs).select(F.explode(_tokens(text_col)).alias("w"))
    vocab = uni.groupBy("w").agg(F.count("*").alias("freq"))
    # split("abc", "") → [a, b, c] (no trailing empty element in Spark)
    return vocab.select("w", "freq", F.split("w", "").alias("symbols"))


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 20,
    min_pair_freq: int = 2,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn up to ``n_merges`` BPE merge rules from a document frame.

    Returns (merge rules in application order, final vocab frame with
    the trained segmentation in ``symbols``).  Stops early when no
    adjacent pair reaches ``min_pair_freq``.  Ties break (freq desc,
    a asc, b asc) so training is deterministic.
    """
    vocab = build_vocab(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    pair_arr = F.when(
        F.size("symbols") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("symbols") - 1),
            lambda i: F.struct(
                F.element_at("symbols", i).alias("a"),
                F.element_at("symbols", i + 1).alias("b"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    for _ in range(n_merges):
        best = (
            vocab.select("freq", F.explode(pair_arr).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()  # 1-row model artifact, the IVF-centroid pattern
        )
        if not best or best[0].n < min_pair_freq:
            break
        a, b = best[0].a, best[0].b
        merges.append((a, b))
        vocab = vocab.withColumn(
            "symbols", _apply_merge("symbols", a, b)
        ).localCheckpoint(eager=True)  # lineage cut per round (CC pattern)
    return merges, vocab


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    checkpoint_every: int = 8,
) -> DataFrame:
    """Tokenize documents with learned merge rules: (id, tokens).

    Merge folds run over the frame's DISTINCT words only; documents then
    join the finished word→tokens map on the word key with the map side
    EXPLICITLY broadcast (round-7 skew audit: the corpus posting side
    is Zipf-skewed on bare word — a shuffled join lands the top word's
    postings on one reducer — while the distinct-word map is
    vocab-bounded at any corpus size; a corpus whose raw vocab outgrows
    broadcast memory should min-df-prune its vocab before BPE anyway,
    as every production tokenizer trainer does).  The hint is guarded
    (``skew.broadcast_if_bounded``): a raw web-scale vocab over the row
    bound falls back to the shuffled AQE plan instead of failing on the
    8 GB broadcast cap.  The fold chain is
    checkpointed every ``checkpoint_every`` merges — each fold is a
    lambda the codegen inlines, and an unbounded chain overflows janino
    exactly like the round-5 filter-inlining incident.
    """
    words = (
        fan_out(docs)
        .select(F.explode(_tokens(text_col)).alias("w"))
        .distinct()
        .withColumn("symbols", F.split("w", ""))
    )
    for i, (a, b) in enumerate(merges):
        words = words.withColumn("symbols", _apply_merge("symbols", a, b))
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint(eager=True)
    exploded = docs.select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("pos", "w")
    )
    encoded = (
        exploded.join(broadcast_if_bounded(words), "w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "symbols"))
                    ),
                    lambda s: s["symbols"],
                )
            ).alias("tokens")
        )
    )
    # posexplode emits nothing for token-less docs (empty/whitespace
    # text) — rejoin so they come back as (id, []) instead of vanishing
    # from what is documented as a pure tokenization step
    return (
        docs.select(id_col)
        .join(encoded, id_col, "left")
        .withColumn("tokens", F.coalesce("tokens", _empty_syms()))
    )
