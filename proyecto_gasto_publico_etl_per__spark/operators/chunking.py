"""Document chunking: fixed-size token windows with overlap.

The standard pre-tokenization step of an LLM training-data pipeline:
long documents split into ``size``-token chunks advancing by ``stride``
tokens (overlap = size - stride), each chunk carrying its ordinal and
its own token count (the tail chunk may be short).

Spark shape: one ``sequence`` of window starts per document, exploded —
a map-only pipeline (no shuffle, no UDF); output rows ≈ corpus tokens /
stride.  At 100 TB chunking is embarrassingly parallel and composes with
``repartition`` on (doc, chunk) downstream if a tokenizer stage needs
balanced batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 40,
    stride: int = 30,
) -> DataFrame:
    """(doc, chunk_id, chunk, n_tokens) — whitespace-token windows.

    Chunk starts are 1, 1+stride, 1+2·stride … while a window can begin
    (≤ max(L-size+1, 1)); a document shorter than ``size`` yields one
    chunk, an empty document none.  ``slice`` clamps the tail window.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    max_start = F.greatest(F.size("toks") - (size - 1), F.lit(1))
    starts = F.sequence(F.lit(1), max_start, F.lit(stride))
    exploded = (
        df.select(F.col(id_col).alias("doc"), _tokens(text_col).alias("toks"))
        .where(F.size("toks") > 0)
        .select("doc", "toks", F.explode(starts).alias("start"))
    )
    chunk_toks = F.slice(F.col("toks"), F.col("start"), size)
    return exploded.select(
        "doc",
        ((F.col("start") - 1) / stride).cast("int").alias("chunk_id"),
        F.concat_ws(" ", chunk_toks).alias("chunk"),
        F.size(chunk_toks).alias("n_tokens"),
    )
