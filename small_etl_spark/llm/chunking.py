"""Document chunking for training pipelines: split each document into
~``chunk_tokens``-token windows with ``overlap`` tokens of context
carried between consecutive chunks.

Pure array expressions — tokens → strided windows via ``sequence`` +
``slice`` → ``posexplode`` — one map-only pass, rows out ≈ tokens/step
per doc. No Python, no shuffle; at 100 TB chunking is scan-bound and
embarrassingly parallel, exactly as it should be.

Note the token definition is the word-regex tokenizer shared by all
text stats (a BPE-ish budget proxy); swap in a real tokenizer via a
Pandas UDF only if chunk boundaries must match a model's vocabulary —
the plumbing (stride math, posexplode shape, ids) stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from small_etl_spark.llm.textstats import tokens


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    context_len: int = 2048,
    order_col: str | None = None,
) -> DataFrame:
    """Assign documents/chunks to training-sequence packs: the
    concat-then-cut strategy real pre-training pipelines use — stream
    the corpus in a deterministic order, accumulate token counts, and
    start pack ``k`` at token offset ``k·context_len``.

    ``pack_id = floor(tokens_before / context_len)`` from one window
    cumsum — a single shuffle on the (empty) global ordering at small
    scale; at 100 TB order by a partition-friendly key instead (e.g.
    shard hash, then pack per shard: ``Window.partitionBy(shard)``)
    so no global sort exists. Returns the input plus
    ``pack_id, pack_offset`` (the doc's token start within its pack's
    coordinate space).
    """
    from pyspark.sql import Window

    order = order_col or id_col
    w = Window.orderBy(order)
    before = F.coalesce(
        F.sum(F.col(n_tokens_col)).over(w) - F.col(n_tokens_col), F.lit(0)
    )
    return df.withColumns(
        {
            "pack_id": F.floor(before / F.lit(context_len)).cast("bigint"),
            "pack_offset": (before % F.lit(context_len)).cast("bigint"),
        }
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """One row per chunk: ``doc_id, chunk_idx, chunk_text, n_tokens``.

    Stride = chunk_tokens - overlap; the final chunk may be short;
    empty docs yield one empty chunk (so no document silently
    disappears from the corpus — filter on ``n_tokens`` explicitly).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.lower(F.col(text_col)))
    n = F.size(toks)
    # number of windows: ceil(max(n - overlap, 1) / step) via int math
    n_chunks = F.greatest(
        (F.greatest(n - F.lit(overlap), F.lit(1)) + F.lit(step - 1))
        / F.lit(step),
        F.lit(1),
    ).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice(toks, i * step + 1, chunk_tokens)),
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(windows).alias("chunk_idx", "chunk_text"),
    ).withColumn(
        "n_tokens", F.size(tokens(F.col("chunk_text"))).cast("bigint")
    )
