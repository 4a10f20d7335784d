"""Byte-pair-encoding merge learning on DataFrames.

The tokenizer-training step of an LLM data pipeline: learn the first
``iters`` BPE merge rules from a corpus, entirely with DataFrame
built-ins — no Python row UDFs, no driver-side loops over data.

Greedy BPE semantics (left-to-right, non-overlapping — what every
tokenizer trainer implements) are made set-expressible with a
gaps-and-islands argument: two merge candidates can only overlap when
the pair is a repeated symbol (cand[i] and cand[i+1] both true forces
a == b), so maximal chains of consecutive candidate positions are
exactly the repeated-symbol runs, and greedy keeps the candidates at
EVEN offset from their chain start. That turns the sequential scan
into two window functions — identical SQL replays in the DuckDB
oracle (see ``queries.py::q_bpe_merges``).

Scale shape per iteration: one pair-count aggregation (pair-vocab
sized, map-side combined), a 1-row top-pair broadcast, and two
window passes partitioned by word (bounded groups — a word's symbol
sequence). The corpus itself is touched once, at setup, to build the
(word, cnt) frequency table; everything after runs on the distinct
vocabulary, which is the standard trick that makes BPE training
corpus-size-independent after the first pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, cnt)`` over space-separated tokens (the same split
    convention as the bigram/PMI family).

    Deliberately no ensure_parallelism: the split is cheap and feeds
    a groupBy shuffle immediately — pre-repartitioning measured
    ~0.4 s slower at sf0.1. (Contrast doc_ngram_novelty, whose
    per-row shingle construction is heavy enough to win 5× from it.)
    """
    return (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts weighted by word frequency."""
    n = F.size("syms")
    pairs = seqs.select(
        "cnt",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.greatest(n - 1, F.lit(0))),
                F.slice(F.col("syms"), 2, F.greatest(n - 1, F.lit(0))),
                lambda x, y: F.struct(x.alias("a"), y.alias("b")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.sum("cnt").alias("pair_count")
    )


def _apply_merge(seqs: DataFrame, top: DataFrame) -> DataFrame:
    """Replace every greedy occurrence of the top pair (a,b) with the
    merged symbol a||b in each word's symbol sequence."""
    w = Window.partitionBy("word").orderBy("pos")
    ex = (
        seqs.select("word", "cnt", F.posexplode("syms").alias("pos", "sym"))
        .crossJoin(F.broadcast(top.select("a", "b")))
        .withColumn("nxt", F.lead("sym").over(w))
    )
    cand = F.coalesce(
        (F.col("sym") == F.col("a")) & (F.col("nxt") == F.col("b")),
        F.lit(False),
    )
    ex = ex.withColumn("cand", cand).withColumn(
        "rn",
        F.sum(F.col("cand").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ex = ex.withColumn(
        "chain", F.when(F.col("cand"), F.col("pos") - F.col("rn"))
    )
    ex = ex.withColumn(
        "cstart", F.min("pos").over(Window.partitionBy("word", "chain"))
    )
    ex = ex.withColumn(
        "mstart",
        F.col("cand") & (((F.col("pos") - F.col("cstart")) % 2) == 0),
    )
    ex = ex.withColumn(
        "consumed", F.coalesce(F.lag("mstart").over(w), F.lit(False))
    )
    kept = ex.filter(F.col("mstart") | ~F.col("consumed")).select(
        "word",
        "cnt",
        "pos",
        F.when(
            F.col("mstart"), F.concat(F.col("sym"), F.col("nxt"))
        ).otherwise(F.col("sym")).alias("sym"),
    )
    return (
        kept.groupBy("word", "cnt")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "sym"))),
                lambda s: s["sym"],
            ).alias("syms")
        )
    )


def bpe_merges(
    df: DataFrame, text_col: str = "text", iters: int = 3
) -> DataFrame:
    """Learn the first ``iters`` BPE merge rules from a corpus.

    Returns ``(iter, left, right, pair_count)`` — one row per learned
    merge, in order. Ties on pair count break lexicographically on
    (left, right), so the whole learning run is deterministic and
    engine-independent (all arithmetic is integer).
    """
    freqs = word_frequencies(df, text_col)
    seqs = freqs.select(
        "word", "cnt", F.split(F.col("word"), "").alias("syms")
    )
    merges: list[DataFrame] = []
    for i in range(1, iters + 1):
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("pair_count").desc(), "a", "b")
            .limit(1)
            .localCheckpoint()  # cut lineage: each round's plan would
            # otherwise nest the full previous round's window cascade
        )
        merges.append(
            top.select(
                F.lit(i).cast("bigint").alias("iter"),
                # lhs/rhs, not left/right: the oracle needs the same
                # names and LEFT/RIGHT are reserved words in SQL
                F.col("a").alias("lhs"),
                F.col("b").alias("rhs"),
                "pair_count",
            )
        )
        if i < iters:
            seqs = _apply_merge(seqs, top).localCheckpoint()
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("iter")


def bpe_encode_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    iters: int = 3,
) -> DataFrame:
    """Apply a corpus-learned BPE tokenizer and count pieces per doc —
    the "how many tokens is my corpus under MY tokenizer" budgeting
    step (whitespace token counts routinely misestimate BPE budgets
    by 20-40%).

    Learns ``iters`` merges exactly as :func:`bpe_merges` (same
    deterministic tie-break), applies EVERY merge (including the
    last) to the word-frequency table, then joins the resulting
    word → piece-count map back to the exploded corpus. Returns
    ``(id_col, n_words, n_pieces)``; docs with no words keep 0/0.

    Scale shape: merges are learned on the word-FREQUENCY table
    (vocab-sized, not corpus-sized); the per-doc pass is one explode +
    one vocab-sized equi-join + one sum — the corpus is scanned once
    regardless of ``iters``.
    """
    freqs = word_frequencies(df, text_col)
    seqs = freqs.select("word", "cnt", F.split(F.col("word"), "").alias("syms"))
    for _ in range(iters):
        top = (
            _pair_counts(seqs)
            .orderBy(F.col("pair_count").desc(), "a", "b")
            .limit(1)
            .localCheckpoint()
        )
        seqs = _apply_merge(seqs, top).localCheckpoint()
    word_len = seqs.select(
        "word", F.size("syms").cast("bigint").alias("__npw__")
    )
    doc_words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word")
    ).filter(F.col("word") != "")
    scored = (
        doc_words.join(word_len, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("__npw__").alias("n_pieces"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_words", F.lit(0)).alias("n_words"),
            F.coalesce("n_pieces", F.lit(0)).alias("n_pieces"),
        )
    )
