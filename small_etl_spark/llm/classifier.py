"""Distributed text-quality classifier: bag-of-words logistic
regression trained with full-batch gradient descent, entirely as
DataFrame joins/aggregations.

The reference pipeline has no learned component (kenstt/small-etl
filters records with declarative thresholds only — src/transform.rs);
this module adds the capability a production curation pipeline layers
on top: train a cheap linear quality/language classifier ON the
corpus (fastText-style bag of words) and score every document with
it, e.g. the CCNet / GPT-3 "quality filter trained to separate wiki
from crawl" step.

Scale design (the 100 TB argument):
- The MODEL is tiny (``vocab_size`` weights, a bounded-by-contract
  driver-side dict); the DATA never leaves executors. Each GD
  iteration is two shuffles, both tf-shaped: a per-doc margin
  aggregation and a per-token gradient aggregation. The weight table
  is broadcast-joined into both — no shuffle grows with the model.
- Full-batch GD over 100 TB is exactly how distributed L-BFGS /
  parallel SGD epochs are laid out on Spark: partial gradients
  map-side, one treeAggregate-shaped reduce (here a groupBy on the
  token key, which IS the partial-aggregation pattern — Spark plans
  a map-side partial sum before the exchange).
- ``iters`` is small and fixed; per-iteration driver work is a
  ``vocab_size``-row collect (same bounded-collect contract as
  llm/bpe.py's per-merge top-pair collect).
- At real scale the exploded (doc, token, count) relation would be
  persisted across iterations; at test SF recomputing the two-scan
  lineage is cheaper than caching (measured — same trade as
  llm/dedup.py's cache-free MinHash), so the base stays lazy and the
  persist is the caller's choice via ``materialize=True``.

Determinism contract (what the DuckDB oracle replays exactly):
- tokens: ``[A-Za-z0-9_]+`` over ``lower(text)`` (textstats.WORD_RE);
- vocab: top ``vocab_size`` tokens by corpus count, ties broken by
  token ascending;
- features: raw in-document token counts, no bias term, no
  regularization (both documented off so the SQL replay stays a
  mechanical WITH-chain);
- update: ``w -= lr * (1/N) * X^T (sigmoid(Xw) - y)`` with N = total
  document count (including docs with zero vocab tokens — they drop
  out of the gradient naturally because all their features are 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from small_etl_spark.llm.textstats import tokens


def _feature_counts(
    df: DataFrame, label_col: str, text_col: str
) -> DataFrame:
    """(doc_id, y, token, x) raw token counts per document."""
    return (
        df.select(
            F.col("doc_id"),
            F.col(label_col).cast("double").alias("y"),
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy("doc_id", "y", "token")
        .agg(F.count("*").cast("double").alias("x"))
    )


def top_vocab(
    df: DataFrame, text_col: str = "text", vocab_size: int = 64
) -> DataFrame:
    """Top-``vocab_size`` corpus tokens by count, ties by token asc.

    One tf-shaped aggregation + a global top-k (TakeOrderedAndProject
    — no full sort is materialized).
    """
    return (
        df.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token")
    )


def train_logreg_bow(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    vocab_size: int = 64,
    iters: int = 3,
    lr: float = 0.5,
    materialize: bool = False,
) -> DataFrame:
    """Train bag-of-words logistic regression; returns the weight
    table ``(token, weight)`` — ``vocab_size`` rows.

    ``label_col`` must already be numeric 0/1 (cast upstream so the
    labeling rule stays visible at the call site and in the oracle).
    ``materialize=True`` persists the exploded feature relation
    across iterations (the 100 TB setting); default recomputes it
    (faster at test SF, see module docstring).
    """
    spark = df.sparkSession
    n_docs = df.count()
    if n_docs == 0:
        raise ValueError("cannot train a classifier on an empty corpus")
    feats = _feature_counts(df, label_col, text_col)
    vocab = top_vocab(df, text_col, vocab_size)
    feats = feats.join(F.broadcast(vocab), "token").select(
        "doc_id", "y", "token", "x"
    )
    if materialize:
        feats = feats.localCheckpoint(eager=False)

    # Driver-side weight vector: bounded by contract at vocab_size
    # entries (same discipline as bpe_merges' per-iteration collect).
    weights = {r["token"]: 0.0 for r in vocab.collect()}
    for _ in range(iters):
        wdf = spark.createDataFrame(
            sorted(weights.items()), "token string, w double"
        )
        resid = (
            feats.join(F.broadcast(wdf), "token")
            .groupBy("doc_id", "y")
            .agg(F.sum(F.col("x") * F.col("w")).alias("m"))
            .select(
                "doc_id",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("m")))
                    - F.col("y")
                ).alias("r"),
            )
        )
        grad_rows = (
            feats.join(resid, "doc_id")
            .groupBy("token")
            .agg((F.sum(F.col("x") * F.col("r")) / n_docs).alias("g"))
            .collect()
        )
        for row in grad_rows:
            weights[row["token"]] -= lr * row["g"]

    return spark.createDataFrame(
        sorted(weights.items()), "token string, weight double"
    )


def score_logreg_bow(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Score every document with a trained weight table: adds
    ``prob`` = sigmoid(sum of weights of the document's tokens,
    counted with multiplicity). Docs with no vocabulary tokens score
    exactly 0.5.

    One explode + one broadcast join + one per-doc aggregation — the
    scoring pass is a single tf-shaped shuffle regardless of corpus
    size, and the model is always the broadcast side.
    """
    margins = (
        df.select(
            "doc_id",
            F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").cast("double").alias("x"))
        .join(F.broadcast(weights), "token")
        .groupBy("doc_id")
        .agg(F.sum(F.col("x") * F.col("weight")).alias("m"))
    )
    return df.join(margins, "doc_id", "left").withColumn(
        "prob",
        F.lit(1.0)
        / (F.lit(1.0) + F.exp(-F.coalesce(F.col("m"), F.lit(0.0)))),
    ).drop("m")
