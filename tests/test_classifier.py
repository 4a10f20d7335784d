"""llm/classifier.py: bag-of-words logistic regression — exact-GD
parity against a dense numpy replay, scoring semantics, and the
bounded-collect / broadcast-model contract."""

from __future__ import annotations

import re

import numpy as np
import pytest

from pyspark.sql import functions as F

from small_etl_spark.llm.classifier import (
    score_logreg_bow,
    top_vocab,
    train_logreg_bow,
)

DOCS = [
    (0, "the cat sat on the mat", 1.0),
    (1, "le chat est sur le tapis", 0.0),
    (2, "the dog ate the cat food", 1.0),
    (3, "der hund und die katze", 0.0),
    (4, "cat cat cat dog dog the", 1.0),
    (5, "", 0.0),
    (6, "le chien mange le chat", 0.0),
]


def _numpy_train(rows, vocab_size, iters, lr):
    """Dense replay of the documented training contract."""
    tok = {
        d: re.findall(r"[A-Za-z0-9_]+", t.lower()) for d, t, _ in rows
    }
    counts: dict[str, int] = {}
    for ts in tok.values():
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
    vocab = sorted(counts, key=lambda t: (-counts[t], t))[:vocab_size]
    idx = {t: i for i, t in enumerate(vocab)}
    n = len(rows)
    X = np.zeros((n, len(vocab)))
    y = np.array([r[2] for r in rows])
    for r, (d, _, _) in enumerate(rows):
        for t in tok[d]:
            if t in idx:
                X[r, idx[t]] += 1.0
    w = np.zeros(len(vocab))
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-X @ w))
        w -= lr * (X.T @ (p - y)) / n
    return dict(zip(vocab, w))


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        DOCS, "doc_id long, text string, y double"
    )


def test_train_matches_numpy_exact_gd(spark, docs_df):
    got = {
        r["token"]: r["weight"]
        for r in train_logreg_bow(
            docs_df, "y", vocab_size=8, iters=4, lr=0.3
        ).collect()
    }
    want = _numpy_train(DOCS, 8, 4, 0.3)
    assert set(got) == set(want)
    for t, w in want.items():
        assert got[t] == pytest.approx(w, abs=1e-12), t


def test_materialize_path_is_equivalent(spark, docs_df):
    lazy = train_logreg_bow(docs_df, "y", vocab_size=6, iters=2)
    mat = train_logreg_bow(
        docs_df, "y", vocab_size=6, iters=2, materialize=True
    )
    a = {r["token"]: r["weight"] for r in lazy.collect()}
    b = {r["token"]: r["weight"] for r in mat.collect()}
    assert a.keys() == b.keys()
    for t in a:
        assert a[t] == pytest.approx(b[t], abs=1e-12)


def test_vocab_top_k_tie_break(spark, docs_df):
    # 'le' (×4) and 'the' (×5) dominate; ties break token-ascending.
    vocab = [r["token"] for r in top_vocab(docs_df, vocab_size=3).collect()]
    want = _numpy_train(DOCS, 3, 1, 0.1)
    assert set(vocab) == set(want)


def test_score_semantics(spark, docs_df):
    w = train_logreg_bow(docs_df, "y", vocab_size=8, iters=4, lr=0.3)
    scored = {
        r["doc_id"]: r["prob"]
        for r in score_logreg_bow(docs_df, w).collect()
    }
    assert len(scored) == len(DOCS)
    # Empty doc: no vocab tokens -> margin 0 -> exactly 0.5.
    assert scored[5] == pytest.approx(0.5, abs=0.0)
    # The classifier separates the training labels after 4 steps:
    # every English doc scores above every non-empty non-English doc.
    en = [scored[d] for d, _, yy in DOCS if yy == 1.0]
    fr = [scored[d] for d, t, yy in DOCS if yy == 0.0 and t]
    assert min(en) > max(fr)


def test_empty_corpus_raises(spark, docs_df):
    with pytest.raises(ValueError, match="empty corpus"):
        train_logreg_bow(docs_df.filter(F.lit(False)), "y")


def test_model_side_is_broadcast(spark, docs_df):
    w = train_logreg_bow(docs_df, "y", vocab_size=8, iters=1)
    plan = score_logreg_bow(docs_df, w)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_bigram_interp_logprob_tiny(spark):
    """Hand-replayed Jelinek–Mercer interpolation on a 2-doc corpus."""
    import math

    from small_etl_spark.llm.textstats import bigram_interp_logprob

    df = spark.createDataFrame(
        [(0, "a b a b"), (1, "a"), (2, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_interp_logprob(df).collect()
    }
    # corpus: tokens a×3 b×2, V=2, N=5; bigrams: (a,b)×2, (b,a)×1
    # c1: a·=2, b·=1
    p_ab = 0.7 * (2 + 1) / (2 + 2) + 0.3 * (2 + 1) / (5 + 2)  # w2=b
    p_ba = 0.7 * (1 + 1) / (1 + 2) + 0.3 * (3 + 1) / (5 + 2)  # w2=a
    want0 = (math.log(p_ab) * 2 + math.log(p_ba)) / 3
    assert got[0][0] == 3
    assert got[0][1] == pytest.approx(want0, abs=1e-12)
    assert got[1] == (0, None)
    assert got[2] == (0, None)
