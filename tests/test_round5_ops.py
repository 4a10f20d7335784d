"""Unit tests for the round-5 additions: bigram PMI, corpus-order
n-gram novelty, hard-negative mining, and label-centroid outliers."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_bigram_pmi_hand_computed(spark):
    from small_etl_spark.llm.textstats import bigram_pmi

    # bigrams: (a b) ×2, (b a) ×1, (b c) ×1  → total 4
    df = spark.createDataFrame(
        [("a b a b",), ("b c",)], ["text"]
    )
    rows = {
        (r["w1"], r["w2"]): r
        for r in bigram_pmi(df, min_count=1, top_n=10).collect()
    }
    assert rows[("a", "b")]["cnt"] == 2
    # left marginal of 'a'=2, right marginal of 'b'=2:
    # pmi = ln(2*4/(2*2)) = ln 2
    assert rows[("a", "b")]["pmi"] == round(math.log(2.0), 6)
    # (b c): cnt=1, l(b)=2, r(c)=1 → ln(1*4/(2*1)) = ln 2
    assert rows[("b", "c")]["pmi"] == round(math.log(2.0), 6)


def test_bigram_pmi_min_count_filters(spark):
    from small_etl_spark.llm.textstats import bigram_pmi

    df = spark.createDataFrame([("a b a b",), ("b c",)], ["text"])
    out = bigram_pmi(df, min_count=2, top_n=10).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("a", "b")}


def test_doc_ngram_novelty_copy_has_zero(spark):
    from small_etl_spark.llm.dedup import doc_ngram_novelty

    text = "one two three four five six"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in doc_ngram_novelty(df, n=3).collect()}
    # doc 1 owns every shingle; doc 2 is a verbatim copy → novelty 0
    assert out[1]["novelty"] == 1.0
    assert out[2]["novelty"] == 0.0
    assert out[2]["n_shingles"] == out[1]["n_shingles"] == 4
    assert out[3]["novelty"] == 1.0


def test_doc_ngram_novelty_partial_overlap(spark):
    from small_etl_spark.llm.dedup import doc_ngram_novelty

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in doc_ngram_novelty(df, n=3).collect()}
    # doc2 shingles: "a b c" (seen in doc1), "b c x" (novel) → 1/2
    assert out[2]["n_shingles"] == 2
    assert out[2]["n_novel"] == 1
    assert out[2]["novelty"] == 0.5


def test_hard_negative_excludes_same_label(spark):
    from small_etl_spark.llm.similarity import hard_negative_topk

    rows = [
        (0, [1.0, 0.0], 0),
        (1, [0.99, 0.14], 0),   # same label, closest — must be excluded
        (2, [0.9, 0.44], 1),    # different label → the hard negative
        (3, [-1.0, 0.0], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = hard_negative_topk(df, df.filter(F.col("vec_id") == 0), k=1).collect()
    assert len(out) == 1
    assert out[0]["vec_id"] == 2
    assert out[0]["neg_label"] == 1
    assert out[0]["rank"] == 1


def test_label_centroid_outliers_flags_the_far_point(spark):
    from small_etl_spark.llm.similarity import label_centroid_outliers

    rows = [
        (0, [0.0, 0.0], 0),
        (1, [0.2, 0.0], 0),
        (2, [10.0, 10.0], 0),   # far from label-0 centroid
        (3, [1.0, 1.0], 1),
        (4, [1.0, 1.2], 1),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding", "label"])
    out = label_centroid_outliers(df, top_n=1).collect()
    assert out[0]["vec_id"] == 2


def test_approx_contract_queries_hold(spark):
    from small_etl_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    ad = REGISTRY["approx_distinct"].builder(spark, sf).collect()
    assert ad and all(r["approx_ok"] for r in ad)
    ap = REGISTRY["approx_percentiles"].builder(spark, sf).collect()
    assert ap and all(r["p50_in_band"] for r in ap)
    hll = REGISTRY["incremental_distinct_hll"].builder(spark, sf).collect()
    assert hll and all(r["merge_ok"] for r in hll)
    ivf = REGISTRY["ivf_recall_contract"].builder(spark, sf).collect()
    assert len(ivf) == 1 and ivf[0]["n_queries"] == 8 and ivf[0]["recall_ok"]


def test_bpe_merges_hand_computed(spark):
    from small_etl_spark.llm.bpe import bpe_merges

    # low×2 lower×1: (l,o) and (o,w) tie at 3 → lexicographic (l,o);
    # then (lo,w)=3; then (low,e)/(e,r) tie at 1 → (e,r)
    df = spark.createDataFrame([("low low lower",)], ["text"])
    out = [tuple(r) for r in bpe_merges(df, iters=3).collect()]
    assert out == [
        (1, "l", "o", 3),
        (2, "lo", "w", 3),
        (3, "e", "r", 1),
    ]


def test_bpe_merges_repeated_symbol_greedy(spark):
    from small_etl_spark.llm.bpe import bpe_merges

    # 'aaaa' + 'aaa': (a,a) count 5; greedy pairs left-to-right →
    # aaaa→[aa,aa], aaa→[aa,a]; then (aa,a) beats (aa,aa) on
    # lexicographic tie-break at count 1
    df = spark.createDataFrame([("aaaa aaa",)], ["text"])
    out = [tuple(r) for r in bpe_merges(df, iters=2).collect()]
    assert out == [(1, "a", "a", 5), (2, "aa", "a", 1)]


def test_bpe_merge_application_preserves_word_mass(spark):
    from pyspark.sql import functions as F

    from small_etl_spark.llm.bpe import bpe_merges, word_frequencies

    df = spark.createDataFrame(
        [("the quick brown fox the lazy dog the end",)], ["text"]
    )
    # learning must not lose or duplicate words: total corpus tokens
    # seen by the frequency table equals the raw split count
    n_raw = df.select(
        F.explode(F.split("text", " ")).alias("w")
    ).filter(F.col("w") != "").count()
    n_freq = word_frequencies(df).agg(F.sum("cnt")).collect()[0][0]
    assert n_raw == n_freq
    out = bpe_merges(df, iters=1).collect()
    assert out[0]["iter"] == 1 and out[0]["pair_count"] >= 2
