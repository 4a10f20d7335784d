"""Unit tests: PII scrubbing and the portable md5 hash families."""

from __future__ import annotations

from pyspark.sql import functions as F

from small_etl_spark.llm.pii import pii_counts, scrub_pii


def test_scrub_pii_all_categories(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk now"),
            (2, "server 10.0.255.3 responded"),
            (3, "call +1 555-123-4567 today"),
            (4, "clean text, nothing to redact"),
        ],
        "id long, text string",
    )
    out = {
        r.id: r.s
        for r in df.select("id", scrub_pii("text").alias("s")).collect()
    }
    assert out[1] == "mail <EMAIL> now"
    assert out[2] == "server <IP> responded"
    assert out[3] == "call <PHONE> today"
    assert out[4] == "clean text, nothing to redact"


def test_pii_counts(spark):
    df = spark.createDataFrame(
        [(1, "a@b.io c@d.io and 1.2.3.4 plus 555-123-9999")],
        "id long, text string",
    )
    row = df.select(*pii_counts("text")).collect()[0]
    assert (row.n_emails, row.n_ips, row.n_phones) == (2, 1, 1)


def test_minhash_md5_family_matches_exact_on_clones(spark):
    """md5-family LSH must surface an exact clone pair (jaccard=1)."""
    from small_etl_spark.llm.dedup import minhash_lsh_pairs

    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, "completely different content here ok")],
        "doc_id long, text string",
    )
    pairs = minhash_lsh_pairs(
        df, num_hashes=16, bands=4, jaccard_threshold=0.8, hash_family="md5"
    ).collect()
    assert [(p.id_a, p.id_b, p.jaccard) for p in pairs] == [(1, 2, 1.0)]


def test_simhash_md5_family_flags_near_identical(spark):
    from small_etl_spark.llm.dedup import simhash_pairs

    base = "spark streaming stateful aggregation with watermarks " * 5
    df = spark.createDataFrame(
        [(1, base), (2, base + " tail"), (3, "unrelated short text entirely")],
        "doc_id long, text string",
    )
    got = {
        (p.id_a, p.id_b)
        for p in simhash_pairs(df, max_hamming=3, hash_family="md5").collect()
    }
    assert (1, 2) in got
    assert (1, 3) not in got and (2, 3) not in got


def test_prefix_filter_equals_brute_force(spark):
    """PPJoin prefix filtering is recall-1.0: its output must EQUAL the
    brute-force all-pairs Jaccard join on the same shingles — including
    pairs that share only rare shingles across 'blocking' boundaries."""
    import random

    from small_etl_spark.llm.dedup import (
        prefix_filter_jaccard_pairs,
        word_shingles,
    )

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(30):
        words = [rng.choice(vocab) for _ in range(rng.randint(4, 20))]
        rows.append((i, " ".join(words)))
        if rng.random() < 0.4:  # inject near-duplicates
            mutated = list(words)
            if mutated:
                mutated[rng.randrange(len(mutated))] = rng.choice(vocab)
            rows.append((100 + i, " ".join(mutated)))
    df = spark.createDataFrame(rows, "doc_id long, text string")

    t = 0.5
    got = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in prefix_filter_jaccard_pairs(df, threshold=t).collect()
    }

    base = df.select(
        F.col("doc_id").alias("id"), word_shingles("text", 3).alias("sh")
    )
    jac = F.size(F.array_intersect("a.sh", "b.sh")) / F.size(
        F.array_union("a.sh", "b.sh")
    )
    want = {
        (r.id_a, r.id_b, round(r.jaccard, 9))
        for r in base.alias("a")
        .crossJoin(base.alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            jac.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= t)
        .collect()
    }
    assert want, "fixture must produce at least one qualifying pair"
    assert got == want


def test_leakage_safe_split_never_straddles_pairs(spark):
    """The property the op exists for: NO near-dup pair crosses the
    train/val boundary (a per-doc hash split provably crosses some),
    and membership is a pure function of ids (rerun-stable)."""
    from pyspark.sql import functions as F

    from small_etl_spark.llm.dedup import ngram_jaccard_pairs
    from small_etl_spark.llm.sampling import hash_split, leakage_safe_split

    # 30 clone pairs (near-dups by construction) + 40 singletons
    rows = []
    for i in range(30):
        text = f"shared passage number {i} repeated across both copies"
        rows.append((2 * i, "s", text))
        rows.append((2 * i + 1, "s", text + " tail"))
    for j in range(40):
        rows.append((100 + j, "s", f"unique document {j} {j*7} {j*13} xyz"))
    docs_df = spark.createDataFrame(
        rows, "doc_id long, source string, text string"
    )
    pairs = ngram_jaccard_pairs(docs_df, group_col="source", min_jaccard=0.8)
    assert pairs.count() >= 30
    out = leakage_safe_split(docs_df, pairs, val_fraction=0.3)
    side = out.select("doc_id", "split")
    straddle = (
        pairs.join(
            side.withColumnsRenamed({"doc_id": "id_a", "split": "sa"}), "id_a"
        )
        .join(
            side.withColumnsRenamed({"doc_id": "id_b", "split": "sb"}), "id_b"
        )
        .filter(F.col("sa") != F.col("sb"))
    )
    assert straddle.count() == 0
    # both sides populated (the split didn't degenerate)
    sides = {r.split for r in side.select("split").distinct().collect()}
    assert sides == {"train", "val"}
    # determinism: a rerun assigns identical sides
    again = leakage_safe_split(docs_df, pairs, val_fraction=0.3)
    assert (
        out.select("doc_id", "split")
        .exceptAll(again.select("doc_id", "split"))
        .count()
        == 0
    )
    # contrast: the naive per-doc split DOES straddle at least one
    # near-dup pair on this corpus (the leak this op closes)
    naive = hash_split(docs_df, val_fraction=0.3).select("doc_id", "split")
    naive_straddle = (
        pairs.join(
            naive.withColumnsRenamed({"doc_id": "id_a", "split": "sa"}),
            "id_a",
        )
        .join(
            naive.withColumnsRenamed({"doc_id": "id_b", "split": "sb"}),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
    )
    assert naive_straddle.count() > 0
