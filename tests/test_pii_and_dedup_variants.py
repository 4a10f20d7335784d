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
