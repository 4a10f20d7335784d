"""Property test for the winnowing guarantee (Schleimer/Wilkerson/
Aiken, SIGMOD'03): any shared token run of length ≥ w+k-1 between two
documents yields at least one shared fingerprint. Random distinct
padding around a random planted run — the guarantee must hold for ANY
plant position."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from small_etl_spark.llm.dedup import winnow_fingerprints

K, W = 5, 4
GUARANTEE = W + K - 1  # 8 shared tokens force a shared fingerprint

word = st.text(alphabet="abcdefgh", min_size=2, max_size=5)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    shared=st.lists(word, min_size=GUARANTEE, max_size=GUARANTEE + 4),
    pre_a=st.lists(word, max_size=6),
    post_a=st.lists(word, max_size=6),
    pre_b=st.lists(word, max_size=6),
    post_b=st.lists(word, max_size=6),
)
def test_shared_run_shares_a_fingerprint(
    spark, shared, pre_a, post_a, pre_b, post_b
):
    # prefix padding tokens so they can't accidentally extend the run
    doc_a = " ".join([f"xa{t}" for t in pre_a] + shared + [f"ya{t}" for t in post_a])
    doc_b = " ".join([f"xb{t}" for t in pre_b] + shared + [f"yb{t}" for t in post_b])
    df = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fps = {
        r.doc_id: set(r.fp)
        for r in df.select(
            "doc_id", winnow_fingerprints("text", k=K, w=W).alias("fp")
        ).collect()
    }
    assert fps[1] & fps[2], (doc_a, doc_b)
