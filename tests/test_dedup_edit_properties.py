"""Property tests: segment_dedup_first_wins and
prefix_dedup_keep_longest against sequential Python references on
arbitrary word corpora — the same brute-force-twin discipline as the
winnowing/ordinal property suites."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

word = st.text(alphabet="ab", min_size=1, max_size=2)
doc = st.lists(word, min_size=1, max_size=9).map(" ".join)


def _segments(text: str, w: int) -> list[str]:
    ws = text.split(" ")
    return [
        " ".join(ws[i : i + w]) for i in range(0, len(ws), w)
    ]


def _ref_segment_first_wins(rows, w):
    """Sequential reference: first (doc_id, pos) occurrence of every
    distinct segment survives; docs emptied vanish."""
    first: dict[str, tuple[int, int]] = {}
    for did, text in sorted(rows):
        for pos, seg in enumerate(_segments(text, w)):
            first.setdefault(seg, (did, pos))
    out = {}
    for did, text in rows:
        kept, dropped = [], 0
        for pos, seg in enumerate(_segments(text, w)):
            if first[seg] == (did, pos):
                kept.append(seg)
            else:
                dropped += 1
        if kept:
            out[did] = (" ".join(kept), len(kept), dropped)
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc, min_size=1, max_size=8))
def test_segment_first_wins_matches_reference(spark, docs):
    from small_etl_spark.llm.dedup import segment_dedup_first_wins

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in segment_dedup_first_wins(df, seg_words=2).collect()
    }
    assert got == _ref_segment_first_wins(rows, 2)


def _ref_prefix_keep_longest(rows):
    """Sequential reference: collapse exact dups to min id, then drop
    any text that is a strict prefix of ANY other text (checked
    pairwise — the lemma the distributed version relies on)."""
    by_text: dict[str, int] = {}
    for did, text in rows:
        if text not in by_text or did < by_text[text]:
            by_text[text] = did
    texts = list(by_text)
    out = []
    for t in texts:
        if any(o != t and o.startswith(t) for o in texts):
            continue
        out.append((by_text[t], t))
    return sorted(out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc, min_size=1, max_size=10))
def test_prefix_keep_longest_matches_pairwise_reference(spark, docs):
    """The one-sort adjacency implementation must equal the O(n²)
    pairwise definition — this is exactly the prefix lemma under
    test, on adversarial inputs (shared prefixes, duplicates,
    single-char words)."""
    from small_etl_spark.llm.dedup import prefix_dedup_keep_longest

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.text) for r in prefix_dedup_keep_longest(df).collect()
    )
    assert got == _ref_prefix_keep_longest(rows)
