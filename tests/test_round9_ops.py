"""Round-6 additions: first-wins segment dedup, prefix dedup
(keep-longest), the persisted MinHash-LSH index/probe pair, and URL
canonicalization / registrable-domain extraction."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F


def test_segment_dedup_first_wins_brute(spark):
    """First-occurrence-wins segment dedup against a hand-computed
    reference: each distinct 3-word segment survives only at its
    earliest (doc_id, pos); docs reduced to nothing vanish."""
    from small_etl_spark.llm.dedup import segment_dedup_first_wins

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # segs: "a b c", "d e f" — both first
            (2, "a b c x y z"),          # "a b c" repeat, "x y z" first
            (3, "a b c d e f"),          # both repeats -> doc vanishes
            (4, "x y z x y z g"),        # 1st "x y z" repeat of doc2's,
                                          # 2nd "x y z" also dropped, "g" kept
        ],
        "doc_id bigint, text string",
    )
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_dropped)
        for r in segment_dedup_first_wins(docs, seg_words=3).collect()
    }
    assert got == {
        1: ("a b c d e f", 2, 0),
        2: ("x y z", 1, 1),
        4: ("g", 1, 2),
    }


def test_prefix_dedup_keep_longest_cases(spark):
    """Exact dups collapse to the smallest id; strict prefixes drop
    (including chains a < ab < abc); non-prefix neighbors survive."""
    from small_etl_spark.llm.dedup import prefix_dedup_keep_longest

    docs = spark.createDataFrame(
        [
            (10, "a"),
            (11, "a b"),
            (12, "a b c"),        # chain: only this survives
            (20, "q r"),
            (21, "q r"),          # exact dup: keep id 20
            (30, "zz"),
            (31, "z"),            # "z" prefix of "zz" -> drop 31
            (40, "m n"),          # no relation -> survives
        ],
        "doc_id bigint, text string",
    )
    got = sorted(
        (r.doc_id, r.text)
        for r in prefix_dedup_keep_longest(docs).collect()
    )
    assert got == [(12, "a b c"), (20, "q r"), (30, "zz"), (40, "m n")]


def test_lsh_probe_matches_direct_pairs_and_never_rescans_corpus(
    spark, tmp_path
):
    """The persisted-index probe must return exactly the cross-set
    (delta, corpus) pairs the one-shot minhash_lsh_pairs finds, and
    its physical plan must read ONLY the index parquet + the delta —
    never the corpus text (the incrementality claim, pinned on the
    plan, not the docstring)."""
    from small_etl_spark.llm.dedup import (
        minhash_lsh_index_write,
        minhash_lsh_pairs,
        minhash_lsh_probe,
    )
    from small_etl_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)
    path = str(tmp_path / "lsh_index")
    try:
        minhash_lsh_index_write(corpus, path, num_hashes=16, bands=4)
        probe = minhash_lsh_probe(spark, path, delta, jaccard_threshold=0.8)
        got = sorted(
            (r.probe_id, r.corpus_id, round(r.jaccard, 9))
            for r in probe.collect()
        )

        allp = minhash_lsh_pairs(
            docs, num_hashes=16, bands=4, jaccard_threshold=0.8
        )
        cross = allp.filter(
            ((F.col("id_a") % 10 == 0) & (F.col("id_b") % 10 != 0))
            | ((F.col("id_a") % 10 != 0) & (F.col("id_b") % 10 == 0))
        )
        want = sorted(
            (
                (r.id_a, r.id_b, round(r.jaccard, 9))
                if r.id_a % 10 == 0
                else (r.id_b, r.id_a, round(r.jaccard, 9))
            )
            for r in cross.collect()
        )
        assert got == want and got  # non-empty at sf0.001

        # incrementality: the probe plan never scans the corpus text.
        # Under the default localckpt storage the delta side is a
        # checkpointed ExistingRDD (its documents scan + filter ran
        # once at materialization), so any documents FileScan that
        # DOES appear must carry the pushed-down delta filter.
        plan = probe._jdf.queryExecution().executedPlan().toString()
        doc_scans = [
            ln
            for ln in plan.splitlines()
            if "FileScan parquet" in ln and "documents.parquet" in ln
        ]
        for ln in doc_scans:
            assert "% 10) = 0" in ln, f"unfiltered corpus scan: {ln[:200]}"
        # (plan strings truncate long paths, so match the dir prefix)
        assert "lsh_" in plan, "probe must read the persisted index"
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_lsh_probe_rejects_mismatched_params(spark, tmp_path):
    """_params.json pins the index geometry; a probe can't silently
    mix hash families (it reads the stored params, so the signatures
    always match the index)."""
    import json
    import os

    from small_etl_spark.llm.dedup import (
        minhash_lsh_index_write,
        minhash_lsh_probe,
    )

    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 w6")],
        "doc_id bigint, text string",
    )
    path = str(tmp_path / "idx")
    minhash_lsh_index_write(docs, path, num_hashes=8, bands=2, hash_family="md5")
    with open(os.path.join(path, "_params.json")) as fh:
        p = json.load(fh)
    assert p == {
        "shingle_n": 3,
        "num_hashes": 8,
        "bands": 2,
        "seed": 42,
        "hash_family": "md5",
    }
    # probing uses the stored md5 family even though the default is
    # xxhash64 — a bucket join across families would return nothing
    out = minhash_lsh_probe(spark, path, docs, jaccard_threshold=0.1)
    assert out.count() > 0


def test_url_canonicalize_and_domain(spark):
    from small_etl_spark.functions.text import (
        canonicalize_url,
        registrable_domain,
        url_host,
    )

    cases = [
        # (raw, canonical, registrable domain)
        (
            "HTTPS://WWW.Example.COM:443/Path/To?a=1&utm_source=x&b=2#f",
            "https://example.com/Path/To?a=1&b=2",
            "example.com",
        ),
        ("http://example.com:80/", "http://example.com", "example.com"),
        (
            "https://a.blog.example.co.uk/x/?utm_campaign=z",
            "https://a.blog.example.co.uk/x",
            "example.co.uk",
        ),
        (
            "https://example.com/path?utm_only=1",
            "https://example.com/path",
            "example.com",
        ),
        ("http://www.foo.com.au/bar/", "http://foo.com.au/bar", "foo.com.au"),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in cases], "url string")
    got = {
        r.url: (r.canon, r.dom)
        for r in df.select(
            "url",
            canonicalize_url("url").alias("canon"),
            registrable_domain("url").alias("dom"),
        ).collect()
    }
    for raw, canon, dom in cases:
        assert got[raw] == (canon, dom), raw
    # host extraction skips userinfo and port
    h = (
        df.limit(1)
        .select(url_host(F.lit("https://u:p@Host.Example.ORG:8080/x")).alias("h"))
        .collect()[0]
        .h
    )
    assert h == "host.example.org"


def test_domain_token_budget_cap_properties(spark):
    """Every domain's admitted token total stays under budget + its
    final admitted doc (the one allowed to cross), the first doc of a
    domain is always admitted, and the admitted set is invariant to
    input partitioning."""
    from small_etl_spark.llm.sampling import domain_token_budget_cap
    from small_etl_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = domain_token_budget_cap(docs, budget_tokens=500)
    rows = out.collect()
    assert rows
    by_dom: dict[str, list] = {}
    for r in rows:
        by_dom.setdefault(r.source, []).append(r)
    for dom, rs in by_dom.items():
        # exclusive prefix < budget for every admitted doc
        assert all(r.tokens_before < 500 for r in rs), dom
        # sum of all-but-the-crossing-doc is under budget
        total = sum(r.n_tokens for r in rs)
        largest_last = max(r.tokens_before for r in rs)
        assert largest_last < 500
        assert total >= min(r.n_tokens for r in rs)  # sanity
    # at least one domain actually got cut
    n_all = docs.count()
    assert len(rows) < n_all
    # partitioning invariance
    again = sorted(
        r.doc_id
        for r in domain_token_budget_cap(
            docs.repartition(7), budget_tokens=500
        ).collect()
    )
    assert again == sorted(r.doc_id for r in rows)


def test_stream_lsh_probe_equals_batch(spark, tmp_path):
    """Union of per-micro-batch probes == one batch probe of the whole
    delta (probes are per-doc independent); two files -> two batches."""
    from small_etl_spark.llm.dedup import (
        minhash_lsh_index_write,
        minhash_lsh_probe,
    )
    from small_etl_spark.sources.tables import load_table
    from small_etl_spark.streaming.windows import stream_lsh_probe_to_parquet

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    delta = docs.filter(F.col("doc_id") % 10 == 0)

    idx = str(tmp_path / "idx")
    sdir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    minhash_lsh_index_write(corpus, idx, num_hashes=16, bands=4)
    delta.filter(F.col("doc_id") % 20 == 0).coalesce(1).write.parquet(
        sdir + "/a"
    )
    delta.filter(F.col("doc_id") % 20 != 0).coalesce(1).write.parquet(
        sdir + "/b"
    )
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(sdir)
    )
    stream_lsh_probe_to_parquet(spark, stream, idx, out, ckpt, 0.8)
    got = sorted(
        (r.probe_id, r.corpus_id, round(r.jaccard, 9))
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.probe_id, r.corpus_id, round(r.jaccard, 9))
        for r in minhash_lsh_probe(
            spark, idx, delta, jaccard_threshold=0.8
        ).collect()
    )
    assert got == want and got


def test_kcenter_matches_python_greedy(spark):
    """Farthest-point selection against a sequential reference on a
    planted geometry: 3 well-separated clusters + a far outlier —
    greedy must visit each region before densifying."""
    import numpy as np

    from small_etl_spark.llm.similarity import kcenter_sample

    rng = np.random.RandomState(7)
    pts = np.vstack(
        [
            rng.normal(0.0, 0.05, (10, 4)),
            rng.normal(5.0, 0.05, (10, 4)) * [1, -1, 1, -1],
            rng.normal(-3.0, 0.05, (10, 4)),
            [[50.0, 0, 0, 0]],
        ]
    )
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")

    def ref(k):
        chosen = [0]
        out = [(0, 0, 0.0)]
        for step in range(1, k):
            d = np.min(
                [((pts - pts[c]) ** 2).sum(axis=1) for c in chosen], axis=0
            )
            order = np.lexsort((np.arange(len(pts)), -d))
            best = int(order[0])
            out.append((step, best, round(float(d[best]), 6)))
            chosen.append(best)
        return out

    got = sorted(
        (r.step, r.vec_id, r.d2) for r in kcenter_sample(df, k=5).collect()
    )
    assert got == sorted(ref(5))
    # the planted outlier must be picked first after the seed
    assert got[1][1] == 30


def test_mmr_rerank_matches_python_greedy(spark):
    """Grouped MMR against an independent sequential reference,
    including NEGATIVE similarities (a zeros-floor on the penalty
    term would mis-rank — regression for the max-over-empty-set
    bug)."""
    import numpy as np

    from small_etl_spark.llm.similarity import mmr_rerank

    rng = np.random.RandomState(11)
    rows = []
    vecs = {}
    for q in range(3):
        for i in range(8):
            v = rng.normal(0, 1, 6)
            vid = q * 100 + i
            vecs[vid] = v
            rows.append(
                (q, vid, float(rng.uniform(0.1, 1.0)), [float(x) for x in v])
            )
    df = spark.createDataFrame(
        rows, "query_id bigint, vec_id bigint, rel double, embedding array<double>"
    )
    lam = 0.6

    def ref(group):
        ids = sorted(vid for (qq, vid, _, _) in rows if qq == group)
        rel = {vid: r for (qq, vid, r, _) in rows if qq == group}
        unit = {
            vid: vecs[vid] / np.linalg.norm(vecs[vid]) for vid in ids
        }
        sel = []
        for _ in range(3):
            best, best_s = None, -np.inf
            for vid in ids:
                if vid in sel:
                    continue
                pen = max((unit[vid] @ unit[s] for s in sel), default=0.0)
                s = lam * rel[vid] - (1 - lam) * (pen if sel else 0.0)
                if s > best_s + 1e-12 or (
                    abs(s - best_s) <= 1e-12 and vid < (best or 10**9)
                ):
                    best, best_s = vid, s
            sel.append(best)
        return [(group, r, v) for r, v in enumerate(sel)]

    got = sorted(
        (r.query_id, r.rank, r.vec_id)
        for r in mmr_rerank(df, k=3, lam=lam).collect()
    )
    want = sorted(x for q in range(3) for x in ref(q))
    assert got == want


def test_compaction_plan_and_execute(spark, tmp_path):
    """FFD bin arithmetic is exact; the rewrite preserves every row,
    respects the byte target per bin (modulo oversized singletons),
    and collapses the file count to ~one per bin."""
    import os

    from small_etl_spark.operators.layout import (
        compaction_plan,
        compact_parquet,
        list_data_files,
    )
    from small_etl_spark.sources.tables import load_table

    # pure planner arithmetic
    plan = compaction_plan(
        [("a", 70), ("b", 40), ("c", 40), ("d", 15), ("e", 200)],
        target_bytes=100,
    )
    by_size = sorted(
        (sorted(p for p, _ in members) for members in plan),
        key=lambda m: m[0],
    )
    # FFD: 200 alone (oversized), 70+15 share, 40+40 share
    assert by_size == [["a", "d"], ["b", "c"], ["e"]]
    assert all(
        sum(s for _, s in m) <= 100 or len(m) == 1 for m in plan
    )

    # end-to-end: fragment orders into 37 tiny files, compact to few
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    orders = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_totalprice"
    )
    orders.repartition(37).write.parquet(src)
    files = list_data_files(spark, src)
    assert len(files) == 37
    target = 4 * max(sz for _, sz in files)
    report = compact_parquet(spark, src, dst, target).collect()
    n_bins = len(report)
    assert 1 < n_bins < 37
    assert sum(r.n_files for r in report) == 37
    # row-level equality
    before = sorted(r.o_orderkey for r in orders.collect())
    after_df = spark.read.option("recursiveFileLookup", "true").parquet(dst)
    after = sorted(r.o_orderkey for r in after_df.collect())
    assert before == after
    # file count collapsed to about one per bin
    out_files = [
        (p, s)
        for p, s in list_data_files(spark, dst)
        if os.path.basename(p).startswith("part-")
    ]
    assert len(out_files) <= 2 * n_bins


def test_observe_during_single_pass(spark):
    """The observation must (a) report the exact aggregates and (b)
    ride the action's plan as a CollectMetrics node — not a second
    scan/job."""
    from small_etl_spark.operators.profiling import observe_during
    from small_etl_spark.sources.tables import load_table

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    observed, obs = observe_during(
        li,
        {
            "rows": F.count(F.lit(1)),
            "qty": F.sum(F.col("l_quantity").cast("bigint")),
        },
    )
    plan = observed._jdf.queryExecution().executedPlan().toString()
    assert "CollectMetrics" in plan
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    direct = li.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
    ).collect()[0]
    assert (m["rows"], m["qty"]) == (direct["rows"], direct["qty"])
