"""Round-4 hardening tests: the judge/advisor findings on shared
primitives — salted outer joins, SNM window guard, CC convergence,
point-in-time row identity (ADVICE r3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_join_rejects_outer_variants(spark):
    """Right/full outer through a salted join would emit every
    unmatched right row salt_buckets times (the replicas all fail to
    match) — must refuse loudly, not silently duplicate."""
    from small_etl_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, 1)], ["rid", "k"])
    right = spark.createDataFrame([(1, "a"), (2, "only-right")], ["k", "v"])
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(left, right, on="k", distributor="rid", how=how)
    # the left-anchored types still work and keep exact semantics
    got = sorted(
        (r["rid"], r["v"])
        for r in salted_join(
            left, right, on="k", distributor="rid", how="left"
        ).collect()
    )
    assert got == [(1, "a")]
    anti = salted_join(right, left, on="k", distributor="v", how="left_anti")
    assert [r["v"] for r in anti.collect()] == ["only-right"]


def test_sorted_neighborhood_rejects_window_below_two(spark):
    """window=1 would explode F.sequence(rank+1, rank) — descending in
    Spark — yielding distance-0 self-pairs instead of no pairs."""
    from small_etl_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "name"])
    for w in (1, 0, -3):
        with pytest.raises(ValueError, match="window >= 2"):
            sorted_neighborhood_pairs(df, id_col="id", text_col="name", window=w)


def test_cc_two_phase_star_raises_when_not_converged(spark):
    """Exiting the large-star/small-star loop before the fixed point
    must raise, not return silently-split components."""
    from small_etl_spark.operators.graph import cc_two_phase_star

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], ["src", "dst"]
    )
    with pytest.raises(RuntimeError, match="fixed point"):
        cc_two_phase_star(chain, max_rounds=1)
    # with enough rounds the same graph resolves to one component
    labels = {
        r["node"]: r["component"]
        for r in cc_two_phase_star(chain, max_rounds=12).collect()
    }
    assert set(labels.values()) == {0}
    assert len(labels) == 65


def test_point_in_time_join_keeps_duplicate_fact_rows(spark):
    """Two byte-identical fact rows (fact feeds without a unique id)
    must BOTH survive overlap resolution — row identity, not row
    values, keys the dedup window."""
    from small_etl_spark.operators.joins import point_in_time_join

    facts = spark.createDataFrame(
        [("k1", "2024-02-01"), ("k1", "2024-02-01"), ("k1", "2024-02-01")],
        ["k", "ts"],
    )
    # overlapping history: both versions valid at the fact ts; the
    # later valid_from must win, once per physical fact row
    versions = spark.createDataFrame(
        [
            ("k1", "v-old", "2024-01-01", None),
            ("k1", "v-new", "2024-01-15", None),
        ],
        "k STRING, val STRING, valid_from STRING, valid_to STRING",
    )
    rows = point_in_time_join(facts, versions, key="k", ts="ts").collect()
    assert len(rows) == 3
    assert {r["val"] for r in rows} == {"v-new"}


def test_zip_intermediate_streams_multipartition_byte_identical(spark, tmp_path):
    """intermediate.json must stream via toLocalIterator (bounded
    driver memory) yet stay byte-identical to the old whole-corpus
    json.dumps render, across many partitions and an empty frame."""
    import json
    import zipfile

    from small_etl_spark.sinks.files import write_outputs, zip_output_dir

    df = spark.range(0, 57, 1, 7).selectExpr(
        "id", "concat('name-', id) AS name", "id * 0.5 AS score"
    )
    inter = df.repartition(7)
    written = write_outputs(df.limit(1), str(tmp_path), ["csv"])
    z = zip_output_dir(
        str(tmp_path), written, "out.zip", intermediate_df=inter
    )
    with zipfile.ZipFile(z) as zf:
        got = zf.read("intermediate.json").decode()
    expect = json.dumps(
        [r.asDict(recursive=True) for r in inter.collect()],
        indent=2,
        default=str,
    )
    assert got == expect

    empty = inter.filter("id < 0")
    z2 = zip_output_dir(
        str(tmp_path), written, "empty.zip", intermediate_df=empty
    )
    with zipfile.ZipFile(z2) as zf:
        assert zf.read("intermediate.json").decode() == "[]"


def test_minhash_storage_contracts(spark):
    """Round-6 storage contract, both schemes:

    - default ``storage="localckpt"``: the lazily localCheckpointed
      shingle table registers AT MOST ONE persistent-RDD entry, and —
      unlike ``persist`` — nothing roots it in the CacheManager, so
      it is releasable (we unpersist it explicitly here; in
      production the ContextCleaner does the same once the plan is
      garbage-collected);
    - ``storage="reshuffle"``: ZERO persisted state, and the final
      adaptive plan contains the ReusedExchange that serves all three
      shingle consumers from one shuffle write (the fault-tolerant
      cluster scheme — shuffle files recompute on executor loss,
      checkpoint blocks do not)."""
    from small_etl_spark.llm.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i % 5}") for i in range(40)],
        ["doc_id", "text"],
    )

    def persistent_ids():
        jmap = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it = jmap.keysIterator()
        out = set()
        while it.hasNext():
            out.add(it.next())
        return out

    # --- default: lazy localCheckpoint, self-cleaning -------------
    before = persistent_ids()
    pairs = minhash_lsh_pairs(df, jaccard_threshold=0.6)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    new = persistent_ids() - before
    assert len(new) <= 1
    jsc = spark.sparkContext._jsc.sc()
    for rid in new:  # releasable: no CacheManager root pins it
        jsc.getPersistentRDDs().get(rid).get().unpersist(False)
    assert persistent_ids() - before == set()

    # --- reshuffle: zero state + the reused exchange --------------
    before = persistent_ids()
    pairs2 = minhash_lsh_pairs(df, jaccard_threshold=0.6, storage="reshuffle")
    got2 = {(r.id_a, r.id_b) for r in pairs2.collect()}
    assert persistent_ids() - before == set()
    final_plan = pairs2._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final_plan
    # identical answers across schemes
    assert got == got2 and got
