"""Model-based property test for the versioned table layer.

Hypothesis drives random commit sequences (append / overwrite / merge /
delete / optimize / cluster) against both the real sink and a trivial
in-memory dict model; after EVERY commit the table must read back equal
to the model at head AND at every historical version (time travel), and
the CDC delta between consecutive versions must replay the model's
transition. This is the reference repo's model-testing strategy
(SURVEY §5) applied to the trickiest new subsystem: if any commit mode
mishandles file carry-over, schema, or multiset semantics, some random
sequence finds it.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from small_etl_spark.sinks import versioned as V

# ops: (kind, payload). Keys confined to 0..19 so merges/deletes collide
# with existing rows often.
_op = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(st.integers(0, 19), min_size=1, max_size=5),
    ),
    st.tuples(
        st.just("overwrite"),
        st.lists(st.integers(0, 19), min_size=1, max_size=5),
    ),
    st.tuples(
        st.just("merge"),
        st.lists(st.integers(0, 19), min_size=1, max_size=4),
    ),
    st.tuples(st.just("delete"), st.integers(0, 19)),
    st.tuples(st.just("delete_mor"), st.integers(0, 19)),
    st.tuples(st.just("compact_dv"), st.none()),
    st.tuples(st.just("optimize"), st.none()),
    st.tuples(st.just("cluster"), st.none()),
    # r9: partition-spec evolution mid-walk — metadata-only, model
    # unchanged; appends pick up the new spec via pb_now()
    st.tuples(st.just("respec"), st.integers(0, 2)),
)

# r9 session 2 ops, handled ONLY by the base walk (the partitioned /
# transform walks keep the shared `_op` vocabulary): RESTORE to a
# random earlier version (model jumps back to that version's recorded
# state), a multi-clause MERGE (conditional update-or-delete by key
# parity + inserts), an orphan GC sweep after an abandoned write
# (state must not move), and COW UPDATE (add 1000·(payload+1) to ver
# where k >= payload, pruned on the key range).
_op2 = st.one_of(
    _op,
    st.tuples(st.just("restore"), st.integers(0, 30)),
    st.tuples(
        st.just("merge_multi"),
        st.tuples(
            st.lists(st.integers(0, 19), min_size=1, max_size=4),
            st.integers(0, 1),  # parity whose matched keys DELETE
        ),
    ),
    st.tuples(st.just("orphans"), st.none()),
    st.tuples(st.just("update"), st.integers(0, 19)),
)


def _snap(model: list[tuple[int, int]]) -> list[tuple[int, int]]:
    return sorted(model)


def _dv_live(table: str) -> bool:
    v = V.latest_version(table)
    return v is not None and bool(V.read_manifest(table, v).get("dv"))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op2, min_size=1, max_size=5))
def test_versioned_matches_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("prop") / "tbl")
    tag = {"n": 0}

    def mk(keys):
        tag["n"] += 1
        return (
            spark.createDataFrame(
                [(k, tag["n"]) for k in keys], "k LONG, ver LONG"
            ),
            [(k, tag["n"]) for k in keys],
        )

    def pb_now():
        # appends must carry the table's CURRENT spec (the respec op
        # can move it mid-walk — commit_snapshot refuses a mismatched
        # append by contract); overwrite legitimately resets it. The
        # partitioned/transform walks below already do this.
        v = V.latest_version(table)
        if v is None:
            return None
        return V.read_manifest(table, v).get("partition_by")

    history: list[list[tuple[int, int]]] = []  # model state per version
    model: list[tuple[int, int]] = []

    for kind, payload in ops:
        if kind in ("append", "overwrite"):
            df, rows = mk(payload)
            V.commit_snapshot(
                df, table, mode=kind,
                partition_by=None if kind == "overwrite" else pb_now(),
            )
            model = (model + rows) if kind == "append" else list(rows)
        elif kind == "merge":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            df, rows = mk(payload)
            # model MERGE: drop matched keys, add all source rows
            # (source may carry duplicate keys; dedupe keep-last to
            # mirror a well-formed upsert source)
            dedup = {k: v for k, v in rows}
            src_rows = sorted(dedup.items())
            sdf = spark.createDataFrame(src_rows, "k LONG, ver LONG")
            V.merge_upsert(spark, table, sdf, key="k")
            keys = set(dedup)
            model = [r for r in model if r[0] not in keys] + src_rows
        elif kind == "delete":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                # rewrite ops refuse on a live DV by contract;
                # materialize first (its own version, model unchanged)
                V.compact_dv(spark, table)
                history.append(_snap(model))
            V.delete_where(
                spark,
                table,
                F.col("k") >= payload,
                prune=[("k", ">=", payload)],
            )
            model = [r for r in model if r[0] < payload]
        elif kind == "delete_mor":
            if V.latest_version(table) is None:
                continue
            V.delete_where_mor(spark, table, F.col("k") >= payload)
            model = [r for r in model if r[0] < payload]
        elif kind == "compact_dv":
            if V.latest_version(table) is None:
                continue
            if V.compact_dv(spark, table) is None:
                continue  # no live DV: no version created
        elif kind == "optimize":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            if V.optimize_snapshot(spark, table) is None:
                continue  # nothing to compact: no version was created
        elif kind == "cluster":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            V.cluster_snapshot(
                spark, table, zorder=[("k", 0, 20)], target_bytes=1 << 20
            )
        elif kind == "respec":
            if V.latest_version(table) is None:
                continue
            specs = [None, ["bucket(2, k)"], ["k"]]
            V.set_partition_spec(table, specs[payload])
        elif kind == "restore":
            if not history:
                continue
            chosen = payload % len(history)
            if chosen == V.latest_version(table):
                continue  # no-op restore creates no version
            V.restore_snapshot(table, chosen)
            model = list(history[chosen])
        elif kind == "merge_multi":
            keys, parity = payload
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            df, rows = mk(keys)
            dedup = {k: v for k, v in rows}
            src_rows = sorted(dedup.items())
            sdf = spark.createDataFrame(src_rows, "k LONG, ver LONG")
            V.merge(
                spark, table, sdf, on="k",
                matched=[
                    {"action": "delete",
                     "condition": f"t.k % 2 = {parity}"},
                    {"action": "update", "set": "all"},
                ],
                not_matched=[{"action": "insert", "values": "all"}],
            )
            existing = {k for k, _ in model}
            model = (
                # matched, wrong parity -> updated to source row
                [(k, v) for k, v in src_rows
                 if k in existing and k % 2 != parity]
                # unmatched by source -> kept
                + [r for r in model if r[0] not in dedup]
                # unmatched by target -> inserted
                + [(k, v) for k, v in src_rows if k not in existing]
            )
        elif kind == "update":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            delta = 1000 * (payload + 1)
            V.update_where(
                spark, table, {"ver": f"ver + {delta}"},
                F.col("k") >= payload, prune=[("k", ">=", payload)],
            )
            model = [
                (k, v + delta) if k >= payload else (k, v)
                for k, v in model
            ]
        elif kind == "orphans":
            if V.latest_version(table) is None:
                continue
            V._write_data_files(  # an abandoned (raced-out) write
                spark.createDataFrame([(99, 99)], "k LONG, ver LONG"),
                table, ["k", "ver"],
            )
            removed = V.remove_orphan_files(table, older_than_ms=0)
            assert len(removed) >= 1
            got = sorted(
                (r.k, r.ver)
                for r in V.read_snapshot(spark, table).collect()
            )
            assert got == _snap(model), "orphan GC moved table state"
            continue  # no version created
        history.append(_snap(model))

        got = sorted(
            (r.k, r.ver) for r in V.read_snapshot(spark, table).collect()
        )
        assert got == _snap(model), f"head mismatch after {kind}"

    # time travel: every historical version still reads as its model
    for v, expected in enumerate(history):
        got = sorted(
            (r.k, r.ver)
            for r in V.read_snapshot(spark, table, version=v).collect()
        )
        assert got == expected, f"time travel to v{v} diverged"

    # CDC replay: folding each delta onto the prior model state gives
    # the next one (multiset semantics)
    for v in range(1, len(history)):
        delta = V.table_changes(spark, table, v - 1, v).collect()
        state = list(history[v - 1])
        for r in delta:
            if r._change_type == "insert":
                state.append((r.k, r.ver))
            else:
                state.remove((r.k, r.ver))
        assert sorted(state) == history[v], f"CDC v{v-1}->v{v} diverged"


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_partitioned_versioned_matches_model(spark, tmp_path_factory, ops):
    """Same random-sequence model, hive-partitioned flavor: overwrites
    (re)establish partition_by=['p'] (p = k % 2), appends follow the
    CURRENT manifest contract (every rewrite op now carries it
    forward, writing hive-layout output), and every read — head,
    time travel, CDC — must still match the model across whatever
    layouts the sequence produces."""
    table = str(tmp_path_factory.mktemp("pprop") / "tbl")
    tag = {"n": 0}

    def mk(keys):
        tag["n"] += 1
        rows = [(k, tag["n"], k % 2) for k in keys]
        return (
            spark.createDataFrame(rows, "k LONG, ver LONG, p LONG"),
            rows,
        )

    def pb_now():
        v = V.latest_version(table)
        if v is None:
            return None
        return V.read_manifest(table, v).get("partition_by")

    history: list[list[tuple[int, int, int]]] = []
    model: list[tuple[int, int, int]] = []

    for kind, payload in ops:
        if kind in ("append", "overwrite"):
            df, rows = mk(payload)
            pb = ["p"] if kind == "overwrite" else pb_now()
            V.commit_snapshot(df, table, mode=kind, partition_by=pb)
            model = (model + rows) if kind == "append" else list(rows)
        elif kind == "merge":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            df, rows = mk(payload)
            dedup = {r[0]: r for r in rows}
            src_rows = sorted(dedup.values())
            sdf = spark.createDataFrame(
                src_rows, "k LONG, ver LONG, p LONG"
            )
            V.merge_upsert(spark, table, sdf, key="k")
            keys = set(dedup)
            model = [r for r in model if r[0] not in keys] + src_rows
        elif kind == "delete":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            V.delete_where(
                spark,
                table,
                F.col("k") >= payload,
                prune=[("k", ">=", payload)],
            )
            model = [r for r in model if r[0] < payload]
        elif kind == "delete_mor":
            if V.latest_version(table) is None:
                continue
            V.delete_where_mor(spark, table, F.col("k") >= payload)
            model = [r for r in model if r[0] < payload]
        elif kind == "compact_dv":
            if V.latest_version(table) is None:
                continue
            if V.compact_dv(spark, table) is None:
                continue
        elif kind == "optimize":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            if V.optimize_snapshot(spark, table) is None:
                continue
        elif kind == "cluster":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            V.cluster_snapshot(
                spark, table, zorder=[("k", 0, 20)], target_bytes=1 << 20
            )
        elif kind == "respec":
            if V.latest_version(table) is None:
                continue
            specs = [["p"], ["bucket(2, k)"], None]
            V.set_partition_spec(table, specs[payload])
        history.append(_snap(model))

        got = sorted(
            (r.k, r.ver, r.p)
            for r in V.read_snapshot(spark, table).collect()
        )
        assert got == _snap(model), f"head mismatch after {kind}"

    for v, expected in enumerate(history):
        got = sorted(
            (r.k, r.ver, r.p)
            for r in V.read_snapshot(spark, table, version=v).collect()
        )
        assert got == expected, f"time travel to v{v} diverged"

    for v in range(1, len(history)):
        delta = V.table_changes(spark, table, v - 1, v).collect()
        state = list(history[v - 1])
        for r in delta:
            if r._change_type == "insert":
                state.append((r.k, r.ver, r.p))
            else:
                state.remove((r.k, r.ver, r.p))
        assert sorted(state) == history[v], f"CDC v{v-1}->v{v} diverged"


# branched-history walk: main ops interleave with staging-branch ops;
# the invariants are (a) main NEVER observes an unpublished commit,
# (b) a publish folds exactly the branch model into main, (c) a publish
# after main advanced raises CommitConflict and changes nothing,
# (d) abandon leaves main untouched.
_branch_op = st.one_of(
    st.tuples(
        st.just("main_append"),
        st.lists(st.integers(0, 19), min_size=1, max_size=4),
    ),
    st.tuples(st.just("branch_create"), st.none()),
    st.tuples(
        st.just("branch_append"),
        st.lists(st.integers(0, 19), min_size=1, max_size=4),
    ),
    st.tuples(st.just("branch_delete"), st.integers(0, 19)),
    st.tuples(st.just("publish"), st.none()),
    st.tuples(st.just("abandon"), st.none()),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_branch_op, min_size=2, max_size=6))
def test_branched_histories_match_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("wap") / "tbl")
    tag = {"n": 0}

    def mk(keys):
        tag["n"] += 1
        rows = [(k, tag["n"]) for k in keys]
        return spark.createDataFrame(rows, "k LONG, ver LONG"), rows

    df, rows = mk([0, 1, 2])
    V.commit_snapshot(df, table, mode="overwrite")
    main_model = list(rows)
    branch: dict | None = None  # {"model": rows, "stale": bool, "n": int}
    bname = "staging"

    def check_main():
        got = sorted(
            (r.k, r.ver) for r in V.read_snapshot(spark, table).collect()
        )
        assert got == sorted(main_model), "main observed unpublished state"

    for kind, payload in ops:
        if kind == "main_append":
            df, rows = mk(payload)
            V.commit_snapshot(df, table, mode="append")
            main_model += rows
            if branch is not None:
                branch["stale"] = True
        elif kind == "branch_create":
            if branch is not None:
                continue
            V.branch_create(table, bname)
            branch = {"model": list(main_model), "stale": False, "n": 0}
        elif kind == "branch_append":
            if branch is None:
                continue
            df, rows = mk(payload)
            V.commit_snapshot(
                df, V._branch_root(table, bname), mode="append"
            )
            branch["model"] += rows
            branch["n"] += 1
        elif kind == "branch_delete":
            if branch is None:
                continue
            V.delete_where(
                spark,
                V._branch_root(table, bname),
                F.col("k") >= payload,
                prune=[("k", ">=", payload)],
            )
            branch["model"] = [r for r in branch["model"] if r[0] < payload]
            branch["n"] += 1
        elif kind == "publish":
            if branch is None:
                continue
            if branch["n"] == 0:
                assert V.branch_publish(table, bname) is None
            elif branch["stale"]:
                with pytest.raises(V.CommitConflict):
                    V.branch_publish(table, bname)
                check_main()  # conflict must change nothing
            else:
                V.branch_publish(table, bname)
                main_model = list(branch["model"])
                V.branch_abandon(table, bname)
                branch = None
        elif kind == "abandon":
            if branch is None:
                continue
            V.branch_abandon(table, bname)
            branch = None
        check_main()
        if branch is not None:
            got = sorted(
                (r.k, r.ver)
                for r in V.read_snapshot(
                    spark, V._branch_root(table, bname)
                ).collect()
            )
            assert got == sorted(branch["model"]), "branch diverged"


# retention walk: vacuum interleaves with commits, MoR deletes, tags —
# with a SMALL checkpoint interval so folds, checkpoint pinning, and
# manifest deletion interact. Invariants: (a) every retained version
# (last keep_last or tagged) still reads exactly its model state after
# any vacuum — including delta versions whose fold chains crossed
# dropped manifests; (b) every dropped version fails LOUDLY.
_vac_op = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(st.integers(0, 19), min_size=1, max_size=3),
    ),
    st.tuples(
        st.just("overwrite"),
        st.lists(st.integers(0, 19), min_size=1, max_size=3),
    ),
    st.tuples(st.just("delete_mor"), st.integers(0, 19)),
    st.tuples(st.just("compact"), st.none()),
    st.tuples(st.just("tag"), st.none()),
    st.tuples(st.just("vacuum"), st.integers(1, 3)),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_vac_op, min_size=3, max_size=8))
def test_vacuum_retention_matches_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("vac") / "tbl")
    old_interval = V._CHECKPOINT_INTERVAL
    V._CHECKPOINT_INTERVAL = 3
    try:
        tag = {"n": 0}

        def mk(keys):
            tag["n"] += 1
            rows = [(k, tag["n"]) for k in keys]
            return (
                spark.createDataFrame(rows, "k LONG, ver LONG"), rows
            )

        df, rows = mk([0, 1])
        V.commit_snapshot(df, table, mode="overwrite")
        model = list(rows)
        alive: dict[int, list] = {0: sorted(model)}  # version -> rows
        dropped: set[int] = set()
        tags: set[int] = set()

        for kind, payload in ops:
            head = V.latest_version(table)
            if kind in ("append", "overwrite"):
                df, rows = mk(payload)
                V.commit_snapshot(df, table, mode=kind)
                model = (model + rows) if kind == "append" else list(rows)
                alive[head + 1] = sorted(model)
            elif kind == "delete_mor":
                V.delete_where_mor(spark, table, F.col("k") >= payload)
                model = [r for r in model if r[0] < payload]
                alive[head + 1] = sorted(model)
            elif kind == "compact":
                if V.compact_dv(spark, table) is None:
                    continue
                alive[head + 1] = sorted(model)
            elif kind == "tag":
                if head in tags:
                    continue
                V.create_tag(table, f"t{head}-{tag['n']}", version=head)
                tags.add(head)
            elif kind == "vacuum":
                V.vacuum(table, keep_last=payload)
                head = V.latest_version(table)
                keep = set(range(max(0, head - payload + 1), head + 1))
                keep |= tags
                dropped |= {v for v in alive if v not in keep}
                alive = {v: r for v, r in alive.items() if v in keep}
            # every retained version must still read its exact state
            for v, expected in alive.items():
                got = sorted(
                    (r.k, r.ver)
                    for r in V.read_snapshot(
                        spark, table, version=v
                    ).collect()
                )
                assert got == expected, f"v{v} diverged after {kind}"
            # every dropped version must fail loudly
            for v in dropped:
                with pytest.raises(FileNotFoundError):
                    V.read_manifest(table, v)
    finally:
        V._CHECKPOINT_INTERVAL = old_interval


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=5))
def test_transform_partitioned_matches_model(
    spark, tmp_path_factory, ops
):
    """Random-sequence model, HIDDEN-partitioning flavor: overwrites
    (re)establish partition_by=['day(ts)', 'bucket(2, k)'] — both
    TRANSFORMS, so the partition values live only in the path while
    the data files keep k and ts — and every read (head, time travel,
    CDC) must match the model across whatever mixed layouts the walk
    produces. ts derives deterministically from k (k%5 days past
    2024-01-01), so merges/deletes collide across partitions."""
    table = str(tmp_path_factory.mktemp("tprop") / "tbl")
    tag = {"n": 0}
    PB = ["day(ts)", "bucket(2, k)"]

    def mk(keys):
        tag["n"] += 1
        import datetime

        rows = [
            (
                k,
                tag["n"],
                datetime.datetime(2024, 1, 1) + datetime.timedelta(
                    days=k % 5
                ),
            )
            for k in keys
        ]
        return (
            spark.createDataFrame(rows, "k LONG, ver LONG, ts TIMESTAMP"),
            [(r[0], r[1]) for r in rows],
        )

    def pb_now():
        v = V.latest_version(table)
        if v is None:
            return None
        return V.read_manifest(table, v).get("partition_by")

    history: list[list[tuple[int, int]]] = []
    model: list[tuple[int, int]] = []

    for kind, payload in ops:
        if kind in ("append", "overwrite"):
            df, rows = mk(payload)
            pb = PB if kind == "overwrite" else pb_now()
            V.commit_snapshot(df, table, mode=kind, partition_by=pb)
            model = (model + rows) if kind == "append" else list(rows)
        elif kind == "merge":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            df, rows = mk(payload)
            dedup = {k: v for k, v in rows}
            src_rows = sorted(dedup.items())
            import datetime

            sdf = spark.createDataFrame(
                [
                    (
                        k,
                        v,
                        datetime.datetime(2024, 1, 1)
                        + datetime.timedelta(days=k % 5),
                    )
                    for k, v in src_rows
                ],
                "k LONG, ver LONG, ts TIMESTAMP",
            )
            V.merge_upsert(spark, table, sdf, key="k")
            keys = set(dedup)
            model = [r for r in model if r[0] not in keys] + src_rows
        elif kind == "delete":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            V.delete_where(
                spark,
                table,
                F.col("k") >= payload,
                prune=[("k", ">=", payload)],
            )
            model = [r for r in model if r[0] < payload]
        elif kind == "delete_mor":
            if V.latest_version(table) is None:
                continue
            V.delete_where_mor(spark, table, F.col("k") >= payload)
            model = [r for r in model if r[0] < payload]
        elif kind == "compact_dv":
            if V.latest_version(table) is None:
                continue
            if V.compact_dv(spark, table) is None:
                continue
        elif kind == "optimize":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            if V.optimize_snapshot(spark, table) is None:
                continue
        elif kind == "cluster":
            if V.latest_version(table) is None:
                continue
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append(_snap(model))
            V.cluster_snapshot(
                spark, table, zorder=[("k", 0, 20)], target_bytes=1 << 20
            )
        elif kind == "respec":
            if V.latest_version(table) is None:
                continue
            specs = [PB, ["day(ts)"], None]
            V.set_partition_spec(table, specs[payload])
        history.append(_snap(model))

        got = sorted(
            (r.k, r.ver) for r in V.read_snapshot(spark, table).collect()
        )
        assert got == _snap(model), f"head mismatch after {kind}"
        # transform pruning must never lose rows at any point
        sat = sorted(
            (r.k, r.ver)
            for r in V.read_snapshot(
                spark, table, where=[("ts", ">=", "2024-01-03 00:00:00")]
            )
            .filter(F.col("ts") >= "2024-01-03 00:00:00")
            .collect()
        )
        assert sat == _snap([r for r in model if r[0] % 5 >= 2]), (
            f"transform-pruned read diverged after {kind}"
        )

    for v, expected in enumerate(history):
        got = sorted(
            (r.k, r.ver)
            for r in V.read_snapshot(spark, table, version=v).collect()
        )
        assert got == expected, f"time travel to v{v} diverged"

    for v in range(1, len(history)):
        delta = V.table_changes(spark, table, v - 1, v).collect()
        state = list(history[v - 1])
        for r in delta:
            if r._change_type == "insert":
                state.append((r.k, r.ver))
            else:
                state.remove((r.k, r.ver))
        assert sorted(state) == history[v], f"CDC v{v-1}->v{v} diverged"


# streaming-upsert walk: equality-delete batches interleave with plain
# appends and compactions; head reads and time travel must match a
# last-write-wins dict model at every step, and CDC between
# consecutive versions must replay the model transition (upsert
# ranges emit delete+insert pairs through the eq-aware diff).
_ups_op = st.one_of(
    st.tuples(
        st.just("upsert"),
        st.lists(st.integers(0, 9), min_size=1, max_size=4),
    ),
    st.tuples(
        st.just("append"),
        st.lists(st.integers(100, 104), min_size=1, max_size=2),
    ),
    st.tuples(st.just("compact"), st.none()),
    # eq-aware OPTIMIZE interleaves with live deletes (r9): folds the
    # backlog for rewritten files, carries it for the rest — the LWW
    # model must hold right through it
    st.tuples(st.just("optimize"), st.none()),
    # the policy hook (r9): whatever combination of compactions it
    # decides to run (possibly WAP-staged), contents must not move
    st.tuples(st.just("auto_maintain"), st.none()),
    # CHECK constraints interleaved with live eq-deletes (r9 s2): the
    # add is a metadata-only commit the LWW replay must survive, and
    # a violating batch must bounce without moving version or state
    st.tuples(st.just("constraint"), st.none()),
    st.tuples(
        st.just("bad_upsert"),
        st.lists(st.integers(0, 9), min_size=1, max_size=2),
    ),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_ups_op, min_size=2, max_size=6))
def test_stream_upserts_match_lww_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("ups") / "tbl")
    tag = {"n": 0}

    def mk(keys):
        tag["n"] += 1
        # dedupe keys within a batch (the sink keeps one row per key)
        rows = [(k, tag["n"]) for k in sorted(set(keys))]
        return spark.createDataFrame(rows, "k LONG, ver LONG"), rows

    df, rows = mk([0, 1])
    V.stream_upsert_batch(df, 0, table, key="k")
    model: dict[int, int] = dict(rows)
    history = [sorted(model.items())]
    batch = 1

    for kind, payload in ops:
        if kind == "upsert":
            df, rows = mk(payload)
            V.stream_upsert_batch(df, batch, table, key="k")
            batch += 1
            model.update(dict(rows))
        elif kind == "append":
            # plain appends coexist with live deletes (new keys only,
            # so the LWW dict model stays exact)
            df, rows = mk(payload)
            fresh = [(k, v) for k, v in rows if k not in model]
            if not fresh:
                continue
            V.commit_snapshot(
                spark.createDataFrame(fresh, "k LONG, ver LONG"),
                table, mode="append",
            )
            model.update(dict(fresh))
        elif kind == "compact":
            if V.compact_eq_deletes(spark, table) is None:
                continue
        elif kind == "optimize":
            if V.optimize_snapshot(spark, table) is None:
                continue
        elif kind == "constraint":
            if "ver_pos" in V.list_constraints(table):
                continue
            V.add_constraint(spark, table, "ver_pos", "ver >= 0")
        elif kind == "bad_upsert":
            if "ver_pos" not in V.list_constraints(table):
                continue
            head = V.latest_version(table)
            bad = spark.createDataFrame(
                [(k, -1) for k in sorted(set(payload))], "k LONG, ver LONG"
            )
            with pytest.raises(V.ConstraintViolation):
                V.stream_upsert_batch(bad, batch, table, key="k")
            assert V.latest_version(table) == head
            got = sorted(
                (r.k, r.ver)
                for r in V.read_snapshot(spark, table).collect()
            )
            assert got == sorted(model.items())
            continue  # no commit: no history entry
        elif kind == "auto_maintain":
            out = V.auto_maintain(
                spark, table, eq_backlog=1, small_file_trigger=2
            )
            assert not out["conflict"]
            if V.latest_version(table) + 1 == len(history):
                continue  # no commit landed: no new version to track
            # a maintain may land 1-2 commits (publish, or direct
            # compact+optimize); model is unchanged for each
            while len(history) < V.latest_version(table):
                history.append(sorted(model.items()))
        history.append(sorted(model.items()))

        got = sorted(
            (r.k, r.ver) for r in V.read_snapshot(spark, table).collect()
        )
        assert got == sorted(model.items()), f"head diverged after {kind}"

    for v, expected in enumerate(history):
        got = sorted(
            (r.k, r.ver)
            for r in V.read_snapshot(spark, table, version=v).collect()
        )
        assert got == expected, f"time travel to v{v} diverged"

    for v in range(1, len(history)):
        delta = V.table_changes(spark, table, v - 1, v).collect()
        state = list(history[v - 1])
        for r in delta:
            if r._change_type == "insert":
                state.append((r.k, r.ver))
            else:
                state.remove((r.k, r.ver))
        assert sorted(state) == history[v], f"CDC v{v-1}->v{v} diverged"


# schema-evolution walk: rename/widen/drop+readd interleave with
# appends, merges, MoR deletes and compactions. Invariants: (a) the
# head always reads as the LOGICAL model regardless of which physical
# name/type each surviving file was written under; (b) time travel to
# every version shows that version's OWN schema and rows; (c) every
# evolution commit is metadata-only — its CDC delta is EMPTY and it
# touches no data file; (d) data-commit CDC still replays the model.
_evo_op = st.one_of(
    st.tuples(
        st.just("append"),
        st.lists(st.integers(0, 19), min_size=1, max_size=4),
    ),
    st.tuples(
        st.just("merge"),
        st.lists(st.integers(0, 19), min_size=1, max_size=3),
    ),
    st.tuples(st.just("delete_mor"), st.integers(0, 19)),
    st.tuples(st.just("compact_dv"), st.none()),
    st.tuples(st.just("optimize"), st.none()),
    st.tuples(st.just("rename"), st.none()),
    st.tuples(st.just("widen"), st.none()),
    st.tuples(st.just("drop_readd"), st.none()),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_evo_op, min_size=2, max_size=6))
def test_evolving_schema_matches_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("evo") / "tbl")
    tag = {"n": 0}
    cur = {"val": "v0", "type": "int"}  # the wandering value column

    def mk(keys):
        tag["n"] += 1
        rows = [(k, tag["n"]) for k in sorted(set(keys))]
        df = spark.createDataFrame(
            rows, f"k LONG, {cur['val']} {cur['type'].upper()}"
        )
        return df, rows

    def _key(t):
        # post-drop rows carry None values; sort them below any int
        return (t[0], -1 if len(t) < 2 or t[1] is None else t[1])

    def collect(version=None):
        df = V.read_snapshot(spark, table, version=version)
        name = None
        for c in df.columns:
            if c != "k":
                name = c
        if name is None:
            return sorted(((r.k,) for r in df.collect()), key=_key)
        return sorted(((r.k, r[name]) for r in df.collect()), key=_key)

    df, rows = mk([0, 1, 2])
    V.commit_snapshot(df, table, mode="overwrite")
    model: list[tuple] = list(rows)  # logical (k, val); val None after drop
    # per version: (expected projected rows, was this commit evolution?)
    history: list[tuple[list, bool]] = [(sorted(model, key=_key), False)]

    for kind, payload in ops:
        if kind == "append":
            df, rows = mk(payload)
            V.commit_snapshot(df, table, mode="append")
            model = model + rows
            history.append((sorted(model, key=_key), False))
        elif kind == "merge":
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append((sorted(model, key=_key), False))
            df, rows = mk(payload)
            V.merge_upsert(spark, table, df, key="k")
            keys = {r[0] for r in rows}
            model = [r for r in model if r[0] not in keys] + rows
            history.append((sorted(model, key=_key), False))
        elif kind == "delete_mor":
            V.delete_where_mor(spark, table, F.col("k") >= payload)
            model = [r for r in model if r[0] < payload]
            history.append((sorted(model, key=_key), False))
        elif kind == "compact_dv":
            if V.compact_dv(spark, table) is None:
                continue
            history.append((sorted(model, key=_key), False))
        elif kind == "optimize":
            if _dv_live(table):
                V.compact_dv(spark, table)
                history.append((sorted(model, key=_key), False))
            if V.optimize_snapshot(spark, table) is None:
                continue
            history.append((sorted(model, key=_key), False))
        elif kind == "rename":
            tag["n"] += 1
            new = f"v{tag['n']}"
            files_before = {
                e["path"]
                for e in V.read_manifest(
                    table, V.latest_version(table)
                )["files"]
            }
            V.rename_column(table, cur["val"], new)
            cur["val"] = new
            m = V.read_manifest(table, V.latest_version(table))
            assert {e["path"] for e in m["files"]} == files_before, (
                "rename touched data files"
            )
            history.append((sorted(model, key=_key), True))
        elif kind == "widen":
            if cur["type"] != "int":
                continue
            V.widen_type(table, cur["val"], "long")
            cur["type"] = "long"
            history.append((sorted(model, key=_key), True))
        elif kind == "drop_readd":
            V.drop_column(table, cur["val"])
            history.append(
                (sorted(((r[0],) for r in model), key=_key), True)
            )
            tag["n"] += 1
            cur["val"], cur["type"] = f"v{tag['n']}", "int"
            V.add_column(table, cur["val"], "integer")
            model = [(r[0], None) for r in model]
            history.append((sorted(model, key=_key), True))

        assert collect() == sorted(model, key=_key), f"head diverged after {kind}"

    # time travel: every version reads its own schema's projection
    for v, (expected, _evolve) in enumerate(history):
        assert collect(version=v) == expected, f"time travel v{v} diverged"

    # CDC: evolution commits are empty deltas; data commits replay
    for v in range(1, len(history)):
        delta = V.table_changes(spark, table, v - 1, v)
        rows = delta.collect()
        if history[v][1]:
            assert rows == [], f"evolution commit v{v} leaked a CDC delta"
            continue
        name = None
        for c in delta.columns:
            if c not in ("k", "_change_type"):
                name = c
        state = list(history[v - 1][0])
        for r in rows:
            t = (r.k,) if name is None else (r.k, r[name])
            if r._change_type == "insert":
                state.append(t)
            else:
                state.remove(t)
        assert sorted(state, key=_key) == history[v][0], f"CDC v{v-1}->{v} diverged"


# interleaved-writers walk: each op may LOSE its first commit race to
# an interloper append that lands mid-plan (injected at the O_EXCL
# boundary — exactly where a real concurrent writer wins). Invariants:
# re-plannable ops (append, delete_mor, rename) rebase and land, the
# interloper's rows are never lost, and the final table matches a
# model that saw both writers.
_race_op = st.tuples(
    st.sampled_from(["append", "delete_mor", "rename", "optimize"]),
    st.lists(st.integers(0, 19), min_size=1, max_size=3),
    st.booleans(),  # race this op?
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_race_op, min_size=1, max_size=4))
def test_interleaved_writers_match_model(spark, tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("race") / "tbl")
    tag = {"n": 0}
    cur = {"val": "ver"}

    def mk(keys, lo=0):
        tag["n"] += 1
        rows = [(k + lo, tag["n"]) for k in sorted(set(keys))]
        return (
            spark.createDataFrame(rows, f"k LONG, {cur['val']} LONG"),
            rows,
        )

    df, rows = mk([0, 1, 2])
    V.commit_snapshot(df, table, mode="overwrite")
    model = list(rows)

    real_create = V._atomic_create
    state = {"arm": False, "busy": False}

    def racing_create(path, payload):
        if state["arm"] and not state["busy"]:
            state["arm"] = False
            state["busy"] = True  # interloper goes through for real
            try:
                df, rows = mk([0, 1], lo=100)  # keys 100+: outside
                V.commit_snapshot(df, table, mode="append")
                model.extend(rows)
            finally:
                state["busy"] = False
            return False  # the op under test lost this round
        return real_create(path, payload)

    V._atomic_create = racing_create
    try:
        for kind, payload, race in ops:
            state["arm"] = race
            if kind == "append":
                df, rows = mk(payload)
                V.commit_snapshot(df, table, mode="append")
                model.extend(rows)
            elif kind == "delete_mor":
                cut = payload[0]
                V.delete_where_mor(
                    spark, table,
                    (F.col("k") >= cut) & (F.col("k") < 100),
                )
                model[:] = [
                    r for r in model if r[0] < cut or r[0] >= 100
                ]
            elif kind == "rename":
                tag["n"] += 1
                new = f"ver{tag['n']}"
                V.rename_column(table, cur["val"], new)
                cur["val"] = new
            elif kind == "optimize":
                # row-preserving compaction: when raced, the new
                # validate-and-rebase path must re-attach past the
                # interloper's append WITHOUT losing its rows (r10:
                # rewrites used to refuse on any lost race). A live
                # DV blocks rebase by design, so fold it first.
                if V.read_manifest(
                    table, V.latest_version(table)
                ).get("dv"):
                    V.compact_dv(spark, table)
                V.optimize_snapshot(spark, table, target_bytes=1 << 30)
            state["arm"] = False
            got = sorted(
                (r.k, r[cur["val"]])
                for r in V.read_snapshot(spark, table).collect()
            )
            assert got == sorted(model), f"diverged after {kind} race={race}"
    finally:
        V._atomic_create = real_create
