"""Incrementally maintained materialized views (sinks/matview.py).

Example tests cover the refresh contract per base-commit kind plus the
degenerate paths (noop, watermark-only, extinction tombstones,
re-insert after extinction, null group keys, null agg inputs). The
hypothesis walk drives random base histories — append / merge /
COW+MoR delete / optimize / compaction — with refreshes interleaved at
random points, and after EVERY refresh the view must equal a full
recompute of its defining query over the base head. The reference
repo's model-testing strategy (SURVEY §5) applied to view maintenance:
if any delta path (counting update, min/max rescan, tombstoning)
drifts from the recompute semantics, some random history finds it.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from small_etl_spark.sinks import matview as M
from small_etl_spark.sinks import versioned as V

SCHEMA = "id bigint, g string, x double, y bigint"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _rows(ids, g=None):
    return [
        (
            i,
            g if g is not None else ["a", "b", "c"][i % 3],
            float(i),
            None if i % 7 == 0 else i * 10,
        )
        for i in ids
    ]


AGGS = {
    "n": ("count", "*"),
    "sum_x": ("sum", "x"),
    "avg_y": ("avg", "y"),
    "min_id": ("min", "id"),
    "max_id": ("max", "id"),
    "cnt_y": ("count", "y"),
}


def _expected(spark, base, where=None):
    b = V.read_snapshot(spark, base)
    if where:
        b = b.filter(where)
    return (
        b.groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sum_x"),
            F.avg("y").alias("avg_y"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
            F.count("y").alias("cnt_y"),
        )
        .collect()
    )


def _key(rows):
    return sorted(rows, key=lambda r: tuple(repr(v) for v in r))


def _check(spark, base, view, where=None):
    got = _key(M.read_matview(spark, view).collect())
    exp = _key(_expected(spark, base, where))
    assert got == exp


@pytest.fixture()
def roots(tmp_path):
    return str(tmp_path / "base"), str(tmp_path / "view")


def test_create_and_read(spark, roots):
    base, view = roots
    V.commit_snapshot(
        _df(spark, _rows(range(60))).repartitionByRange(4, "id"),
        base,
        mode="overwrite",
    )
    v = M.create_matview(
        spark, view, base, group_by=["g"], aggs=AGGS, where="id >= 10"
    )
    assert v == 0
    _check(spark, base, view, where="id >= 10")
    info = M.matview_info(view)
    assert info["refreshed_to"] == 0
    assert info["where"] == "id >= 10"
    assert set(info["aggs"]) == set(AGGS)


def test_append_refresh_is_incremental(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(60))), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    V.commit_snapshot(_df(spark, _rows(range(60, 75), g="b")), base)
    r = M.refresh_matview(spark, view)
    assert r["mode"] == "incremental"
    # only group b changed; the delta must not touch a or c, and no
    # min/max rescan fires on a pure-insert delta
    assert r["groups_changed"] == 1
    assert r["groups_rescanned"] == 0
    _check(spark, base, view)


def test_noop_and_watermark_refresh(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(40))), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    assert M.refresh_matview(spark, view)["mode"] == "noop"
    # a pure layout rewrite nets an empty CDC delta -> metadata-only
    # watermark commit, no state files rewritten
    V.optimize_snapshot(spark, base, target_bytes=1 << 30)
    before = {
        e["path"]
        for e in V.read_manifest(
            M._state_root(view), V.latest_version(M._state_root(view))
        )["files"]
    }
    r = M.refresh_matview(spark, view)
    assert r["mode"] == "watermark"
    after_v = V.latest_version(M._state_root(view))
    after = {
        e["path"]
        for e in V.read_manifest(M._state_root(view), after_v)["files"]
    }
    assert before == after
    assert M.matview_info(view)["refreshed_to"] == 1
    _check(spark, base, view)


def test_mor_delete_rescans_only_touched_groups(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(90))), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    # deletes only rows of group a (ids ≡ 0 mod 3)
    V.delete_where_mor(spark, base, "g = 'a' and id < 30")
    r = M.refresh_matview(spark, view)
    assert r["mode"] == "incremental"
    assert r["groups_changed"] == 1
    assert r["groups_rescanned"] == 1  # min/max under deletes
    _check(spark, base, view)


def test_sum_only_view_never_rescans(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(90))), base, mode="overwrite")
    aggs = {"n": ("count", "*"), "sum_x": ("sum", "x")}
    M.create_matview(spark, view, base, group_by=["g"], aggs=aggs)
    V.delete_where(spark, base, F.expr("id < 30"))
    r = M.refresh_matview(spark, view)
    assert r["mode"] == "incremental"
    assert r["groups_rescanned"] == 0  # counting algorithm: no base read
    got = {r_.g: (r_.n, r_.sum_x) for r_ in M.read_matview(spark, view).collect()}
    exp = {
        r_.g: (r_.n, r_.sum_x)
        for r_ in V.read_snapshot(spark, base)
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("sum_x"))
        .collect()
    }
    assert got == exp


def test_extinction_tombstone_and_reinsert(spark, roots):
    base, view = roots
    V.commit_snapshot(
        _df(spark, _rows(range(9)) + _rows([100, 101], g="z")),
        base,
        mode="overwrite",
    )
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    V.delete_where(spark, base, F.expr("g = 'z'"))
    M.refresh_matview(spark, view)
    assert not [
        r for r in M.read_matview(spark, view).collect() if r.g == "z"
    ]
    # tombstone row survives in the state (n=0, filtered on read)
    st = V.read_snapshot(spark, M._state_root(view))
    assert st.filter("g = 'z' and __n__ = 0").count() == 1
    V.commit_snapshot(_df(spark, _rows([102, 103], g="z")), base)
    M.refresh_matview(spark, view)
    _check(spark, base, view)


def test_null_group_key_and_null_agg_inputs(spark, roots):
    base, view = roots
    rows = _rows(range(20)) + [(200, None, None, None), (201, None, 5.0, 7)]
    V.commit_snapshot(_df(spark, rows), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    _check(spark, base, view)
    V.commit_snapshot(_df(spark, [(202, None, 1.0, None)]), base)
    M.refresh_matview(spark, view)
    _check(spark, base, view)
    # delete one null-group row: min/max rescan must hit the null group
    V.delete_where(spark, base, F.expr("id = 201"))
    r = M.refresh_matview(spark, view)
    assert r["groups_rescanned"] == 1
    _check(spark, base, view)


def test_multi_column_group_by(spark, roots):
    base, view = roots
    rows = [(i, ["a", "b"][i % 2], float(i % 5), i) for i in range(50)]
    V.commit_snapshot(_df(spark, rows), base, mode="overwrite")
    M.create_matview(
        spark, view, base, group_by=["g", "x"],
        aggs={"n": ("count", "*"), "sy": ("sum", "y")},
    )
    V.commit_snapshot(
        _df(spark, [(100, "a", 2.0, 9), (101, None, None, 3)]), base
    )
    M.refresh_matview(spark, view)
    got = _key(M.read_matview(spark, view).collect())
    exp = _key(
        V.read_snapshot(spark, base)
        .groupBy("g", "x")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy"))
        .collect()
    )
    assert got == exp


def test_merge_upsert_refresh(spark, roots):
    base, view = roots
    V.commit_snapshot(
        _df(spark, _rows(range(60))).repartitionByRange(4, "id"),
        base,
        mode="overwrite",
    )
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    src = _df(spark, [(3, "a", 777.0, 1), (500, "q", 1.0, None)])
    V.merge_upsert(spark, base, src, key="id")
    M.refresh_matview(spark, view)
    _check(spark, base, view)


def test_stream_upsert_and_eq_compaction_refresh(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(30))), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    V.stream_upsert_batch(
        _df(spark, [(3, "b", 300.0, 1), (400, "b", 4.0, 2)]),
        batch_id=0, table=base, key="id",
    )
    M.refresh_matview(spark, view)
    _check(spark, base, view)
    V.compact_eq_deletes(spark, base)
    r = M.refresh_matview(spark, view)
    assert r["mode"] in ("watermark", "incremental")
    _check(spark, base, view)


def test_view_with_filter_ignores_outside_changes(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(40))), base, mode="overwrite")
    M.create_matview(
        spark, view, base, group_by=["g"], aggs=AGGS, where="id < 100"
    )
    # delta entirely outside the view predicate -> watermark only
    V.commit_snapshot(_df(spark, _rows([200, 201], g="b")), base)
    r = M.refresh_matview(spark, view)
    assert r["mode"] == "watermark"
    _check(spark, base, view, where="id < 100")


def test_base_overwrite_resets_contents(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(30))), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    V.commit_snapshot(
        _df(spark, _rows(range(500, 520))), base, mode="overwrite"
    )
    M.refresh_matview(spark, view)
    _check(spark, base, view)


def test_defn_validation(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(5))), base, mode="overwrite")
    with pytest.raises(M.MatviewError, match="unsupported function"):
        M.create_matview(
            spark, view, base, group_by=["g"],
            aggs={"m": ("median", "x")},
        )
    with pytest.raises(M.MatviewError, match="group_by"):
        M.create_matview(spark, view, base, group_by=[], aggs=AGGS)
    with pytest.raises(M.MatviewError, match="collides"):
        M.create_matview(
            spark, view, base, group_by=["g"], aggs={"g": ("sum", "x")}
        )
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    with pytest.raises(M.MatviewError, match="already exists"):
        M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)


def test_drop_matview(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(5))), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    M.drop_matview(view)
    with pytest.raises(FileNotFoundError):
        M.matview_info(view)


# --- hypothesis walk -------------------------------------------------------

_op = st.one_of(
    st.tuples(
        st.just("append"),
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
    st.tuples(st.just("refresh"), st.none()),
)


def _mk_row(k: int, salt: int):
    return (
        k,
        ["a", "b", "c"][k % 3],
        float(salt % 11),
        None if (k + salt) % 5 == 0 else (k * 10 + salt),
    )


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=2, max_size=6))
def test_matview_matches_recompute(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("mvwalk")
    base, view = str(root / "base"), str(root / "view")
    V.commit_snapshot(
        _df(spark, [_mk_row(k, 0) for k in range(0, 20, 2)]),
        base,
        mode="overwrite",
    )
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)

    def dv_live() -> bool:
        v = V.latest_version(base)
        return bool(V.read_manifest(base, v).get("dv"))

    for i, (kind, payload) in enumerate(ops):
        if kind == "append":
            V.commit_snapshot(
                _df(spark, [_mk_row(k, i + 1) for k in payload]), base
            )
        elif kind == "merge":
            if dv_live():
                V.compact_dv(spark, base)
            V.merge_upsert(
                spark, base,
                _df(spark, [_mk_row(k, i + 100) for k in set(payload)]),
                key="id",
            )
        elif kind == "delete":
            if dv_live():
                V.compact_dv(spark, base)
            V.delete_where(spark, base, F.expr(f"id = {payload}"))
        elif kind == "delete_mor":
            V.delete_where_mor(spark, base, f"id = {payload}")
        elif kind == "compact_dv":
            V.compact_dv(spark, base)
        elif kind == "optimize":
            if dv_live():
                V.compact_dv(spark, base)
            V.optimize_snapshot(spark, base, target_bytes=1 << 30)
        elif kind == "refresh":
            M.refresh_matview(spark, view)
            _check(spark, base, view)
    M.refresh_matview(spark, view)
    _check(spark, base, view)


def _check_rt(spark, base, view, where=None):
    got = _key(M.read_matview_realtime(spark, view).collect())
    exp = _key(_expected(spark, base, where))
    assert got == exp


def test_realtime_equals_recompute_without_refresh(spark, roots):
    """Appends + a merge land AFTER the watermark; the real-time read
    must equal a full recompute while read_matview stays stale."""
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(12))), base,
                      mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    V.commit_snapshot(_df(spark, _rows(range(12, 20))), base,
                      mode="append")
    V.merge_upsert(
        spark, base, _df(spark, _rows([3, 4], g="zz")), key="id"
    )
    _check_rt(spark, base, view)
    # the materialized read still reflects the watermark (stale)
    stale = _key(M.read_matview(spark, view).collect())
    assert stale != _key(_expected(spark, base))
    # a refresh converges all three
    assert M.refresh_matview(spark, view)["mode"] == "incremental"
    _check(spark, base, view)
    _check_rt(spark, base, view)


def test_realtime_at_watermark_is_materialized_read(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(9))), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    got = _key(M.read_matview_realtime(spark, view).collect())
    assert got == _key(M.read_matview(spark, view).collect())


def test_realtime_minmax_under_tail_deletes(spark, roots):
    """A delete of the current max in the UN-refreshed tail: the
    touched group's rescan must find the runner-up."""
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(12))), base,
                      mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    V.delete_where(spark, base, F.col("id") >= 9)  # drops each g's max
    _check_rt(spark, base, view)


def test_realtime_extinct_and_new_groups(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(6))), base, mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS)
    # extinguish group 'a' (ids 0,3) and birth group 'q' — both in the
    # un-refreshed tail
    V.delete_where(spark, base, F.col("g") == "a")
    V.commit_snapshot(_df(spark, _rows([100, 101], g="q")), base,
                      mode="append")
    got = M.read_matview_realtime(spark, view)
    groups = {r.g for r in got.collect()}
    assert "a" not in groups and "q" in groups
    _check_rt(spark, base, view)


def test_realtime_respects_where(spark, roots):
    base, view = roots
    V.commit_snapshot(_df(spark, _rows(range(10))), base,
                      mode="overwrite")
    M.create_matview(spark, view, base, group_by=["g"], aggs=AGGS,
                     where="id % 2 = 0")
    V.commit_snapshot(_df(spark, _rows(range(10, 16))), base,
                      mode="append")
    _check_rt(spark, base, view, where="id % 2 = 0")
