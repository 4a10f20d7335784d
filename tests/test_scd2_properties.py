"""Property-based invariants for scd2_upsert over randomized
current/update sets: exactly one open row per key, history preserved,
changed keys close+append correctly, unchanged keys untouched, and a
second identical merge is a no-op (idempotence)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from small_etl_spark.operators.joins import scd2_upsert

keys_st = st.integers(min_value=0, max_value=3)

current_st = st.dictionaries(
    keys_st,
    st.tuples(
        st.integers(min_value=0, max_value=2),  # n history rows
        st.integers(min_value=-5, max_value=5),  # open-row value
    ),
    min_size=1,
    max_size=4,
)
updates_st = st.dictionaries(
    keys_st, st.integers(min_value=-5, max_value=5), max_size=4
)


def _current_df(spark, current):
    rows = []
    for k, (n_hist, open_val) in current.items():
        for h in range(n_hist):
            rows.append(
                (k, -100 - h, f"2020-01-0{h + 1}", f"2020-01-0{h + 2}", False)
            )
        rows.append((k, open_val, "2023-01-01", None, True))
    return spark.createDataFrame(
        rows, "k long, val long, valid_from string, valid_to string, is_current boolean"
    )


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(current=current_st, updates=updates_st)
def test_scd2_invariants(spark, current, updates):
    cur = _current_df(spark, current)
    upd = spark.createDataFrame(
        [(k, v) for k, v in updates.items()], "k long, val long"
    )
    out = scd2_upsert(
        cur, upd, key="k", compare_cols=["val"], effective="2024-06-01"
    ).collect()

    by_key: dict[int, list] = {}
    for r in out:
        by_key.setdefault(r.k, []).append(r)

    assert set(by_key) == set(current)  # no keys appear or vanish
    for k, rows in by_key.items():
        open_rows = [r for r in rows if r.is_current]
        assert len(open_rows) == 1, (k, rows)
        assert open_rows[0].valid_to is None
        n_hist, open_val = current[k]
        changed = k in updates and updates[k] != open_val
        if changed:
            # history + closed old open + new open
            assert len(rows) == n_hist + 2
            assert open_rows[0].val == updates[k]
            assert open_rows[0].valid_from == "2024-06-01"
            closed = [
                r for r in rows if not r.is_current and r.valid_to == "2024-06-01"
            ]
            assert len(closed) == 1 and closed[0].val == open_val
        else:
            assert len(rows) == n_hist + 1
            assert open_rows[0].val == open_val

    # idempotence: merging the same updates again changes nothing
    out_df = scd2_upsert(
        cur, upd, key="k", compare_cols=["val"], effective="2024-06-01"
    )
    again = scd2_upsert(
        out_df, upd, key="k", compare_cols=["val"], effective="2024-07-01"
    )
    a = sorted(map(tuple, again.collect()))
    b = sorted(map(tuple, out))
    assert a == b
