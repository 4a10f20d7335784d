"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star, SURVEY §2.10 — the reference has no stateful processing).

``running_user_stats`` maintains per-user running aggregates across
micro-batches: the canonical shape for custom state Spark's built-in
windowed aggs can't express (e.g. "emit the delta since the user's
last batch").

Scale shape: state lives in the state store, partitioned by the
grouping key across ``spark.sql.shuffle.partitions`` — size that to
key cardinality. A GroupStateTimeout evicts idle users so state stays
bounded (the watermark analog for custom state).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, batch_events bigint, total_events bigint, total_value double"
)
STATE_SCHEMA = "total_events bigint, total_value double"


def _update_user_stats(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    n = 0
    v = 0.0
    for pdf in pdfs:
        n += len(pdf)
        v += float(pdf["value"].sum())
    if state.exists:
        (total_n, total_v) = state.get
    else:
        total_n, total_v = 0, 0.0
    total_n += n
    total_v += v
    state.update((total_n, total_v))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "batch_events": [n],
            "total_events": [total_n],
            "total_value": [round(total_v, 2)],
        }
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (cross-batch) event count + value sum; emits one
    row per user per micro-batch with both the batch delta and the
    running totals."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EXACT_OUTPUT_SCHEMA = (
    "user_id bigint, total_events bigint, total_value_cents bigint"
)
EXACT_STATE_SCHEMA = "total_events bigint, total_value_cents bigint"


def _update_user_totals_exact(key, pdfs: Iterator, state: GroupState):
    import pandas as pd

    n = 0
    cents = 0
    for pdf in pdfs:
        n += len(pdf)
        # per-row cents BEFORE summing: integer accumulation is
        # order-insensitive, so cross-batch totals are exact and the
        # final emission hash-matches a batch SQL aggregate.
        # dropna = SQL SUM semantics (null values don't contribute;
        # astype(int64) on NaN throws)
        cents += int((pdf["value"].dropna() * 100).round().astype("int64").sum())
    if state.exists:
        total_n, total_c = state.get
    else:
        total_n, total_c = 0, 0
    total_n += n
    total_c += cents
    state.update((total_n, total_c))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "total_events": [total_n],
            "total_value_cents": [total_c],
        }
    )


def running_user_totals_exact(events: DataFrame) -> DataFrame:
    """Per-user running totals with EXACT integer-cent accumulation —
    the oracle-gated variant of :func:`running_user_stats`: because
    state is integers, the last emission per user equals the batch
    aggregate bit-for-bit regardless of micro-batch count or order."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals_exact,
            outputStructType=EXACT_OUTPUT_SCHEMA,
            stateStructType=EXACT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _RunningTotalsProcessor:
    """Lazy import shim — see running_user_totals_tws below."""


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user exact running totals on the transformWithStateInPandas
    API (Spark 4 arbitrary-state v2: typed ValueState in a RocksDB
    state store, timer support, schema evolution) — the modern twin
    of :func:`running_user_totals_exact`, same integer-cent exactness
    contract, so the drained stream hash-matches the batch aggregate.

    Requires (a) the RocksDB state store provider (bundled in
    Spark 4 — set ``spark.sql.streaming.stateStore.providerClass``
    to RocksDBStateStoreProvider before the query starts) and (b)
    the ``protobuf`` package, which the state-server protocol
    imports in its driver worker AND in every task worker — absent
    protobuf the query fails at init with
    STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE. In hermetic
    containers streaming.pbcompat wires in the Google Cloud SDK's
    pure-Python protobuf runtime (session.get_spark enables it
    before the JVM starts), so this path executes for real here;
    tests/test_streaming.py::test_transform_with_state_totals
    drains it and hash-matches the batch aggregate. The
    applyInPandasWithState twin has no protobuf dependency and
    stays the oracle-gated default.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n = 0
            cents = 0
            for pdf in rows:
                n += len(pdf)
                # dropna = SQL SUM semantics (astype(int64) on NaN throws)
                cents += int(
                    (pdf["value"].dropna() * 100).round().astype("int64").sum()
                )
            if self._state.exists():
                pn, pc = self._state.get()
                n += pn
                cents += pc
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "total_events": [n],
                    "total_value_cents": [cents],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=EXACT_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint"
)
SESSION_STATE_SCHEMA = "start_us bigint, end_us bigint, n bigint"


def _session_update(key, pdfs: Iterator, state: GroupState):
    """Grow the user's open session; on event-time timeout, emit the
    completed session and drop the state (bounded-state eviction)."""
    import pandas as pd

    if state.hasTimedOut:
        start_us, end_us, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "session_start_us": [start_us],
                "session_end_us": [end_us],
                "n_events": [n],
            }
        )
        return

    lo, hi, n = None, None, 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts_us = (
            pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        )
        lo = int(ts_us.min()) if lo is None else min(lo, int(ts_us.min()))
        hi = int(ts_us.max()) if hi is None else max(hi, int(ts_us.max()))
        n += len(pdf)
    if n == 0:
        return
    if state.exists:
        s_lo, s_hi, s_n = state.get
        lo, hi, n = min(lo, s_lo), max(hi, s_hi), n + s_n
    state.update((lo, hi, n))
    # completed = no event for 30 min past the watermark
    state.setTimeoutTimestamp(hi // 1000 + 30 * 60 * 1000)


def completed_sessions(events: DataFrame) -> DataFrame:
    """Emit each user's session ONLY when it completes (no event for
    30 min of event time): the state-eviction pattern — grow state
    per key, ``setTimeoutTimestamp`` past the last event, and emit +
    ``state.remove()`` when the watermark crosses it. This is what
    keeps custom state BOUNDED at 100 TB: idle keys leave the store
    instead of accumulating forever (``session_window_agg`` is the
    built-in equivalent; this operator exists for session payloads
    the built-in can't carry, e.g. custom per-session aggregates).

    ``events`` must carry a ``ts`` timestamp column; a 30-min
    watermark bounds both late data and timeout processing.
    """
    return (
        events.withWatermark("ts", "30 minutes")
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def completed_sessions_tws(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Session windows on ``transformWithStateInPandas`` with REAL
    event-time TIMERS — the arbitrary-state-v2 twin of
    :func:`completed_sessions`, newly executable in-container via
    streaming/pbcompat (round 5).

    Where the v1 twin models idle-timeout with
    ``setTimeoutTimestamp`` (one implicit timer per key), this uses
    the v2 primitives directly: a typed ValueState for the open
    session and an explicit event-time timer re-registered on every
    batch (delete-then-register keeps exactly one live timer per
    key). When the watermark crosses the timer, ``handleExpiredTimer``
    emits the completed session and CLEARS the state — the bounded-
    state eviction pattern, now with timer bookkeeping under RocksDB.

    Same output contract as the v1 twin, so one test harness drives
    both and asserts identical results.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    gap_ms = gap_minutes * 60 * 1000
    state_schema = StructType([
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n", LongType()),
    ])

    class Sessionizer(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("session", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            lo = hi = None
            n = 0
            for pdf in rows:
                if len(pdf) == 0:
                    continue
                ts_us = (pdf["ts"].astype("int64") // 1000)
                mn, mx = int(ts_us.min()), int(ts_us.max())
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
                n += len(pdf)
            if n == 0:
                return iter(())
            if self._state.exists():
                s_lo, s_hi, s_n = self._state.get()
                # drop the previous idle timer before arming the new one
                for t in list(self._handle.listTimers()):
                    self._handle.deleteTimer(t)
                lo, hi, n = min(lo, s_lo), max(hi, s_hi), n + s_n
            self._state.update((lo, hi, n))
            self._handle.registerTimer(hi // 1000 + gap_ms)
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            if not self._state.exists():
                return iter(())
            lo, hi, n = self._state.get()
            self._state.clear()
            yield pd.DataFrame({
                "user_id": [key[0]],
                "session_start_us": [lo],
                "session_end_us": [hi],
                "n_events": [n],
            })

        def close(self) -> None:
            pass

    return (
        events.withWatermark("ts", f"{gap_minutes} minutes")
        .select("user_id", "ts")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=Sessionizer(),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )


TOPK_OUTPUT_SCHEMA = "user_id bigint, rank int, value_cents bigint"


def topk_values_tws(events: DataFrame, k: int = 3) -> DataFrame:
    """Cross-batch per-user top-k event values on
    ``transformWithStateInPandas`` with LIST state — the v2 primitive
    ValueState can't express without packing (a growing array inside
    one value row rewrites the whole blob per update; ListState
    appends are row-granular in RocksDB).

    Values are held as integer cents (exactness contract like
    :func:`running_user_totals_tws`); each batch merges the incoming
    values with the stored list and keeps only k — state stays O(k)
    per user, the bounded-state requirement at corpus scale. Emits the
    current top-k per user every batch (Update mode); the final
    emission equals the batch top-k, which is what the test asserts.
    """
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import LongType, StructField, StructType

    state_schema = StructType([StructField("cents", LongType())])

    class TopK(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._list = handle.getListState("topk", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            vals: list[int] = []
            for pdf in rows:
                vals.extend(
                    int(c) for c in
                    (pdf["value"].dropna() * 100).round().astype("int64")
                )
            if not vals:
                return iter(())
            if self._list.exists():
                vals.extend(int(t[0]) for t in self._list.get())
            top = sorted(vals, reverse=True)[:k]
            self._list.put([(v,) for v in top])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(top),
                    "rank": list(range(1, len(top) + 1)),
                    "value_cents": top,
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=TopK(),
            outputStructType=TOPK_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


_CAP_OUTPUT_SCHEMA = (
    "doc_id BIGINT, source STRING, n_tokens BIGINT, tokens_before BIGINT"
)
_CAP_STATE_SCHEMA = "tokens_used BIGINT"


def _domain_cap_update(budget_tokens: int):
    def fn(key, pdfs: Iterator, state: GroupState):
        import pandas as pd

        rows = [pdf for pdf in pdfs if len(pdf)]
        if not rows:
            return
        used = state.get[0] if state.exists else 0
        pdf = (
            pd.concat(rows)
            .sort_values(["__h__", "doc_id"])
            .reset_index(drop=True)
        )
        # exclusive running total across ALL batches so far: a domain
        # whose budget is spent admits nothing ever again (state is
        # the audit trail's tokens_before baseline)
        n = pdf["n_tokens"].astype("int64")
        before = used + n.cumsum().shift(fill_value=0)
        admit = before < budget_tokens
        out = pdf.loc[admit, ["doc_id", "source", "n_tokens"]].copy()
        out["tokens_before"] = before[admit].astype("int64")
        # tokens_used advances by EVERY seen doc's tokens? No — by
        # ADMITTED tokens only would re-open the budget after a
        # rejected doc; the batch twin's exclusive prefix sum runs
        # over all docs in hash order, so mirror it: advance by all.
        state.update((int(used + n.sum()),))
        if len(out):
            yield out

    return fn


def stream_domain_budget_cap(
    docs: DataFrame, budget_tokens: int = 1000, salt: str = "domain-cap-v1"
) -> DataFrame:
    """Streaming per-domain token-budget admission — the Structured
    Streaming twin of llm/sampling.py::domain_token_budget_cap, for
    ingest pipelines that must cap a hot domain AS DOCUMENTS ARRIVE
    rather than in a nightly batch. State per domain is ONE bigint
    (tokens seen so far); each micro-batch sorts its group's rows by
    the same salted hash the batch op uses and admits while the
    exclusive running total (state + in-batch prefix) is under budget.
    When the arrival order follows the hash order (the oracle feeds it
    that way), the admitted set is IDENTICAL to the batch op's — the
    stream ≡ batch contract under the DuckDB oracle; under arbitrary
    arrival order the semantics are the honest streaming ones: first
    arrived, first admitted, budget never exceeded. At 100 TB of
    stream: state is O(domains) bigints, no window over history, and
    the per-batch sort is bounded by the batch's group size."""
    from small_etl_spark.llm.sampling import hash_bucket
    from small_etl_spark.llm.textstats import token_count

    pre = docs.select(
        "doc_id",
        "source",
        token_count("text").cast("bigint").alias("n_tokens"),
        hash_bucket("doc_id", salt).alias("__h__"),
    )
    return pre.groupBy("source").applyInPandasWithState(
        _domain_cap_update(budget_tokens),
        outputStructType=_CAP_OUTPUT_SCHEMA,
        stateStructType=_CAP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
