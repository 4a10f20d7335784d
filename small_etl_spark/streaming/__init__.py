"""Structured Streaming operators over the ``events`` stream table.

The reference is strictly batch (SURVEY §2.10 — no watermarks,
windows, or stateful ops anywhere in /root/reference/src/); these are
the BASELINE.json north-star extensions, built so every streaming
aggregation has a batch twin in ``small_etl_spark.queries`` with
identical semantics (the twin is what the DuckDB oracle checks).
"""

from small_etl_spark.streaming.windows import (  # noqa: F401
    read_events_stream,
    session_window_agg,
    sliding_window_agg,
    stream_dedup,
    tumbling_window_agg,
)
