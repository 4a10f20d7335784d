"""Incremental aggregate maintenance: partial-aggregate states that
merge associatively, so a materialized aggregate is updated from a
delta without rescanning the base.

North-star operator (no reference equivalent — the reference
recomputes every pipeline run end-to-end). This is the 100 TB
operational pattern: keep ``(key, cnt, sum)`` partials materialized
(bucketed by key), fold each day's delta in with one delta-sized
shuffle, and derive final averages/totals at read time. Works for
any algebraic aggregate (sum/count/min/max, and mergeable sketches
like HLL); explicitly NOT for holistic aggregates (exact median)
— those need the raw data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def partial_counts_sums(
    df: DataFrame,
    key: str | list[str],
    val_cents: str,
) -> DataFrame:
    """Partial-aggregate state ``(keys..., cnt, sum_cents)`` for one
    slice of the data. ``val_cents`` is a 2-decimal money column,
    accumulated as exact integer cents so partials merge without
    float drift."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.round(F.col(val_cents) * 100).cast("bigint")).alias("sum_cents"),
    )


def merge_partials(*parts: DataFrame) -> DataFrame:
    """Merge partial states: union + re-aggregate (sum of counts, sum
    of sums). Associative and commutative, so any merge tree gives
    the same result — merge yesterday's materialized state with
    today's delta, or a year of daily partials in one go. The shuffle
    is keyed like the partials themselves; if the stored state is
    bucketed by key, AQE sees co-located sides and skips the
    exchange."""
    if not parts:
        raise ValueError("need at least one partial state")
    keys = [c for c in parts[0].columns if c not in ("cnt", "sum_cents")]
    u = reduce(DataFrame.unionByName, parts)
    return u.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_cents").alias("sum_cents"),
    )


def partial_distinct_sketches(
    df: DataFrame,
    key: str | list[str],
    count_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Partial-aggregate state for DISTINCT counts: a Datasketches
    HLL sketch per key (``(keys..., hll)``). Unlike exact
    COUNT(DISTINCT) — which cannot be maintained incrementally
    without keeping every value — sketches union losslessly, so the
    materialized state is ~KB per key at ANY cardinality."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(count_col), F.lit(lg_k)).alias("hll")
    )


def merge_distinct_sketches(*parts: DataFrame) -> DataFrame:
    """Merge per-slice HLL states and estimate:
    ``(keys..., approx_distinct)``. Union is associative/commutative
    like the counts-and-sums merge; fold deltas in forever without
    rescanning the base. ±~2% at lg_k=12 — the consumers of
    incremental distinct counts (cardinality dashboards, join-size
    estimation) tolerate that by construction."""
    if not parts:
        raise ValueError("need at least one partial state")
    keys = [c for c in parts[0].columns if c != "hll"]
    u = reduce(DataFrame.unionByName, parts)
    return u.groupBy(*keys).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("approx_distinct")
    )


def ivm_join_delta(
    base_left: DataFrame,
    delta_left: DataFrame,
    base_right: DataFrame,
    delta_right: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """Incremental view maintenance for an inner equi-join — the delta
    rule ``Δ(A ⋈ B) = (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)`` for
    insert-only deltas. Returns exactly the NEW join rows, so a
    materialized join view is maintained by appending this output
    instead of re-joining the full inputs.

    Why it matters at 100 TB: the three delta legs join a
    delta-sized side against a base (AQE broadcasts the delta) — the
    nightly increment costs O(|Δ|·match-rate), not O(|A|+|B|).
    Insert-only is the honest contract here; deletes/updates need
    retraction counting (the standard Δ-multiset extension), which
    ``apply_cdc`` + ``snapshot_diff`` cover at row granularity.
    """
    keys = [on] if isinstance(on, str) else list(on)
    return (
        delta_left.join(base_right, keys)
        .unionByName(base_left.join(delta_right, keys))
        .unionByName(delta_left.join(delta_right, keys))
    )


def counts_sums_state(
    df: DataFrame, key: str | list[str], val: str
) -> DataFrame:
    """Generic partial state ``(keys..., cnt, sum_val)`` over an exact
    integer value column (the signed-maintenance twin of
    :func:`partial_counts_sums`, which is money-in-cents specific)."""
    keys = [key] if isinstance(key, str) else list(key)
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col(val).cast("bigint")).alias("sum_val"),
    )


def cdc_delta_state(
    changes: DataFrame, key: str | list[str], val: str
) -> DataFrame:
    """Signed partial state from a CDC delta
    (``sinks.versioned.table_changes`` output): inserts count +1/+val,
    deletes −1/−val, so an update (delete+insert of the same key)
    contributes exactly the value difference. Folding this into a
    materialized state via :func:`fold_state` maintains the aggregate
    under ARBITRARY changes — the retraction-counting extension the
    insert-only :func:`ivm_join_delta` contract points at."""
    keys = [key] if isinstance(key, str) else list(key)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    return changes.groupBy(*keys).agg(
        F.sum(sign).cast("bigint").alias("cnt"),
        F.sum(sign * F.col(val).cast("bigint")).alias("sum_val"),
    )


def fold_state(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a (possibly signed) delta state into a materialized state:
    union + re-sum, dropping keys whose count reaches zero (fully
    retracted groups vanish, exactly as a recompute would show). One
    delta-sized shuffle — the base is never rescanned."""
    keys = [c for c in state.columns if c not in ("cnt", "sum_val")]
    u = state.unionByName(delta)
    return (
        u.groupBy(*keys)
        .agg(F.sum("cnt").alias("cnt"), F.sum("sum_val").alias("sum_val"))
        .filter(F.col("cnt") > 0)
    )
