"""Join / enrichment operators (SURVEY §2.5, J1–J3).

- J1 merge-with-previous — /root/reference/src/app/pipelines/sequence_pipeline.rs:77-108
  The reference does an O(n·m) nested loop per record; here it's a
  single equi-join. Catalyst picks broadcast-hash when the previous
  stage is small (it usually is — dimension-shaped); AQE converts
  sort-merge→broadcast at runtime otherwise.
- J3 lookup enrichment — /root/reference/src/core/contextual_pipeline.rs:950-961
  The reference ships a placeholder (``"enriched_" + value``); we
  implement the real broadcast-join lookup AND the stub-exact form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def merge_with_previous(
    api_df: DataFrame,
    prev_df: DataFrame,
    key: str = "id",
    broadcast_prev: bool = True,
) -> DataFrame:
    """J1: left-enrich ``api_df`` with ``prev_df`` fields by ``key``.

    Semantics pinned by the reference's tests
    (sequence_pipeline.rs:77-108):

    - every api row survives (left join);
    - for columns present in BOTH frames, the api value wins and the
      previous value only fills nulls (``coalesce(api, prev)``);
    - columns only in prev are appended;
    - if prev has duplicate keys the reference takes the *first*
      match — callers should dedup prev first (see
      ``dedup_by_fields_first_wins``); we do not hide that cost here.

    100 TB shape: prev is a stage output (small) → broadcast-hash
    join, zero shuffle on the fact side.
    """
    prev = F.broadcast(prev_df) if broadcast_prev else prev_df
    shared = [c for c in api_df.columns if c in set(prev_df.columns) and c != key]
    prev_only = [c for c in prev_df.columns if c not in set(api_df.columns) and c != key]

    # expr-text build (round 12): one parse per select instead of
    # per-column py4j chatter; trees token-identical to the Column
    # form (optimizedPlan().sameResult pinned in tests).
    a = api_df.alias("a")
    p = prev.alias("p")
    joined = a.join(p, F.expr(f"a.{key} = p.{key}"), "left")

    cols = [f"a.{key} as {key}"]
    for c in api_df.columns:
        if c == key:
            continue
        if c in shared:
            cols.append(f"coalesce(a.{c}, p.{c}) as {c}")
        else:
            cols.append(f"a.{c} as {c}")
    cols.extend(f"p.{c} as {c}" for c in prev_only)
    return joined.selectExpr(*cols)


def lookup_enrich_stub(df: DataFrame, lookup_data: dict[str, str]) -> DataFrame:
    """J3 (stub-exact): ``dst = "enriched_" + str(src)``; null src ⇒ null.

    Matches contextual_pipeline.rs:950-961 byte-for-byte on string
    inputs.
    """
    cols = {
        dst: F.when(
            F.col(src).isNotNull(), F.concat(F.lit("enriched_"), F.col(src).cast("string"))
        )
        for src, dst in lookup_data.items()
        if src in set(df.columns)
    }
    return df.withColumns(cols) if cols else df


def lookup_enrich(
    df: DataFrame,
    lookup_df: DataFrame,
    on: str,
    lookup_key: str | None = None,
    how: str = "left",
    broadcast: bool | None = None,
) -> DataFrame:
    """J3 (real): enrich via a dimension join.

    This is what the reference's placeholder was standing in for
    (and what S8 ``--lookup-files`` was declared for,
    /root/reference/src/domain/ports.rs:17).

    ``broadcast=None`` (default) lets Catalyst/AQE pick the strategy
    from runtime stats — a forced hint would OOM the executors when
    the "dimension" is actually large (a 100 TB-scale customer table);
    AQE already converts to broadcast whenever the built side fits
    ``autoBroadcastJoinThreshold``. Pass ``True`` only for dimensions
    known small by construction (region/nation-class tables).
    """
    lk = lookup_key or on
    right = F.broadcast(lookup_df) if broadcast else lookup_df
    if lk == on:
        return df.join(right, on=on, how=how)
    return df.join(right, df[on] == right[lk], how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of (backward) join: for each left row, the right row with the
    greatest ``right_ts`` ≤ ``left_ts`` within the same ``on`` key.
    Right value columns are appended with ``suffix``; unmatched left
    rows get nulls (left-join semantics).

    No Spark built-in exists (SURVEY §2.5 — the reference has no
    temporal joins either). The naive formulation — equi-join on the
    key plus a range predicate, then argmax per left row — explodes to
    O(|left|·|right|) pairs per key. This implementation is the
    scalable union-merge shape:

      1. tag and union both inputs (right rows carry a struct of their
         value columns, left rows a null struct);
      2. ONE shuffle+sort on (key, ts, side) — right sorts before left
         at equal ts so ties are inclusive;
      3. running ``last(value_struct, ignorenulls)`` window fills each
         left row with the most recent right struct;
      4. keep left rows, unpack the struct.

    Cost is a single sort-merge pass over |left|+|right| rows — the
    same plan DuckDB/kdb use natively for ASOF JOIN.
    """
    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = list(left.columns)

    # Built via selectExpr strings (round 12): the per-column
    # lit-null/cast/alias Column chain cost ~780 py4j round trips per
    # build and plan construction is timed in every bench rep; the
    # text parses to the token-identical tree in one call per select
    # (optimizedPlan().sameResult pinned in tests).
    r_tagged = right.selectExpr(
        f"{on} as __key__",
        f"{right_ts} as __ts__",
        "0 as __side__",
        f"struct({', '.join(rcols)}) as __rv__",
        *[
            f"cast(null as {left.schema[c].dataType.simpleString()})"
            f" as __l_{c}__"
            for c in lcols
        ],
    )
    l_tagged = left.selectExpr(
        f"{on} as __key__",
        f"{left_ts} as __ts__",
        "1 as __side__",
        f"cast(null as {r_tagged.schema['__rv__'].dataType.simpleString()})"
        " as __rv__",
        *[f"{c} as __l_{c}__" for c in lcols],
    )

    # the explicit ROWS frame matters: with an ORDER BY, SQL's default
    # window frame is RANGE, and the Column form pinned ROWS
    merged = (
        r_tagged.unionByName(l_tagged)
        .selectExpr(
            "*",
            "last(__rv__, true) OVER (PARTITION BY __key__"
            " ORDER BY __ts__, __side__"
            " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
            " as __match__",
        )
        .filter("__side__ = 1")
    )
    return merged.selectExpr(
        *[f"__l_{c}__ as {c}" for c in lcols],
        *[f"__match__.{c} as {c}{suffix}" for c in rcols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Interval join: pairs within the same ``on`` key where
    ``right_ts - left_ts ∈ [lower_seconds, upper_seconds]``.

    A bare inequality predicate forces a per-key cross product. This
    implementation bucketizes time into ``bucket_seconds`` cells
    (default: the interval width) and equi-joins on
    (key, bucket) — each left row only meets right rows from the 2-3
    candidate buckets its interval can touch, then the exact predicate
    filters. Shuffle is hash(key, bucket): scale-safe, skew split by
    AQE.
    """
    width = upper_seconds - lower_seconds
    if width <= 0:
        raise ValueError("upper_seconds must exceed lower_seconds")
    bucket = bucket_seconds or width

    l_epoch = F.col(left_ts).cast("double")
    r_epoch = F.col(right_ts).cast("double")

    # each left interval [ts+lower, ts+upper] can overlap these buckets
    lo_b = F.floor((l_epoch + F.lit(lower_seconds)) / F.lit(bucket)).cast("long")
    hi_b = F.floor((l_epoch + F.lit(upper_seconds)) / F.lit(bucket)).cast("long")
    l_exploded = left.withColumn(
        "__bucket__", F.explode(F.sequence(lo_b, hi_b))
    )
    r_bucketed = right.withColumn(
        "__bucket__", F.floor(r_epoch / F.lit(bucket)).cast("long")
    )

    delta = F.col(f"r.{right_ts}").cast("double") - F.col(f"l.{left_ts}").cast("double")
    return (
        l_exploded.alias("l")
        .join(
            r_bucketed.alias("r"),
            (F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (F.col("l.__bucket__") == F.col("r.__bucket__")),
        )
        .filter((delta >= lower_seconds) & (delta <= upper_seconds))
        .select(
            *[F.col(f"l.{c}") for c in left.columns],
            *[
                F.col(f"r.{c}").alias(f"{c}_r" if c in left.columns else c)
                for c in right.columns
            ],
        )
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    on: str | None = None,
    bucket_seconds: float = 3600.0,
) -> DataFrame:
    """Interval×interval overlap join (the third classic temporal join
    beside as-of and point-in-range): pairs where
    ``[l_start, l_end]`` and ``[r_start, r_end]`` intersect
    (inclusive: ``l_start ≤ r_end AND r_start ≤ l_end``), optionally
    within the same ``on`` key. Start/end columns are epoch seconds
    (numeric) or timestamps.

    A bare overlap predicate is a per-key cross product. Scale shape:
    each interval explodes to the ``bucket_seconds`` cells it covers,
    candidates equi-join on (key, bucket), duplicates from multi-bucket
    overlaps collapse via dropDuplicates on the pair identity BEFORE
    the exact predicate — shuffle is hash(key, bucket), AQE splits hot
    cells. Blowup per row is interval_length/bucket + 1, so pick a
    bucket near the typical interval length.
    """

    def _epoch(col: str) -> Column:
        return F.col(col).cast("double")

    def _buckets(s: str, e: str) -> Column:
        lo = F.floor(_epoch(s) / F.lit(bucket_seconds)).cast("long")
        hi = F.floor(_epoch(e) / F.lit(bucket_seconds)).cast("long")
        return F.sequence(lo, hi)

    l_x = left.withColumn("__bucket__", F.explode(_buckets(l_start, l_end)))
    r_x = right.withColumn("__bucket__", F.explode(_buckets(r_start, r_end)))
    cond = F.col("l.__bucket__") == F.col("r.__bucket__")
    if on is not None:
        cond = cond & (F.col(f"l.{on}") == F.col(f"r.{on}"))
    out_cols = [F.col(f"l.{c}") for c in left.columns] + [
        F.col(f"r.{c}").alias(f"{c}_r" if c in left.columns else c)
        for c in right.columns
    ]
    overlap = (
        F.col(f"l.{l_start}").cast("double") <= F.col(f"r.{r_end}").cast("double")
    ) & (
        F.col(f"r.{r_start}").cast("double") <= F.col(f"l.{l_end}").cast("double")
    )
    return (
        l_x.alias("l")
        .join(r_x.alias("r"), cond)
        .filter(overlap)
        .select(*out_cols)
        # an overlapping pair meets once per shared bucket — keep one
        .dropDuplicates()
    )


def upsert(
    target: DataFrame,
    updates: DataFrame,
    key: str | list[str],
) -> DataFrame:
    """SCD-1 merge: rows from ``updates`` replace same-key rows in
    ``target``; unmatched update rows are appended (MERGE ... WHEN
    MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT, as a batch
    transformation — no reference equivalent; north-star op).

    Plan shape: one LeftAnti join (target minus updated keys) + a
    by-name union — both sides stay columnar, and when updates are
    delta-sized (they usually are) AQE broadcasts the anti side, so
    the target never shuffles. For repeated upserts at 100 TB, write
    the output bucketed by the key so subsequent merges co-locate
    without exchange (sources/bucketing.py).

    ``updates`` must carry the same columns as ``target``; duplicate
    keys WITHIN ``updates`` are the caller's bug (dedup first —
    ``dedup_by_fields_first_wins``), not silently resolved here.
    """
    keys = [key] if isinstance(key, str) else list(key)
    missing = [c for c in target.columns if c not in set(updates.columns)]
    if missing:
        raise ValueError(f"updates missing target columns: {missing}")
    kept = target.join(updates.select(*keys), keys, "left_anti")
    return kept.unionByName(updates.select(*target.columns))


def scd2_upsert(
    current: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    compare_cols: list[str],
    effective: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """SCD type-2 merge: where an update row differs from the open
    version on any of ``compare_cols``, the open row is closed
    (``valid_to = effective``, flag cleared) and a new open version is
    appended (``valid_from = effective``); unchanged keys and all
    historical rows pass through untouched (MERGE with history, as a
    batch transformation — north-star op; complements the SCD-1
    :func:`upsert`).

    ``current`` carries business columns + the three SCD columns
    (dates as 'YYYY-MM-DD' strings, open rows have NULL ``valid_to``);
    ``updates`` carries business columns only. Duplicate keys within
    ``updates`` are the caller's bug (dedup first).

    Plan shape: the changed-key set is one inner join (delta-sized,
    AQE broadcasts it) filtered on the compare columns; the four
    legs — untouched keys (LeftAnti), prior history (LeftSemi),
    closed rows, new versions — are unions over that broadcast
    probe, so the big ``current`` side never shuffles. For repeated
    merges at 100 TB, store bucketed by the key.
    """
    keys = [key] if isinstance(key, str) else list(key)
    scd_cols = {valid_from, valid_to, current_flag}
    business = [c for c in current.columns if c not in scd_cols]
    missing = [c for c in business if c not in set(updates.columns)]
    if missing:
        raise ValueError(f"updates missing business columns: {missing}")

    open_rows = current.filter(F.col(current_flag))
    upd = updates.select(*business)
    upd_cmp = upd.select(
        *[F.col(k).alias(f"__u_{k}") for k in keys],
        *[F.col(c).alias(f"__u_{c}") for c in compare_cols],
    )
    join_cond = None
    for k in keys:
        c = F.col(k) == F.col(f"__u_{k}")
        join_cond = c if join_cond is None else (join_cond & c)
    differs = None
    for c in compare_cols:
        d = ~F.col(c).eqNullSafe(F.col(f"__u_{c}"))
        differs = d if differs is None else (differs | d)
    changed_keys = (
        open_rows.join(upd_cmp, join_cond).filter(differs).select(*keys)
    )

    untouched = current.join(changed_keys, keys, "left_anti")
    history = current.filter(~F.col(current_flag)).join(
        changed_keys, keys, "left_semi"
    )
    closed = (
        open_rows.join(changed_keys, keys, "left_semi")
        .withColumn(valid_to, F.lit(effective))
        .withColumn(current_flag, F.lit(False))
    )
    new_rows = (
        upd.join(changed_keys, keys, "left_semi")
        .withColumn(valid_from, F.lit(effective))
        .withColumn(valid_to, F.lit(None).cast("string"))
        .withColumn(current_flag, F.lit(True))
        .select(*current.columns)
    )
    return (
        untouched.unionByName(history).unionByName(closed).unionByName(new_rows)
    )


def point_in_time_join(
    facts: DataFrame,
    versions: DataFrame,
    key: str,
    ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (backfill-safe) feature join: attach to each fact
    row the dimension VERSION that was valid at the fact's own
    timestamp — the feature-store primitive that prevents label
    leakage when training on historical facts against an SCD-2
    dimension (:func:`scd2_upsert` produces the right shape).

    Semantics: match where ``valid_from <= ts`` and (``valid_to`` is
    NULL or ``ts < valid_to``); if validity intervals overlap (a
    malformed history), the LATEST ``valid_from`` wins
    deterministically.

    Plan shape — and why it scales: this is an equi-join on ``key``
    plus a residual interval predicate, NOT a range join. The
    blow-up through the shuffle is bounded by versions-per-key
    (small by SCD construction), after which the residual filter
    cuts to ≤1 row per fact. No crossJoin, no window over the fact
    table unless overlap-resolution triggers; both sides
    hash-partition on the key like any fact⋈dim join, so AQE's
    skew handling applies unchanged at 100 TB.
    """
    vcols = [c for c in versions.columns if c != key]
    v = versions.select(
        F.col(key).alias("__v_key__"),
        *[F.col(c).alias(c) for c in vcols],
    )
    # Overlap resolution must key on ROW IDENTITY, not row VALUES:
    # partitioning the window on all fact columns would collapse two
    # genuinely identical fact rows (fact feeds without a unique id —
    # repeated measurements, at-least-once ingestion) into one output
    # row. A monotonically_increasing_id minted BEFORE the join gives
    # every physical fact row its own window partition; it adds no
    # shuffle (pure map-side expression) and never escapes.
    tagged = facts.withColumn("__pit_fid__", F.monotonically_increasing_id())
    cond = (tagged[key] == v["__v_key__"]) & (
        F.col(valid_from) <= tagged[ts]
    ) & (F.col(valid_to).isNull() | (tagged[ts] < F.col(valid_to)))
    j = tagged.join(v, cond, how).drop("__v_key__")
    # Well-formed SCD2 gives exactly one match; resolve overlaps by
    # latest valid_from, per physical fact row (≤ versions-per-key
    # rows in each window partition — cheap at any scale).
    w = Window.partitionBy("__pit_fid__").orderBy(
        F.col(valid_from).desc_nulls_last()
    )
    return (
        j.withColumn("__pit_rn__", F.row_number().over(w))
        .filter(F.col("__pit_rn__") == 1)
        .drop("__pit_rn__", "__pit_fid__")
    )


def apply_cdc(
    log: DataFrame,
    key: str | list[str],
    order_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply a CDC log (I/U/D change events) down to final table
    state: per key, the latest op wins (``order_cols`` — include a
    unique sequence tiebreak); a latest 'D' removes the key. Returns
    the surviving latest row images without the op/order columns
    (north-star op — the change-log replay half of upsert/SCD;
    ``/root/reference`` re-extracts from source every run instead).

    Plan shape: ``max_by(whole-row, order)`` aggregation — the same
    combiner-style partial-agg as dedup_by_fields_first_wins
    (operators/dedup.py), so the shuffle carries one candidate per
    key per partition, never a window sort of the full log. The D
    filter happens after reduction, where 'latest' is already known.
    """
    keys = [key] if isinstance(key, str) else list(key)
    data_cols = [c for c in log.columns if c != op_col and c not in order_cols]
    latest = (
        log.groupBy(*keys)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in data_cols], F.col(op_col)),
                F.struct(*[F.col(c) for c in order_cols]),
            ).alias("__row__")
        )
        .select(
            *[F.col(f"__row__.{c}").alias(c) for c in data_cols],
            F.col(f"__row__.{op_col}").alias(op_col),
        )
    )
    return latest.filter(F.col(op_col) != "D").drop(op_col)


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Diff two snapshots of the same table: one row per key that
    changed, with ``change`` ∈ {'added', 'removed', 'changed'} and
    both value images (old_/new_ prefixed). Unchanged keys are
    dropped. The reconciliation/audit op between pipeline runs
    (north-star — the reference can only overwrite outputs).

    Plan shape: ONE full-outer join on the key, change classification
    from null-sides and null-safe column comparison (eqNullSafe — a
    NULL→value transition counts as a change). Both sides shuffle on
    the key once; at 100 TB store snapshots bucketed by key and the
    exchange disappears.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cmp_cols = compare_cols or [c for c in old.columns if c not in keys]
    missing = [c for c in cmp_cols + keys if c not in set(new.columns)]
    if missing:
        raise ValueError(f"new snapshot missing columns: {missing}")

    o = old.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in cmp_cols],
        F.lit(True).alias("__in_old__"),
    )
    n = new.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in cmp_cols],
        F.lit(True).alias("__in_new__"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}").eqNullSafe(F.col(f"__nk_{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(n, cond, "full_outer")

    same = None
    for c in cmp_cols:
        eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
        same = eq if same is None else (same & eq)
    change = (
        F.when(F.col("__in_old__").isNull(), F.lit("added"))
        .when(F.col("__in_new__").isNull(), F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    key_out = [
        F.coalesce(F.col(f"__ok_{k}"), F.col(f"__nk_{k}")).alias(k) for k in keys
    ]
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *key_out,
            "change",
            *[F.col(f"old_{c}") for c in cmp_cols],
            *[F.col(f"new_{c}") for c in cmp_cols],
        )
    )


def asof_join_cogroup(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join via ``groupBy(key).cogroup(...).applyInPandas`` —
    the per-key-imperative twin of :func:`asof_join`, kept in-tree
    for two reasons: (a) it exercises Spark's cogroup primitive (both
    sides shuffle once on the key, then each key's two pandas frames
    meet in one Python call — the right shape when per-key logic is
    genuinely imperative), and (b) the equality test between the two
    implementations (tests/test_temporal_join_properties.py) is a
    strong mutual correctness check: a union-merge window bug and a
    pandas ``merge_asof`` bug would have to agree to go unnoticed.

    Prefer :func:`asof_join` in production pipelines — it stays
    whole-stage-codegen JVM-side; this variant pays the Arrow hop and
    a per-key pandas sort, and a hot key's whole history must fit in
    one pandas frame (the usual cogroup caveat at 100 TB).
    """
    import pandas as pd

    rcols = right_cols if right_cols is not None else [
        c for c in right.columns if c not in (on, right_ts)
    ]
    lcols = list(left.columns)
    l_slim = left
    # the right timestamp gets a side-unique name: cogroup's combined
    # plan drops a right column whose name collides with a left one
    # (observed on this Spark version), and ts/ts is the common case
    rts = "__cg_rts__"
    r_slim = right.select(on, F.col(right_ts).alias(rts), *rcols)

    out_fields = []
    for c in lcols:
        out_fields.append(f"`{c}` {left.schema[c].dataType.simpleString()}")
    for c in rcols:
        out_fields.append(
            f"`{c}{suffix}` {right.schema[c].dataType.simpleString()}"
        )
    schema = ", ".join(out_fields)

    def merge(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if len(lpdf) == 0:
            return pd.DataFrame(columns=lcols + [f"{c}{suffix}" for c in rcols])
        lsorted = lpdf.sort_values(left_ts, kind="mergesort")
        if len(rpdf) == 0:
            out = lsorted.copy()
            for c in rcols:
                out[f"{c}{suffix}"] = None
            return out
        rsorted = (
            rpdf.sort_values(rts, kind="mergesort")
            .rename(columns={c: f"{c}{suffix}" for c in rcols})
            .drop(columns=[on])
        )
        merged = pd.merge_asof(
            lsorted,
            rsorted,
            left_on=left_ts,
            right_on=rts,
            direction="backward",
            suffixes=("", "__r"),
        )
        return merged[lcols + [f"{c}{suffix}" for c in rcols]]

    return (
        l_slim.groupBy(on)
        .cogroup(r_slim.groupBy(on))
        .applyInPandas(merge, schema=schema)
    )
