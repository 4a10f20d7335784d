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

from pyspark.sql import DataFrame, functions as F


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

    a = api_df.alias("a")
    p = prev.alias("p")
    joined = a.join(p, F.col(f"a.{key}") == F.col(f"p.{key}"), "left")

    cols = [F.col(f"a.{key}").alias(key)]
    for c in api_df.columns:
        if c == key:
            continue
        if c in shared:
            cols.append(F.coalesce(F.col(f"a.{c}"), F.col(f"p.{c}")).alias(c))
        else:
            cols.append(F.col(f"a.{c}").alias(c))
    cols.extend(F.col(f"p.{c}").alias(c) for c in prev_only)
    return joined.select(*cols)


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
) -> DataFrame:
    """J3 (real): enrich via a broadcast dimension join.

    This is what the reference's placeholder was standing in for
    (and what S8 ``--lookup-files`` was declared for,
    /root/reference/src/domain/ports.rs:17). Dimension side is
    broadcast — no shuffle of the fact table.
    """
    lk = lookup_key or on
    right = F.broadcast(lookup_df)
    if lk == on:
        return df.join(right, on=on, how=how)
    return df.join(right, df[on] == right[lk], how=how)
