"""Fluent table handle over the versioned sink — the DeltaTable-shape
API (public Delta Lake ``DeltaTable`` / Iceberg ``Table`` surface,
re-expressed over this engine's manifest protocol). One object binds
(spark, path) so pipelines read as chains::

    t = Table(spark, "/data/docs")
    t.write(df)                      # overwrite (or append(df))
    t.add_constraint("chars", "n_chars >= 0")
    t.update({"lang": "'und'"}, where="lang IS NULL")
    t.merge(src, on="doc_id",
            matched=[{"action": "update", "set": "all"}],
            not_matched=[{"action": "insert"}])
    t.restore(t.version - 2)
    t.optimize().vacuum(keep_last=3)
    t.read(version=0)                # time travel

Every mutating method returns ``self`` (chainable) and records the
new version in ``.version``; readers return DataFrames. The functions
in :mod:`small_etl_spark.sinks.versioned` remain the primitive API —
this is sugar, adding no new commit semantics.

Reference parity note: the reference has no table abstraction at all
(ZIP outputs, contextual_pipeline.rs:1164-1229); this wraps the
engine-side extension surface."""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: F401

from small_etl_spark.sinks import versioned as V


class Table:
    """Fluent handle for one versioned table."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    # -- introspection ---------------------------------------------------
    @property
    def version(self) -> int | None:
        return V.latest_version(self.path)

    @property
    def exists(self) -> bool:
        return self.version is not None

    def history(self) -> DataFrame:
        return V.snapshot_history(self.spark, self.path)

    def files(self, version: int | None = None) -> DataFrame:
        return V.table_files(self.spark, self.path, version=version)

    def partitions(self, version: int | None = None) -> DataFrame:
        return V.table_partitions(self.spark, self.path, version=version)

    def constraints(self) -> dict[str, str]:
        return V.list_constraints(self.path)

    def report(self, **kw: Any) -> dict[str, Any]:
        return V.maintenance_report(self.path, **kw)

    # -- read ------------------------------------------------------------
    def read(
        self,
        version: int | None = None,
        where: list[V.Predicate] | None = None,
        with_lineage: bool = False,
    ) -> DataFrame:
        return V.read_snapshot(
            self.spark, self.path, version=version, where=where,
            with_lineage=with_lineage,
        )

    def changes(self, from_version: int, to_version: int) -> DataFrame:
        return V.table_changes(
            self.spark, self.path, from_version, to_version
        )

    def agg(
        self,
        aggs: dict[str, tuple[str, str]],
        version: int | None = None,
        fallback: bool = True,
    ) -> DataFrame:
        return V.manifest_agg(
            self.spark, self.path, aggs, version=version, fallback=fallback
        )

    # -- write -----------------------------------------------------------
    def write(self, df: DataFrame, **kw: Any) -> "Table":
        V.commit_snapshot(df, self.path, mode="overwrite", **kw)
        return self

    def append(self, df: DataFrame, **kw: Any) -> "Table":
        V.commit_snapshot(df, self.path, mode="append", **kw)
        return self

    def update(
        self,
        set: dict[str, Any],  # noqa: A002 - SQL keyword
        where: Any = None,
        prune: list[V.Predicate] | None = None,
    ) -> "Table":
        V.update_where(self.spark, self.path, set, where, prune=prune)
        return self

    def delete(
        self, where: Any, prune: list[V.Predicate] | None = None
    ) -> "Table":
        V.delete_where(self.spark, self.path, where, prune=prune)
        return self

    def delete_mor(self, where: Any) -> "Table":
        V.delete_where_mor(self.spark, self.path, where)
        return self

    def upsert(self, source: DataFrame, key: str, **kw: Any) -> "Table":
        V.merge_upsert(self.spark, self.path, source, key=key, **kw)
        return self

    def merge(self, source: DataFrame, on: Any, **clauses: Any) -> "Table":
        V.merge(self.spark, self.path, source, on, **clauses)
        return self

    # -- history ops -----------------------------------------------------
    def restore(self, version: int, **kw: Any) -> "Table":
        V.restore_snapshot(self.path, version, **kw)
        return self

    def tag(self, name: str, version: int | None = None) -> "Table":
        V.create_tag(self.path, name, version=version)
        return self

    def branch(self, name: str, version: int | None = None) -> str:
        return V.branch_create(self.path, name, version=version)

    def publish(self, name: str, **kw: Any) -> "Table":
        V.branch_publish(self.path, name, **kw)
        return self

    # -- evolution -------------------------------------------------------
    def rename_column(self, old: str, new: str) -> "Table":
        V.rename_column(self.path, old, new)
        return self

    def drop_column(self, name: str) -> "Table":
        V.drop_column(self.path, name)
        return self

    def widen_type(self, name: str, new_type: str) -> "Table":
        V.widen_type(self.path, name, new_type)
        return self

    def add_column(
        self, name: str, dtype: str, default: Any = None
    ) -> "Table":
        V.add_column(self.path, name, dtype, default=default)
        return self

    def set_partition_spec(self, spec: list[str] | None) -> "Table":
        V.set_partition_spec(self.path, spec)
        return self

    def set_sort_order(self, columns: list[str] | None) -> "Table":
        V.set_sort_order(self.path, columns)
        return self

    def add_constraint(self, name: str, expr: str) -> "Table":
        V.add_constraint(self.spark, self.path, name, expr)
        return self

    def drop_constraint(self, name: str) -> "Table":
        V.drop_constraint(self.path, name)
        return self

    # -- maintenance -----------------------------------------------------
    def optimize(self, **kw: Any) -> "Table":
        V.optimize_snapshot(self.spark, self.path, **kw)
        return self

    def cluster(self, zorder: list, **kw: Any) -> "Table":
        V.cluster_snapshot(self.spark, self.path, zorder=zorder, **kw)
        return self

    def compact_dv(self) -> "Table":
        V.compact_dv(self.spark, self.path)
        return self

    def compact_eq_deletes(self) -> "Table":
        V.compact_eq_deletes(self.spark, self.path)
        return self

    def auto_maintain(self, **kw: Any) -> dict[str, Any]:
        return V.auto_maintain(self.spark, self.path, **kw)

    def vacuum(self, keep_last: int = 1, min_age_ms: int = 0) -> "Table":
        V.vacuum(self.path, keep_last=keep_last, min_age_ms=min_age_ms)
        return self

    def expire_snapshots(
        self, older_than_ms: int, keep_last: int = 1,
        min_age_ms: int = 0,
    ) -> "Table":
        V.expire_snapshots(
            self.path, older_than_ms, keep_last=keep_last,
            min_age_ms=min_age_ms,
        )
        return self

    def remove_orphans(
        self, older_than_ms: int = 24 * 3600 * 1000, dry_run: bool = False
    ) -> list[str]:
        return V.remove_orphan_files(
            self.path, older_than_ms=older_than_ms, dry_run=dry_run
        )

    def clone_to(self, dst: str, version: int | None = None) -> "Table":
        """Zero-copy shallow clone; returns a handle on the clone."""
        V.clone_table(self.path, dst, version=version)
        return Table(self.spark, dst)

    @staticmethod
    def from_parquet(
        spark: SparkSession, src_dir: str, table: str
    ) -> "Table":
        """In-place import of a plain parquet directory (add_files)."""
        V.add_parquet_files(spark, src_dir, table)
        return Table(spark, table)

    def drop(self) -> None:
        V.drop_table(self.path)
