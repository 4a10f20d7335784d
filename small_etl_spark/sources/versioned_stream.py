"""Streaming CDC source over a versioned table: tail the commit log.

``spark.readStream.format("versioned_cdc")`` turns a
``sinks.versioned`` table into a Structured Streaming source whose
OFFSETS ARE SNAPSHOT VERSIONS — the same design that makes a Delta
table streamable (public: the Delta Lake VLDB'20 paper's streaming
section). Because manifests are immutable and data files are
append-only per commit, any offset range replays deterministically:
``readBetweenOffsets`` re-reads exactly the files those commits added,
so failure recovery is exactly-once into an idempotent sink.

    spark.dataSource.register(VersionedCdcDataSource)
    df = (spark.readStream.format("versioned_cdc")
          .option("path", "/data/events_tbl")
          .option("starting_version", "0")       # default: full history
          .option("starting_timestamp",          # OR: resolve by commit
                  "1700000000000")               # time (ms, version_as_of)
          .load())                               # schema from the manifest

Semantics (mirrors Delta's streaming contract):

- Append commits (``append`` / ``overwrite``-as-v0 / streaming batch)
  stream their ADDED files' rows, tagged ``_commit_version``.
- Non-append commits (merge / delete / optimize / later overwrite)
  RAISE by default — silently streaming a rewrite would emit rewritten
  rows as fresh inserts. ``skip_change_commits=true`` skips them
  (Delta's ``skipChangeCommits``); consumers that need the row-level
  delta of such commits read ``sinks.versioned.table_changes`` in
  batch.

This reader implements the Spark 4 SimpleDataSourceStreamReader
protocol (driver-side reads, right for commit-log tailing where each
micro-batch is delta-sized). A partition-per-file
``DataSourceStreamReader`` is the drop-in upgrade if a single commit
can exceed driver memory."""

from __future__ import annotations

import os
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource
from pyspark.sql.types import StructType

from small_etl_spark.sinks import versioned as V


class VersionedCdcDataSource(DataSource):
    """``format("versioned_cdc")`` — stream a versioned table's commits."""

    @classmethod
    def name(cls) -> str:
        return "versioned_cdc"

    def _table(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError("versioned_cdc requires option 'path'")
        return path

    def schema(self) -> StructType:
        # planning-time LOCAL header read (no fold, no data scan —
        # O(1) in table file count)
        table = self._table()
        v = V.latest_version(table)
        if v is None:
            raise ValueError(f"no snapshots committed at {table!r}")
        base = StructType.fromJson(V._read_record(table, v)["schema"])
        return base.add("_commit_version", "long", False)

    def simpleStreamReader(self, schema: StructType):
        return VersionedCdcStreamReader(schema, self._table(), self.options)


class VersionedCdcStreamReader:
    """Offsets are ``{"version": N}`` = next snapshot version to emit."""

    def __init__(self, schema: StructType, table: str, options: dict):
        self.table = table
        # last field is the injected _commit_version
        self.data_fields = [f.name for f in schema.fields[:-1]]
        self.defaults = {
            f.name: (f.metadata or {}).get("default")
            for f in schema.fields[:-1]
        }
        ts = options.get("starting_timestamp")
        if ts is not None and "starting_version" in options:
            raise ValueError(
                "versioned_cdc: pass starting_version OR "
                "starting_timestamp, not both"
            )
        if ts is not None:
            # Delta's startingTimestamp contract: begin at the first
            # commit at-or-after the instant (version_as_of finds the
            # one at-or-before; +1 unless it IS at/after the instant)
            v = V.version_as_of(table, int(ts))
            at = int(
                V._read_record(table, v).get("committed_at_ms", 0)
            )
            self.start_version = v if at >= int(ts) else v + 1
        else:
            self.start_version = int(options.get("starting_version", "0"))
        self.skip_change_commits = (
            str(options.get("skip_change_commits", "false")).lower() == "true"
        )
        # column ids pinned at planning time: historical files resolve
        # each consumed field by ID (a file written before a rename
        # carries the old physical name)
        v = V.latest_version(table)
        head = V._read_record(table, v) if v is not None else {}
        self.field_ids = head.get("column_ids") or {}

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def _added_entries(self, version: int) -> list[dict]:
        m = V._read_record(self.table, version)
        parent = m.get("parent")
        prec = (
            V._read_record(self.table, parent)
            if parent is not None and version > 0
            else None
        )
        if "add" in m:
            # paged-log DELTA record: the added/removed file sets are
            # the record itself — O(changed files) per streamed commit,
            # never a fold of the full table list (the same reason the
            # commit side went delta: a micro-batch tail must not pay
            # O(table) metadata per batch)
            removed: "set[str] | list[str]" = m.get("remove", [])
            added = sorted(m["add"], key=lambda e: e["path"])
        else:
            # base record (v0, overwrite, legacy full manifest): diff
            # against the parent's materialized list
            by_path = {e["path"]: e for e in m["files"]}
            cur = set(by_path)
            if prec is None:
                prev: set[str] = set()
            else:
                prev = {
                    e["path"]
                    for e in V.read_manifest(self.table, parent)["files"]
                }
            removed = prev - cur
            added = [by_path[p] for p in sorted(cur - prev)]
        # Merge-on-read commits delete rows WITHOUT touching the file
        # list: a delete_mor grows the position DV, a stream-upsert
        # batch grows the equality-delete list (retiring the keys it
        # re-inserts). Both are CHANGE commits — streaming only their
        # added files would silently keep every retired row live
        # downstream — so they follow the same raise-or-skip policy as
        # file rewrites. Header-only parent read: O(1) per commit.
        mor_change = prec is not None and (
            m.get("dv") != prec.get("dv")
            or (m.get("eq_deletes") or []) != (prec.get("eq_deletes") or [])
        )
        # Non-additive schema evolution (rename/drop/widen) mid-stream
        # is a breaking event too — the consumer's schema was pinned at
        # planning time (Delta's streaming contract: fail, restart to
        # pick up the new schema; additive column adds are safe).
        def _additive(old: dict | None, new: dict) -> bool:
            if old is None:
                return True
            of = {f["name"]: f["type"] for f in old.get("fields", [])}
            nf = {f["name"]: f["type"] for f in new.get("fields", [])}
            return all(n in nf and nf[n] == t for n, t in of.items())

        schema_break = (
            prec is not None
            and m.get("schema") is not None
            and not _additive(prec.get("schema"), m["schema"])
        )
        if (
            removed or mor_change or schema_break
        ) and not self.skip_change_commits:
            what = (
                "rewrites or removes files"
                if removed
                else "changes the schema non-additively (restart the "
                "stream to adopt it)"
                if schema_break
                else "deletes rows merge-on-read (position DV or "
                "equality-delete change)"
            )
            raise ValueError(
                f"versioned_cdc: commit v{version} ({m['mode']}) {what}; "
                "set skip_change_commits=true to skip such commits, or "
                "consume them in batch via table_changes"
            )
        if removed or mor_change or schema_break:
            return []  # change commit skipped entirely
        return added

    def _rows_of(self, version: int) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        from pyspark.sql.types import StructType

        schema = StructType.fromJson(
            V._read_record(self.table, version)["schema"]  # header-only
        )
        for entry in self._added_entries(version):
            rel = entry["path"]
            # consumed fields resolve to this FILE's physical names by
            # column id (a file written before a rename carries the
            # old name; one the column predates yields null)
            phys = [
                V._phys_name(entry, c, self.field_ids)
                for c in self.data_fields
            ]
            # hive-partitioned commits carry partition values in the
            # PATH, not the file data — overlay them (typed) per file
            pvals = V._parse_partition_values(rel, schema)
            tbl = pq.read_table(
                os.path.join(self.table, rel), columns=None
            ).to_pylist()
            for rec in tbl:
                yield tuple(
                    [
                        self.defaults.get(c)
                        if p is None
                        else (pvals[p] if p in pvals else rec.get(p))
                        for c, p in zip(self.data_fields, phys)
                    ]
                    + [version]
                )

    def read(self, start: dict):
        head = V.latest_version(self.table)
        frm = int(start["version"])
        if head is None or frm > head:
            return iter([]), dict(start)
        rows: list[tuple] = []
        for v in range(frm, head + 1):
            rows.extend(self._rows_of(v))
        return iter(rows), {"version": head + 1}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # deterministic replay: manifests and data files are immutable
        for v in range(int(start["version"]), int(end["version"])):
            yield from self._rows_of(v)

    def commit(self, end: dict) -> None:
        pass  # no source-side bookkeeping; the checkpoint owns offsets
