"""Generic file-format sources: read back every format the sinks
write (CSV / TSV / JSON-lines / parquet / ORC), schema-enforced.

Supersedes the reference's file handling, which only WRITES formats
(``/root/reference`` sink config; its sources are HTTP + lookup
files): a complete engine must re-ingest its own outputs.

Scale notes baked in:
- Always pass an explicit ``schema`` for text formats in production:
  schema inference is an extra full scan (CSV) or sample pass (JSON)
  BEFORE the real job — at 100 TB that is the difference between one
  pass and two. Inference is allowed here (tests, exploration) but
  the default is schema-first.
- CSV/JSON are row formats: no column pruning, no predicate
  pushdown, no stats — fine as an ingestion edge, wrong as a working
  set. The pattern at scale is read-text → write-parquet once, query
  parquet after (``to_parquet``).
- ``PERMISSIVE`` mode + ``columnNameOfCorruptRecord`` keeps bad rows
  visible instead of silently dropped; strictness is a caller choice
  (``mode="FAILFAST"``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# reader defaults mirror the SINK's writer options exactly (Spark
# default quote/escape for csv; tab separator for tsv) so a
# write_outputs → read_file round trip is lossless byte-for-byte
_TEXT_DEFAULTS = {
    "csv": {"header": "true", "sep": ","},
    "tsv": {"header": "true", "sep": "\t"},
    "json": {},
}


def read_file(
    spark: SparkSession,
    path: str,
    fmt: str,
    schema: StructType | str | None = None,
    mode: str = "PERMISSIVE",
    **options: str,
) -> DataFrame:
    """Read ``path`` in ``fmt`` ∈ {csv, tsv, json, parquet, orc}.

    ``tsv`` is csv with a tab separator and NO quoting — matching the
    TSV sink's sanitize-don't-quote convention (sinks/files.py). For
    csv/tsv/json, ``schema`` should be provided (see module notes);
    ``mode`` follows Spark's malformed-record policy.
    """
    fmt = fmt.lower()
    if fmt in _TEXT_DEFAULTS:
        opts = dict(_TEXT_DEFAULTS[fmt])
        opts.update(options)
        reader = spark.read.options(**opts).option("mode", mode)
        if schema is not None:
            reader = reader.schema(schema)
        if fmt == "json":
            return reader.json(path)
        return reader.csv(path)
    if fmt in ("parquet", "orc"):
        reader = spark.read.options(**options)
        if schema is not None:
            reader = reader.schema(schema)
        return getattr(reader, fmt)(path)
    raise ValueError(f"unsupported format: {fmt!r}")


def to_parquet(
    df: DataFrame, path: str, partition_by: list[str] | None = None
) -> None:
    """One-shot conversion of a row-format ingest to the columnar
    working set (the read-once-query-many pattern): optionally
    partitioned for partition pruning downstream."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
