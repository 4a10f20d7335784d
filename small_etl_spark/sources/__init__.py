"""Sources: file scans (parquet/csv/json), HTTP scans, lookup tables."""

from small_etl_spark.sources.tables import TABLES, load_table, load_tables  # noqa: F401
