"""Sinks (SURVEY §2.2 K1–K8): CSV/TSV/JSON/parquet writers, ZIP
packaging, filename templating, metadata + metrics."""

from small_etl_spark.sinks.files import (  # noqa: F401
    render_filename,
    write_metrics,
    write_outputs,
    zip_output_dir,
)
