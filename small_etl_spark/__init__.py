"""small_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference ETL
tool ``kenstt/small-etl`` (config-driven extract → transform → load
with multi-pipeline sequencing), built Spark-first: every operator is
declared through the DataFrame/SQL API so Catalyst + Tungsten own the
physical plan, plus large-scale training-data-pipeline extensions
(dedup at scale, similarity search, text analysis, streaming).

Layout
------
- ``session``    : tuned SparkSession builder
- ``sources``    : parquet/csv/json readers, HTTP scan + per-record enrichment
- ``sinks``      : csv/tsv/json writers, ZIP packaging, filename templating
- ``operators``  : projections, filters, dedup, sort, sets, joins, validation
- ``functions``  : scalar/text functions (clean_text, templating, ...)
- ``plans``      : declarative pipeline spec + multi-stage sequencer
- ``streaming``  : Structured Streaming windows over event streams
- ``llm``        : dedup (MinHash/SimHash/...), ANN similarity, text stats
"""

__version__ = "0.1.0"

from small_etl_spark.session import get_spark  # noqa: F401
