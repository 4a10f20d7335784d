"""Operator library: pure ``DataFrame -> DataFrame`` functions.

Each operator cites the reference behavior it re-expresses
(file:line into ``/root/reference/``) and is declarative — Catalyst
owns predicate pushdown, column pruning, and join strategy.
"""

from small_etl_spark.operators.projections import (  # noqa: F401
    add_processing_markers,
    computed_fields,
    default_fill,
    exclude_fields,
    keep_only_fields,
    map_nested_fields,
    rename_fields,
)
from small_etl_spark.operators.filters import (  # noqa: F401
    equality_filter,
    extract_filters,
    limit_records,
    threshold_filter,
)
from small_etl_spark.operators.dedup import (  # noqa: F401
    dedup_by_fields_first_wins,
    dedup_full_record,
    with_ingest_ordinal,
)
from small_etl_spark.operators.sort import sort_by_field  # noqa: F401
from small_etl_spark.operators.sets import union_all_by_name  # noqa: F401
from small_etl_spark.operators.joins import (  # noqa: F401
    lookup_enrich,
    lookup_enrich_stub,
    merge_with_previous,
)
from small_etl_spark.operators.validation import validate_frame  # noqa: F401
