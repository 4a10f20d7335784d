"""Scalar function surface (SURVEY §2.9)."""

from small_etl_spark.functions.text import (  # noqa: F401
    clean_text,
    normalize_fields,
    remove_html_tags,
    trim_whitespace,
)
from small_etl_spark.functions.templating import (  # noqa: F401
    substitute_endpoint_params,
    substitute_env_vars,
    substitute_template,
)
