"""Text-cleaning column functions (SURVEY §2.9, X1–X3).

- X1 clean_text       — /root/reference/src/core/contextual_pipeline.rs:883-889
  (trim + newline→space on every string column)
- X2 normalize_fields — /root/reference/src/core/contextual_pipeline.rs:892-898
  (lowercase listed columns)
- X3 trim_whitespace / remove_html_tags — declared-only in the
  reference (/root/reference/src/config/sequence_config.rs:93-100);
  implemented for real here.

All are JVM-side built-ins — whole-stage codegen, no Python in the
hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType


def _string_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]


def clean_text(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X1: trim + replace newlines with spaces on string columns."""
    cols = columns if columns is not None else _string_columns(df)
    return df.withColumns(
        {c: F.trim(F.regexp_replace(F.col(c), "\n", " ")) for c in cols if c in df.columns}
    )


def normalize_fields(df: DataFrame, columns: list[str]) -> DataFrame:
    """X2: lowercase the listed string columns (absent names no-op)."""
    existing = set(_string_columns(df))
    return df.withColumns({c: F.lower(F.col(c)) for c in columns if c in existing})


def trim_whitespace(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X3a: trim leading/trailing whitespace on string columns."""
    cols = columns if columns is not None else _string_columns(df)
    return df.withColumns({c: F.trim(F.col(c)) for c in cols if c in df.columns})


def remove_html_tags(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X3b: strip ``<...>`` tags from string columns."""
    cols = columns if columns is not None else _string_columns(df)
    return df.withColumns(
        {c: F.regexp_replace(F.col(c), "<[^>]*>", "") for c in cols if c in df.columns}
    )


# PII redaction (north-star: pre-training corpus hygiene). Order
# matters: emails before the bare-domain-ish patterns, IPs before
# phone-ish digit runs. Each is a plain POSIX-compatible regex so the
# identical pattern runs in the DuckDB oracle.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d[\d\s().-]{7,}\d", "<PHONE>"),
]


def redact_pii(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Replace emails / IPv4s / phone-number-shaped digit runs with
    typed placeholder tokens on string columns.

    The standard corpus-scrub pass before training: pure chained
    ``regexp_replace`` — JVM-side, codegen'd, zero Python — so at
    100 TB it fuses into the same scan stage as every other text
    cleaner. Deliberately conservative patterns (high precision);
    swap in a Presidio-style NER pass via ``mapInPandas`` only for
    recall-critical corpora.
    """
    cols = columns if columns is not None else _string_columns(df)

    def scrub(c: str):
        col = F.col(c)
        for pattern, token in PII_PATTERNS:
            col = F.regexp_replace(col, pattern, token)
        return col

    return df.withColumns({c: scrub(c) for c in cols if c in df.columns})


# Multi-label public suffixes the registrable-domain heuristic must
# not split (public-suffix-list-lite: the high-traffic ccTLD second
# levels; swap in the full Mozilla PSL as a broadcast lookup table for
# web-scale crawls).
_MULTI_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "com.br", "com.cn", "com.mx",
    "co.in", "co.kr", "co.za", "com.ar", "com.tr",
)


def canonicalize_url(col):
    """Canonical URL form for URL-keyed dedup and domain grouping:
    lowercase scheme+host, strip ``www.``, default ports (:80/:443),
    the fragment, every ``utm_*`` tracking parameter (dropping ``?``
    when nothing survives), and a trailing ``/``.

    Chained ``regexp_replace`` + ``lower`` on the scheme://host
    prefix only (path/query case is significant) — all JVM
    expressions, codegen'd into the scan stage, and every regex is
    POSIX-portable so the DuckDB oracle runs the identical chain.
    URL dedup before content dedup is the cheapest dedup pass a crawl
    pipeline has: exact string groupBy, no signatures.
    """
    c = F.col(col) if isinstance(col, str) else col
    # lowercase scheme and authority (up to first '/', '?' or '#')
    head = F.regexp_extract(c, r"^([^/?#]*//[^/?#]*)", 1)
    rest = F.substring(c, F.length(head) + 1, F.lit(2**31 - 1))
    u = F.concat(F.lower(head), rest)
    u = F.regexp_replace(u, r"^(https?://)www\.", r"$1")
    u = F.regexp_replace(u, r"^(https?://[^/?#]*):(80|443)(?=[/?#]|$)", r"$1")
    u = F.regexp_replace(u, r"#.*$", "")
    # drop utm_* params wherever they sit, then tidy separators
    u = F.regexp_replace(u, r"([?&])utm_[^=&#]*=[^&#]*", r"$1")
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


def url_host(col):
    """Hostname of a URL (no scheme, port, path, or userinfo),
    lowercased."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.regexp_extract(c, r"^[^/?#]*//(?:[^/?#@]*@)?([^/?#:]+)", 1)
    )


def registrable_domain(col):
    """eTLD+1 of a URL or hostname: the unit crawls cap, rate-limit,
    and block at (one site = one registrable domain, not one host —
    ``a.blog.example.co.uk`` and ``b.blog.example.co.uk`` are the same
    site ``example.co.uk``).

    Heuristic PSL: last two labels, or last three when the last two
    are a known multi-label public suffix (``_MULTI_SUFFIXES``). Pure
    split/slice/concat on the host — no Python, no lookup join; for
    full PSL fidelity broadcast-join the Mozilla list keyed on the
    candidate suffixes instead.
    """
    c = F.col(col) if isinstance(col, str) else col
    host = F.when(c.contains("//"), url_host(c)).otherwise(F.lower(c))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    last2 = F.concat_ws(".", F.slice(parts, F.greatest(n - 1, F.lit(1)), 2))
    last3 = F.concat_ws(".", F.slice(parts, F.greatest(n - 2, F.lit(1)), 3))
    is_multi = last2.isin(*_MULTI_SUFFIXES)
    return F.when(n <= 2, host).otherwise(
        F.when(is_multi & (n >= 3), last3).otherwise(last2)
    )
