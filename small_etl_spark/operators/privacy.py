"""Privacy / governance operators: k-anonymity audit and
deterministic differential-privacy noise (north-star; the reference
has no privacy surface — its only adjacent feature is field
exclusion, ``/root/reference`` projection config, covered by P6).

Training-data releases need (a) a measurement of re-identification
risk — how small are the equivalence classes induced by
quasi-identifier columns — and (b) a way to publish aggregate
statistics without exposing individuals. Both are single-aggregation
shapes that scale like any groupBy.

The DP noise here is the standard Laplace mechanism with one
deliberate twist: the uniform draw is a PORTABLE HASH of the group
key plus a CALLER-SUPPLIED salt (the house md5 idiom), not an RNG.
That keeps every released count reproducible across engines,
retries, and partitionings — the same determinism contract as
``llm/sampling.py`` — and lets the DuckDB oracle verify the exact
released values.

PRIVACY CONTRACT — read before releasing anything: because the
noise is a deterministic function of (salt, group key), anyone who
KNOWS the salt can recompute the noise exactly and recover the true
counts. The guarantee is therefore at best *computational DP under a
secret key* (Mironov et al. 2009): it holds only if the salt is a
high-entropy secret never shipped with the release. There is NO
default salt — a hard-coded public value would make the mechanism
ε=∞ (zero privacy) while still claiming ε-DP, so the caller must
supply one explicitly and own its secrecy. Treat the release as
one-shot per salt: re-releasing the same groups under the same salt
spends no extra budget (identical noise), but a fresh salt is a
fresh draw and composes like a fresh ε. For information-theoretic DP
(noise unrecoverable even with unbounded compute), use a real RNG
draw instead and give up oracle-exact reproducibility.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], k: int = 5
) -> DataFrame:
    """Equivalence classes of the quasi-identifier combination with
    their sizes and a ``violates_k`` flag (class size < k ⇒ every
    row in it is re-identifiable to within that class).

    One hash-aggregate over the quasi columns — map-side combined,
    output is class-count-sized. The overall k-anonymity of the
    release is ``min(class_n)``; suppression candidates are the
    flagged classes.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_n"))
        .select(
            *quasi_cols,
            "class_n",
            (F.col("class_n") < k).alias("violates_k"),
        )
    )


def _hash_uniform(cols: list[Column], salt: str) -> Column:
    """Deterministic uniform in [0,1): first 8 md5 hex chars / 2^32."""
    key = F.concat_ws("|", F.lit(salt), *[c.cast("string") for c in cols])
    return (
        F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10)
        .cast("double")
        / F.lit(4294967296.0)
    )


def dp_noisy_counts(
    df: DataFrame,
    group_cols: list[str],
    epsilon: float = 1.0,
    salt: str | None = None,
) -> DataFrame:
    """Noisy group counts via the Laplace mechanism: released
    count = true count + Laplace(1/ε) (count queries have L1
    sensitivity 1). The Laplace draw inverts the CDF at a
    deterministic hash-uniform of (salt, group key):
    ``noise = -(1/ε)·sign(u-½)·ln(1-2|u-½|)``.

    ``salt`` is REQUIRED and must be a secret: the privacy guarantee
    is computational DP under a secret key, not unconditional ε-DP —
    see the module docstring for the full contract. Passing a value
    that appears in code, config, or the release itself voids the
    guarantee entirely (the noise becomes publicly recomputable).

    Same plan as a plain groupBy count plus map-side expressions —
    noise costs nothing at any scale. Returns the group columns and
    ``noisy_n`` (rounded to 6dp; true counts are NOT in the output —
    that would defeat the release).
    """
    if not salt:
        raise ValueError(
            "dp_noisy_counts requires an explicit secret salt: the noise "
            "is a deterministic function of (salt, group key), so a "
            "public/default salt would make true counts exactly "
            "recoverable (zero privacy). Supply a high-entropy secret "
            "kept out of the release."
        )
    b = 1.0 / epsilon
    u = _hash_uniform([F.col(c) for c in group_cols], salt)
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return (
        df.groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("__n__"))
        .select(
            *group_cols,
            F.round(F.col("__n__") + noise, 6).alias("noisy_n"),
        )
    )
