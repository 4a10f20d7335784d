"""Count-min sketch: mergeable frequency estimation (north-star; the
reference has no sketching at all — its summary agg is exact counts,
``/root/reference`` SURVEY §2 A1).

A CMS is a ``depth × width`` counter grid; item x increments cell
``(j, h_j(x))`` for each of the ``depth`` hash rows, and the estimate
is the MIN over its cells — an overcount-only bound (est ≥ true, and
est ≤ true + ε·N with probability 1-δ for width = e/ε, depth =
ln(1/δ)).

Why this is the 100 TB shape: the sketch build is ONE map-side
combined groupBy producing at most ``depth × width`` rows regardless
of input size, and two sketches MERGE by cell-wise addition — so
shards/streams/days can sketch independently and combine without
re-reading data (same story as the HLL union in
operators/incremental.py). The hashes are portable md5 buckets (the
house idiom, cf. ``hashing_tf``), so DuckDB replays the sketch
bit-for-bit and the driver can value-hash it — an *oracled* sketch,
not a rows-only one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _bucket(j: F.Column, x: F.Column, width: int) -> F.Column:
    """Portable hash row j bucket: md5("j:x") first 4 hex chars mod width."""
    h = F.md5(
        F.concat_ws(":", j.cast("string"), x.cast("string")).cast("binary")
    )
    return F.pmod(
        F.conv(F.substring(h, 1, 4), 16, 10).cast("bigint"), F.lit(width)
    ).alias("bucket")


def cms_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 512
) -> DataFrame:
    """Build a count-min sketch over ``df[col]``.

    Returns ``(j, bucket, cnt)`` — at most ``depth × width`` rows.
    The explode multiplies map-side rows by ``depth``, but the
    hash-aggregate combines locally, so the shuffle carries only
    ``depth × width`` partials per task.
    """
    rows = df.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
        F.col(col).alias("__x__"),
    )
    return (
        rows.select("j", _bucket(F.col("j"), F.col("__x__"), width))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shaped sketches (the mergeability law)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, items: DataFrame, col: str, depth: int, width: int
) -> DataFrame:
    """Estimate each item's frequency: min over its ``depth`` cells.

    ``sketch`` is tiny (≤ depth×width rows) — Spark broadcasts it, so
    probing N items is a map-only pass over ``items``.
    """
    probes = items.select(
        F.col(col),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("j"),
    )
    probes = probes.select(
        F.col(col), "j", _bucket(F.col("j"), F.col(col), width)
    )
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_n"))
    )


def _bloom_positions(col, num_bits: int, num_hashes: int):
    """k portable bit positions for a key (md5 rows, house idiom)."""
    return [
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(f"bf{j}"), F.col(col).cast("string")
                        ).cast("binary")
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(num_bits),
        )
        for j in range(num_hashes)
    ]


def bloom_semi_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    num_bits: int = 4096,
    num_hashes: int = 3,
) -> DataFrame:
    """Semi join with an explicit Bloom runtime filter: build a
    ``num_bits``-bit Bloom filter from the (already filtered) dim
    keys, push a map-side membership test into the fact side, then
    make the survivors exact with a real LeftSemi — the same
    mechanism as Spark's ``runtime.bloomFilter`` injection
    (enabled in session.py), materialized as an operator so the
    pruning is explicit, portable, and testable.

    The filter is ``num_bits/64`` longs built on the driver from one
    dim aggregation — 512 bytes at the 4096-bit default, the
    driver-side cost every engine's runtime filter pays (this is a
    bounded collect by construction, like the broadcast step of any
    broadcast join). The fact-side probe is k shift/AND expressions
    on a literal array — whole-stage-codegen, no join, no shuffle;
    rows failing ANY bit test drop BEFORE the semi join's exchange.
    False positives (≈0.1% at 4096 bits / 3 hashes / ≤500 keys) cost
    only wasted probe rows — the trailing LeftSemi keeps the result
    exact, so correctness never depends on the filter.
    """
    probed, hit, tmp_cols = _bloom_probe(
        facts, dim, on, num_bits, num_hashes
    )
    return (
        probed.filter(F.expr(hit))
        .drop(*tmp_cols)
        .join(dim.select(on), on, "left_semi")
    )


def _bloom_probe(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    num_bits: int,
    num_hashes: int,
) -> tuple[DataFrame, str, list[str]]:
    """Shared Bloom build+probe: returns (probed facts, hit SQL
    expression, temp cols to drop). The filter build is one dim
    aggregation collected bounded at ≤ num_bits rows."""
    pos_rows = dim.select(
        F.explode(F.array(*_bloom_positions(on, num_bits, num_hashes))).alias(
            "p"
        )
    ).distinct()
    words = [0] * (num_bits // 64)
    for r in pos_rows.collect():  # bounded: ≤ num_bits rows
        words[r["p"] >> 6] |= 1 << (r["p"] & 63)
    # two's-complement fold so the literal fits BIGINT
    arr = F.array(
        *[F.lit(w - (1 << 64) if w >= (1 << 63) else w).cast("bigint")
          for w in words]
    )
    probed = facts
    tmp_cols = []
    for j, p in enumerate(_bloom_positions(on, num_bits, num_hashes)):
        wc, bc = f"__bfw{j}__", f"__bfb{j}__"
        probed = probed.withColumn(
            wc, F.element_at(arr, (p / 64).cast("int") + 1)
        ).withColumn(bc, (p % 64).cast("int"))
        tmp_cols += [wc, bc]
    hit = " AND ".join(
        f"((shiftright(__bfw{j}__, __bfb{j}__) & 1) = 1)"
        for j in range(num_hashes)
    )
    return probed, hit, tmp_cols


def bloom_anti_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    num_bits: int = 4096,
    num_hashes: int = 3,
) -> DataFrame:
    """ANTI join with a Bloom fast path — the incremental-dedup delta
    pattern: keep the ``left`` rows whose key does NOT appear in
    ``right`` (e.g. today's crawl against the historical fingerprint
    set).

    The asymmetry that makes Bloom PERFECT for anti joins: a Bloom
    NEGATIVE is certain. Rows failing the membership test are
    definitely-new and pass through with NO join at all (map-side
    predicate only); only the Bloom-POSITIVE sliver (true dups +
    ~0.1% false positives) pays the exact LeftAnti. At 100 TB, where
    the overwhelming majority of a fresh crawl is new, the exchange
    carries the maybe-set, not the corpus — the inverse economics of
    the semi join above. Correctness never depends on the filter: the
    union is exactly the plain LeftAnti (pinned by the
    ``bloom_anti_join_delta`` oracle and tests).
    """
    probed, hit, tmp_cols = _bloom_probe(
        left, right, on, num_bits, num_hashes
    )
    definitely_new = probed.filter(~F.expr(hit)).drop(*tmp_cols)
    maybe = (
        probed.filter(F.expr(hit))
        .drop(*tmp_cols)
        .join(right.select(on), on, "left_anti")
    )
    return definitely_new.unionByName(maybe)


def approx_quantile_rank_error(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75),
    accuracy: int = 1000,
) -> DataFrame:
    """Mergeable quantile sketch with a MEASURED error bound: run
    Spark's Greenwald–Khanna ``approx_percentile`` (partial-aggregate
    + merge — one pass, no sort, executor memory O(accuracy), the
    only way to do percentiles over 100 TB) per group, then compute
    each returned value's EXACT rank with one more aggregation and
    report ``rank_err = |rank(approx) - q|``.

    GK guarantees rank error ≤ 1/accuracy; the oracled
    ``quantile_sketch_contract`` pins ``rank_err ≤ 5/accuracy`` with
    margin so the check is robust to tie plateaus (rank of a value in
    the presence of duplicates is a range; we score its upper end).

    Returns ``(group_col, q, n, rank_err)`` — one row per group ×
    quantile. The exact-rank pass is a broadcast of the tiny
    (group × |qs|) approx table against one conditional-sum scan,
    NOT a sort: the verification costs the same as any aggregation.
    """
    qlist = "array(" + ", ".join(str(q) for q in qs) + ")"
    approx = (
        df.groupBy(group_col)
        .agg(
            F.expr(
                f"approx_percentile({value_col}, {qlist}, {accuracy})"
            ).alias("__ap__")
        )
        .select(
            group_col,
            F.posexplode("__ap__").alias("__qi__", "__av__"),
        )
        .withColumn(
            "q",
            F.element_at(
                F.array(*[F.lit(float(q)) for q in qs]),
                F.col("__qi__") + 1,
            ),
        )
        .drop("__qi__")
    )
    ranked = (
        df.join(F.broadcast(approx), group_col)
        .groupBy(group_col, "q", "__av__")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col(value_col) <= F.col("__av__")).cast("bigint")
            ).alias("__le__"),
        )
    )
    return ranked.select(
        group_col,
        "q",
        "n",
        F.abs(
            F.col("__le__").cast("double") / F.col("n").cast("double")
            - F.col("q")
        ).alias("rank_err"),
    )
