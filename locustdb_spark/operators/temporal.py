"""Temporal operators Spark lacks natively, built from compositions of
DataFrame primitives (no UDFs): as-of join, and event range joins via
the same machinery.

Scale design: the as-of join is the union + ordered-window-fill
formulation — both inputs are unioned, shuffled ONCE on the `by` key,
and each partition is a single ordered pass that forward-fills the most
recent right-side row into every left row. This is O(n log n) per key
group with no row explosion, unlike the naive join-then-argmax
formulation whose intermediate is |left| x |matching right| and falls
over on active keys. It is also exactly how a 1000-executor cluster
wants the work shaped: one shuffle, then embarrassingly parallel
per-key streams.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str = "ts",
    right_start: str = "start",
    right_end: str = "end",
    by: str | None = None,
    bucket_width: int | None = None,
) -> DataFrame:
    """Interval join: pair every left row with the right intervals
    containing its timestamp (start <= ts <= end), optionally also
    matching a `by` key.

    Naive inequality joins lower to a nested-loop broadcast — O(|L|x|R|)
    and a driver OOM at scale. This formulation bucketizes time: each
    interval is exploded to the buckets it covers, left rows get their
    single bucket, and the join is a plain equi-join on (by?, bucket)
    with the exact range predicate applied post-join. A left row's
    bucket intersects an interval's bucket list at most once, so no
    dedup pass is needed. Shuffle volume is |L| + |R| * avg_span/width;
    pick `bucket_width` near the typical interval length (default: the
    right side's max span, computed with one tiny agg).
    """
    if bucket_width is None:
        row = right.select(
            F.max(F.col(right_end) - F.col(right_start))).head()
        bucket_width = max(int(row[0] or 1), 1)
    w = F.lit(bucket_width)
    l2 = left.withColumn("_b", (F.col(left_ts) / w).cast("long"))
    r2 = right.withColumn(
        "_b",
        F.explode(F.sequence((F.col(right_start) / w).cast("long"),
                             (F.col(right_end) / w).cast("long"))),
    )
    cond = (l2["_b"] == r2["_b"]) \
        & (l2[left_ts] >= r2[right_start]) & (l2[left_ts] <= r2[right_end])
    if by is not None:
        cond = cond & (l2[by] == r2[by])
        out = l2.join(r2, cond).drop(l2["_b"]).drop(r2["_b"]).drop(r2[by])
    else:
        out = l2.join(r2, cond).drop(l2["_b"]).drop(r2["_b"])
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "user_id",
    right_cols: Sequence[str] = ("event_id", "value"),
    suffix: str = "_r",
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join: every left row picks up the most recent right
    row with the same `by` key and `on` value <= the left row's (ties
    at equal `on` match). Left rows with no prior right row keep NULLs
    — the semantics of DuckDB/pandas ASOF LEFT JOIN.

    `right_cols` are carried from the matched right row, renamed with
    `suffix`; the right `on` value is always carried as f"{on}{suffix}".
    `tolerance` (same unit as `on`) drops matches older than
    left.on - tolerance, like pandas merge_asof.
    """
    carry = list(dict.fromkeys([on, *right_cols]))
    r2 = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in carry],
    )
    l2 = left.withColumn("_side", F.lit(1))
    u = l2.unionByName(r2, allowMissingColumns=True)

    # right rows sort before left rows at equal `on` (ties match);
    # among right rows at identical `on`, the highest first carry
    # column wins deterministically.
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc(),
                 F.col(f"{carry[0]}{suffix}").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "*",
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w).alias(f"_f_{c}")
          for c in carry],
    )
    out = filled.filter(F.col("_side") == 1)
    for c in carry:
        out = out.withColumn(f"{c}{suffix}", F.col(f"_f_{c}"))
    out = out.drop("_side", *[f"_f_{c}" for c in carry])
    if tolerance is not None:
        keep = F.col(f"{on}{suffix}") >= F.col(on) - F.lit(tolerance)
        for c in carry:
            out = out.withColumn(
                f"{c}{suffix}", F.when(keep, F.col(f"{c}{suffix}")))
    return out


def _gapfill_spine(agg: DataFrame, key_col: str) -> DataFrame:
    """Dense bucket x key spine derived from an aggregate that has a
    `bucket` column. The aggregate is persisted first: it is tiny by
    construction (#buckets x #keys rows, independent of fact-table
    size), and the spine/bounds/join subtrees would otherwise each
    re-scan the full fact table — Spark's exchange reuse does not
    deduplicate these subtrees (verified on the executed plan), so at
    100 TB the persist is the difference between one scan and three."""
    agg.persist()
    bounds = agg.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    return (
        bounds.select(
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("bucket"))
        .crossJoin(agg.select(key_col).distinct())
    )


def resample_zero_fill(
    events: DataFrame,
    bucket_ns: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Time-bucket rollup with gap filling: aggregate per
    (bucket, key), then left-join the aggregates onto the dense
    bucket x key spine so empty buckets appear with zero counts (the
    hypertable / time_bucket_gapfill shape).

    The fact table is reduced by one partial-agg shuffle before
    anything else and scanned exactly once (see `_gapfill_spine`);
    gap filling itself joins only aggregate-sized inputs broadcast.
    """
    bucket = F.call_function("div", F.col(ts_col), F.lit(bucket_ns))
    # Sum in exact integer micro-units: float summation is
    # partition-order-dependent, and rounding an order-dependent sum
    # lands on knife edges (engines disagree in the last printed
    # digit). int64 sums are associative, so the result is bit-exact
    # on any cluster layout and in any oracle engine. Headroom: 9e18 /
    # 1e6-units supports ~9e12-unit-sums per (bucket, key).
    micro = F.round(F.col(value_col) * 1e6).cast("long")
    agg = events.groupBy(bucket.alias("bucket"), F.col(key_col)).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(micro).cast("double") / F.lit(1e6), 4)
        .alias("sum_value"),
    )
    spine = _gapfill_spine(agg, key_col)
    return (
        spine.join(F.broadcast(agg), ["bucket", key_col], "left")
        .select(
            "bucket",
            key_col,
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.coalesce("sum_value", F.lit(0.0)).alias("sum_value"),
        )
    )


def resample_forward_fill(
    events: DataFrame,
    bucket_ns: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Bucket-average the series, expand to the dense spine (gaps
    become NULL), then carry the last observation forward per key —
    gap filling by interpolation-from-the-left rather than zeros.
    Same single-scan shape as `resample_zero_fill`."""
    bucket = F.call_function("div", F.col(ts_col), F.lit(bucket_ns))
    # exact integer-moment average (see resample_zero_fill): the int64
    # sum is order-independent, and the single double division is IEEE
    # deterministic, so the rounded average is bit-identical across
    # partitionings and engines
    micro = F.round(F.col(value_col) * 1e6).cast("long")
    agg = events.groupBy(bucket.alias("bucket"), F.col(key_col)).agg(
        F.round(
            F.sum(micro).cast("double") / F.count(value_col) / F.lit(1e6), 6
        ).alias("avg_value"))
    spine = _gapfill_spine(agg, key_col)
    sparse = spine.join(F.broadcast(agg), ["bucket", key_col], "left")
    return forward_fill(sparse, key_col, "bucket", "avg_value")


def forward_fill(
    df: DataFrame,
    key_col: str,
    order_col: str,
    value_col: str,
    filled_name: str = "filled_value",
) -> DataFrame:
    """Last-observation-carried-forward: fill NULL values with the most
    recent non-null value in `order_col` order within each key. One
    shuffle on the key, then a single ordered pass per partition
    (`last(..., ignorenulls)` over an unbounded-preceding frame) —
    the standard Spark LOCF idiom, no UDFs, bounded memory."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.withColumn(
        filled_name, F.last(value_col, ignorenulls=True).over(w))
