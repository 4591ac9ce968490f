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
