"""Custom-aggregate escape hatch: Arrow-batched GROUPED_AGG pandas
UDAFs.

The reference's extension point for "an operator the engine lacks" is
writing a new Rust vector kernel (reference
src/engine/operators/map_operator.rs, vector_operator.rs dispatch);
ours is a vectorized pandas aggregate. Use it ONLY when Catalyst
genuinely cannot express the aggregate — weighted median is the
canonical case: it needs a joint sort + cumulative scan over (value,
weight) pairs per group, which no composition of built-in aggregate
functions produces.

Scale shape: the groupBy pays the same single partial-less shuffle any
aggregation does; each group's columns then cross to Python as ONE
Arrow batch (AggregateInPandas), never row-at-a-time (the fleet-wide
plan guard in tests/test_plans.py enforces BatchEvalPython absence).
Per-group memory is O(group size) — for groups too large for one
executor, pre-aggregate to (value, sum-of-weights) pairs first, which
`weighted_median` does by default: it collapses duplicate values
JVM-side so Python sees at most |distinct values| rows per group.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("long")
def _weighted_median_udaf(v: pd.Series, w: pd.Series) -> int:
    """Lower weighted median: smallest v with cum weight >= half the
    total. Integer inputs -> integer-exact, tie-order independent (the
    value at the threshold crossing is the same whatever order equal
    values arrive in)."""
    order = v.sort_values(kind="mergesort").index
    v2 = v.loc[order].reset_index(drop=True)
    cum = w.loc[order].reset_index(drop=True).cumsum()
    total = int(cum.iloc[-1])
    return int(v2[cum * 2 >= total].iloc[0])


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_cols: list[str],
    out_col: str = "weighted_median",
) -> DataFrame:
    """Weighted median of `value_col` (long) weighted by `weight_col`
    (long) per group. JVM-side pre-aggregation collapses duplicate
    values first (partial-aggregated shuffle of (group, value) pairs),
    so the Python stage's per-group input is bounded by distinct-value
    count, not row count."""
    collapsed = (
        df.groupBy(*group_cols, F.col(value_col).alias("_v"))
        .agg(F.sum(weight_col).alias("_w"))
    )
    return collapsed.groupBy(*group_cols).agg(
        _weighted_median_udaf("_v", "_w").alias(out_col))
