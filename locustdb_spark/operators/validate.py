"""Data-quality validation and profiling — the Deequ /
Great-Expectations-shaped stage a training-data pipeline runs before
and after every transformation at 100 TB. (The reference engine has
no validation surface; this belongs to the beyond-parity toolkit
next to sampling/text quality.)

Scale design — the whole point is ONE PASS:

- `check_constraints` compiles every rule into a conditional
  aggregate over a single scan: N rules cost one job with one
  partial->final aggregation, not N scans. Uniqueness rules are the
  exception by nature (they need a distinct count); they ride the
  same job as `count_distinct` aggregates, which Spark plans as an
  expand + two-phase agg — still one scan of the data.
- `profile_columns` computes per-column (nulls, distinct, min, max)
  for every requested column in the same single-scan fashion and
  melts the result to one row per column, so the output is
  gate-friendly and join-able against a previous profile (drift
  checks diff two profiles, never re-scanning the old data).
- Everything is built-in expression work (JVM, codegen): no UDF, no
  collect, outputs are a handful of rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    """Violations = rows where `col` IS NULL."""
    return (f"not_null({col})",
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("long"))


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    """Violations = non-null rows outside [lo, hi]."""
    return (f"in_range({col},{lo},{hi})",
            F.sum(F.when(F.col(col).isNotNull()
                         & ~F.col(col).between(F.lit(lo), F.lit(hi)),
                         1).otherwise(0)).cast("long"))


def matches(col: str, pattern: str) -> tuple[str, Column]:
    """Violations = non-null rows not fully matching `pattern`."""
    return (f"matches({col})",
            F.sum(F.when(F.col(col).isNotNull()
                         & ~F.col(col).rlike(pattern), 1)
                  .otherwise(0)).cast("long"))


def accepted_values(col: str, values: list) -> tuple[str, Column]:
    """Violations = non-null rows outside the accepted set."""
    return (f"accepted_values({col})",
            F.sum(F.when(F.col(col).isNotNull()
                         & ~F.col(col).isin(values), 1)
                  .otherwise(0)).cast("long"))


def unique(col: str) -> tuple[str, Column]:
    """Violations = rows carrying a duplicated non-null value
    (count of non-null rows minus distinct non-null values)."""
    return (f"unique({col})",
            (F.count(F.col(col)) - F.count_distinct(F.col(col)))
            .cast("long"))


def non_negative(col: str) -> tuple[str, Column]:
    return (f"non_negative({col})",
            F.sum(F.when(F.col(col).isNotNull() & (F.col(col) < 0), 1)
                  .otherwise(0)).cast("long"))


def check_constraints(
    df: DataFrame, rules: list[tuple[str, Column]],
) -> DataFrame:
    """Evaluate every rule in ONE aggregation job over ONE scan.
    Returns (rule, violations, total_rows, passed) with one row per
    rule — tiny regardless of input size, so a 100 TB validation is
    exactly one pass with map-side partial aggregation.

    Rules are (name, violation-count Column) pairs from the builders
    above (or any custom conditional aggregate with the same shape)."""
    aggs = [expr.alias(f"_r{i}") for i, (_, expr) in enumerate(rules)]
    row = df.agg(F.count(F.lit(1)).cast("long").alias("_total"), *aggs)
    per_rule = F.array(*[
        F.struct(F.lit(name).alias("rule"),
                 F.col(f"_r{i}").alias("violations"))
        for i, (name, _) in enumerate(rules)
    ])
    return (row.select(F.col("_total"),
                       F.explode(per_rule).alias("r"))
            .select(F.col("r.rule").alias("rule"),
                    F.col("r.violations").alias("violations"),
                    F.col("_total").alias("total_rows"),
                    (F.col("r.violations") == 0).alias("passed")))


def profile_columns(
    df: DataFrame, cols: list[str], distinct: str = "exact",
    rsd: float = 0.05,
) -> DataFrame:
    """Single-pass column profile: one row per column with null
    count, distinct count, and min/max rendered as strings so
    heterogeneous column types melt into one frame. The output is a
    per-column fingerprint a drift job can diff against yesterday's
    profile without touching yesterday's data.

    `distinct="exact"` (default, oracle-checkable) uses
    `count_distinct`, which Spark plans as an Expand — the input is
    replicated once per distinct-aggregate, a real two-pass cost when
    profiling many columns of a 100 TB table. `distinct="approx"`
    swaps in `approx_count_distinct` (HyperLogLog++, one streaming
    pass; `rsd` is the relative standard deviation, default 0.05, so
    individual estimates can be ~10% off at 2σ) — the right profile
    for a scheduled drift job, since `profile_drift`'s
    `max_distinct_frac_delta` threshold already absorbs sketch
    noise (set it above ~2×rsd)."""
    if distinct not in ("exact", "approx"):
        raise ValueError(
            f"distinct must be 'exact' or 'approx', got {distinct!r}")
    n_distinct = (F.count_distinct if distinct == "exact"
                  else lambda c: F.approx_count_distinct(c, rsd))
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"_n_{c}"),
            n_distinct(F.col(c)).cast("long").alias(f"_d_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).cast("long").alias("_total"), *aggs)
    melted = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col(f"_n_{c}").alias("n_null"),
                 F.col(f"_d_{c}").alias("n_distinct"),
                 F.col(f"_mn_{c}").alias("min_value"),
                 F.col(f"_mx_{c}").alias("max_value"))
        for c in cols
    ])
    return (row.select(F.col("_total"), F.explode(melted).alias("p"))
            .select(F.col("p.column").alias("column"),
                    F.col("p.n_null").alias("n_null"),
                    F.col("p.n_distinct").alias("n_distinct"),
                    F.col("p.min_value").alias("min_value"),
                    F.col("p.max_value").alias("max_value"),
                    F.col("_total").alias("total_rows")))


def profile_drift(
    old_profile: DataFrame,
    new_profile: DataFrame,
    *,
    max_null_frac_delta: float = 0.01,
    max_distinct_frac_delta: float = 0.05,
    fail_on_range_change: bool = False,
) -> DataFrame:
    """Diff two `profile_columns` outputs into a drift report — the
    operator that closes the loop the profile docstring promises
    ("drift checks diff two profiles, never re-scanning the old
    data"): yesterday's profile is a handful of rows, so comparing a
    100 TB table against its history costs a join of two tiny frames,
    zero scans of either table.

    Emits one row per (column, metric) in the same report shape as
    `check_constraints` (rule / measured values / passed):

    - ``null_frac(col)``   — |null fraction new − old|; passed when
      the delta is within `max_null_frac_delta`.
    - ``distinct_frac(col)`` — |distinct-per-row density new − old|
      (a cardinality-collapse / explosion detector); passed within
      `max_distinct_frac_delta`.
    - ``range(col)``       — how many of the min/max endpoints moved
      (0, 1 or 2, as `delta`; old/new values are NULL because the
      endpoints are heterogeneous strings); passed unless
      `fail_on_range_change` and an endpoint moved.

    Columns present in only one profile are dropped (inner join):
    schema drift is `check_constraints` territory, this compares the
    columns both snapshots measured."""
    def fracs(p: DataFrame, tag: str) -> DataFrame:
        return p.select(
            "column",
            (F.col("n_null") / F.col("total_rows"))
            .alias(f"_nf_{tag}"),
            (F.col("n_distinct") / F.col("total_rows"))
            .alias(f"_df_{tag}"),
            F.col("min_value").alias(f"_mn_{tag}"),
            F.col("max_value").alias(f"_mx_{tag}"))

    j = fracs(old_profile, "o").join(fracs(new_profile, "n"),
                                     "column")
    nf_delta = F.round(F.abs(F.col("_nf_n") - F.col("_nf_o")), 9)
    df_delta = F.round(F.abs(F.col("_df_n") - F.col("_df_o")), 9)
    ends_moved = (
        (~F.col("_mn_o").eqNullSafe(F.col("_mn_n"))).cast("int")
        + (~F.col("_mx_o").eqNullSafe(F.col("_mx_n"))).cast("int"))
    null_d = F.lit(None).cast("double")
    metrics = F.array(
        F.struct(
            F.concat(F.lit("null_frac("), F.col("column"),
                     F.lit(")")).alias("rule"),
            F.round(F.col("_nf_o"), 9).alias("old_value"),
            F.round(F.col("_nf_n"), 9).alias("new_value"),
            nf_delta.alias("delta"),
            (nf_delta <= F.lit(max_null_frac_delta)).alias("passed")),
        F.struct(
            F.concat(F.lit("distinct_frac("), F.col("column"),
                     F.lit(")")).alias("rule"),
            F.round(F.col("_df_o"), 9).alias("old_value"),
            F.round(F.col("_df_n"), 9).alias("new_value"),
            df_delta.alias("delta"),
            (df_delta <= F.lit(max_distinct_frac_delta))
            .alias("passed")),
        F.struct(
            F.concat(F.lit("range("), F.col("column"),
                     F.lit(")")).alias("rule"),
            null_d.alias("old_value"),
            null_d.alias("new_value"),
            ends_moved.cast("double").alias("delta"),
            (F.lit(not fail_on_range_change) | (ends_moved == 0))
            .alias("passed")))
    return (j.select(F.explode(metrics).alias("m"))
            .select("m.rule", "m.old_value", "m.new_value",
                    "m.delta", "m.passed"))
