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
    df: DataFrame, cols: list[str],
) -> DataFrame:
    """Single-pass column profile: one row per column with null
    count, distinct count (exact — swap count_distinct for
    approx_count_distinct when a sketch suffices at scale), and
    min/max rendered as strings so heterogeneous column types melt
    into one frame. The output is a per-column fingerprint a drift
    job can diff against yesterday's profile without touching
    yesterday's data."""
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long").alias(f"_n_{c}"),
            F.count_distinct(F.col(c)).cast("long").alias(f"_d_{c}"),
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
