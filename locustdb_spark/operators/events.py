"""Event-stream analytics: ordered funnels and cohort retention.

The reference treats event data as plain rows (its demo workload is a
logging/metrics store — reference src/logging_client/mod.rs); the
product-analytics queries a user of such a store runs daily are funnels
and retention. Both are expressed as single-shuffle aggregations:

- `funnel` groups each user's qualifying timestamps once (one shuffle
  on user_id) and resolves the step ordering JVM-side with array
  expressions (`array_min` / `filter`), so per-user state is bounded by
  that user's event count and no self-joins of the fact table occur.
  At 100 TB the only shuffle moves (user_id, step-ts-lists) — a tiny
  fraction of the raw events, and partial aggregation prunes non-step
  events map-side.
- `retention` reduces events to distinct (user, day) activity, derives
  each user's cohort day with a whole-partition window min (no join
  against a second shuffled copy), and counts distinct users per
  (cohort_day, day_offset) cell.
- `sessionize` assigns gap-based session ids with one shuffle on
  user_id: a lag window flags session starts, a running sum numbers
  them, and the per-session rollup reuses the window's hash
  partitioning (HashPartitioning(user_id) already satisfies the
  (user_id, session_seq) clustering requirement, so Catalyst inserts
  no second Exchange). Batch analog of streaming/streams.py
  sessionization (applyInPandasWithState), oracle-checkable because
  tie ordering cannot change any session boundary (equal timestamps
  have gap 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

DAY_NS = 86_400 * 10**9


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    within_ns: int | None = None,
    max_events_per_step: int | None = 1024,
    merge_buckets: int = 64,
) -> DataFrame:
    """Ordered funnel: for step i, count users whose first qualifying
    step-i event is at-or-after their first qualifying step-(i-1)
    event — and, when `within_ns` is set, no more than that far after
    it (a conversion window: 'purchased within 7 days of clicking').
    Returns one row per step: (step, event_type, users).

    Accumulator bound: with `max_events_per_step` set (default 1024),
    each user keeps only the k EARLIEST step-i timestamps, merged
    through partition-bounded cells (same associative-top-k shape as
    sampling._salted_topk): groupBy(user, scan-partition-id) caps each
    cell at one partition's rows, then two k-array merge hops bound
    every later cell at max(ceil(P/merge_buckets), merge_buckets) * k
    longs — a bot with 100M step events can no longer materialize one
    gigabyte-scale collect_list cell. Exact whenever every user has
    <= k events per step; beyond that it is a documented conservative
    truncation (a conversion later than a user's k-th step event is
    missed — never overcounted). `max_events_per_step=None` restores
    the exact single-shuffle unbounded shape.
    """
    ev = events.filter(F.col(type_col).isin(list(steps)))
    step_ts = [
        F.when(F.col(type_col) == s, F.col(ts_col))
        for s in steps
    ]
    if max_events_per_step is None:
        per_user = ev.groupBy(user_col).agg(*[
            F.collect_list(c).alias(f"_ts_{i}")
            for i, c in enumerate(step_ts)
        ])
    else:
        k = max_events_per_step

        def cap(arr):
            return F.slice(F.array_sort(arr), 1, k)

        n = len(steps)
        cells = ev.groupBy(
            user_col, F.spark_partition_id().alias("_pid")
        ).agg(*[
            cap(F.collect_list(c)).alias(f"_ts_{i}")
            for i, c in enumerate(step_ts)
        ])
        merged = cells.groupBy(
            user_col,
            F.pmod(F.col("_pid"), F.lit(merge_buckets)).alias("_mb"),
        ).agg(*[
            cap(F.flatten(F.collect_list(f"_ts_{i}"))).alias(f"_ts_{i}")
            for i in range(n)
        ])
        per_user = merged.groupBy(user_col).agg(*[
            cap(F.flatten(F.collect_list(f"_ts_{i}"))).alias(f"_ts_{i}")
            for i in range(n)
        ])
    # Resolve step times left-to-right: t_i = min ts of step i that is
    # >= t_{i-1} (and <= t_{i-1} + within_ns when windowed). Pure JVM
    # array expressions over the already-grouped lists — no further
    # shuffle.
    per_user = per_user.withColumn("_t_0", F.array_min("_ts_0"))
    for i in range(1, len(steps)):
        prev = F.col(f"_t_{i - 1}")
        if within_ns is None:
            qualifies = lambda x: x >= prev  # noqa: E731
        else:
            qualifies = (  # noqa: E731
                lambda x: (x >= prev) & (x <= prev + F.lit(within_ns)))
        per_user = per_user.withColumn(
            f"_t_{i}",
            F.array_min(F.filter(F.col(f"_ts_{i}"), qualifies)),
        )
    counts = per_user.agg(*[
        F.count(f"_t_{i}").alias(f"_u_{i}") for i in range(len(steps))
    ])
    rows = F.array(*[
        F.struct(
            F.lit(i + 1).alias("step"),
            F.lit(s).alias("event_type"),
            F.col(f"_u_{i}").alias("users"),
        )
        for i, s in enumerate(steps)
    ])
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def sessionize(
    events: DataFrame,
    gap_ns: int = 30 * 60 * 10**9,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Gap-based sessionization (ts is epoch-nanos): a new session
    starts when a user's inter-event gap exceeds `gap_ns`. Returns one
    row per session: (user, session_seq, session_start, session_end,
    n_events). Single shuffle on user_col; the session rollup adds no
    further Exchange (see module docstring)."""
    w = Window.partitionBy(user_col).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    flagged = events.select(
        F.col(user_col), F.col(ts_col),
        F.when(
            prev.isNull() | ((F.col(ts_col) - prev) > F.lit(gap_ns)), 1
        ).otherwise(0).alias("_new_session"),
    )
    # Both windows share (partition key, sort key), so Catalyst plans
    # them in one Window stage over one shuffle+sort.
    numbered = flagged.select(
        F.col(user_col), F.col(ts_col),
        F.sum("_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("session_seq"),
    )
    return numbered.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_ns: int = DAY_NS,
) -> DataFrame:
    """Cohort retention: bucket activity by day (ts is epoch-nanos),
    cohort each user by their first active day, and count distinct
    users per (cohort_day, day_offset)."""
    day = F.call_function("div", F.col(ts_col), F.lit(bucket_ns))
    act = events.select(F.col(user_col), day.alias("day")).distinct()
    w = Window.partitionBy(user_col)
    act = act.withColumn("cohort_day", F.min("day").over(w))
    return (
        act.groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct(user_col).alias("users"))
    )
