"""Physical-plan introspection.

The reference engine exposes its operator graph through `explain` and
per-query plan histograms (reference src/locustdb.rs:36-42,
query_task.rs:408-411). On Spark the analog is Catalyst's formatted
explain; these helpers read it so tests and the bench harness can
assert the plan *properties* that survive a 1000-executor scale-up:
filters pushed to the parquet scan, pruned read schemas, bounded
exchange (shuffle) counts, TakeOrderedAndProject for top-n.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = [
    "explain_formatted",
    "n_exchanges",
    "pushed_filters",
    "read_schemas",
    "has_take_ordered",
    "plan_summary",
]


def explain_formatted(df: DataFrame) -> str:
    """The formatted explain string (what `.explain("formatted")`
    prints), returned instead of printed so it can be asserted on."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def n_exchanges(plan_or_df: DataFrame | str) -> int:
    """Number of physical Exchange (shuffle) nodes. Formatted mode
    lists each node once in the tree and once in the detail section as
    '(N) Exchange'; count only the detail headers."""
    plan = (
        plan_or_df
        if isinstance(plan_or_df, str)
        else explain_formatted(plan_or_df)
    )
    return len(re.findall(r"\(\d+\) Exchange", plan))


def pushed_filters(plan_or_df: DataFrame | str) -> list[str]:
    """The PushedFilters lists from every parquet scan in the plan,
    e.g. ['IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)']."""
    plan = (
        plan_or_df
        if isinstance(plan_or_df, str)
        else explain_formatted(plan_or_df)
    )
    return [
        m.group(1).strip()
        for m in re.finditer(r"PushedFilters:\s*\[(.*?)\]", plan)
    ]


def read_schemas(plan_or_df: DataFrame | str) -> list[str]:
    """The ReadSchema struct strings of every scan — the columns that
    actually reach the reader. A scan whose ReadSchema lists columns
    the query never touches means pruning failed."""
    plan = (
        plan_or_df
        if isinstance(plan_or_df, str)
        else explain_formatted(plan_or_df)
    )
    return [
        m.group(1).strip()
        for m in re.finditer(r"ReadSchema:\s*(\S+)", plan)
    ]


def has_take_ordered(plan_or_df: DataFrame | str) -> bool:
    """True when ORDER BY + LIMIT lowered to TakeOrderedAndProject
    (heap top-n per partition + merge) instead of a full sort — the
    plan shape the reference's TopN operator hand-rolls
    (reference src/engine/operators/top_n.rs:8-115)."""
    plan = (
        plan_or_df
        if isinstance(plan_or_df, str)
        else explain_formatted(plan_or_df)
    )
    return "TakeOrderedAndProject" in plan


def plan_summary(df: DataFrame) -> dict:
    """One-call plan health check used by the bench harness."""
    plan = explain_formatted(df)
    return {
        "exchanges": n_exchanges(plan),
        "pushed_filters": pushed_filters(plan),
        "read_schemas": read_schemas(plan),
        "take_ordered": has_take_ordered(plan),
        "codegen_stages": len(set(re.findall(r"codegen id : (\d+)", plan))),
    }
