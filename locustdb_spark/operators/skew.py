"""Skew-handling primitives: salted join and salted aggregation.

At 100 TB a handful of hot keys (the empty string, a null-ish default,
one viral user) can pin an entire stage on one reducer. AQE's skew-join
splitting handles sort-merge joins automatically; these helpers cover
the cases it doesn't:

- `salted_join`: shuffle-hash/sort-merge join where the hot side's rows
  are spread across `salt` sub-keys and the other side is replicated
  `salt` times. Replication multiplies the small side's shuffle volume
  by `salt`, so use it when that side is too big to broadcast but far
  smaller than the skewed side. Results are identical to a plain join.
- `salted_agg`: two-phase aggregation — partial agg on (key, salt),
  final agg on key — so a hot group's rows are pre-combined by `salt`
  reducers instead of one. Spark's map-side partial aggregation already
  does this *within* a task; salting extends it across the reduce side
  for extreme per-key row counts. Supports the decomposable aggregates
  (count/sum/min/max + avg via sum/count).

Salt assignment uses `monotonically_increasing_id() % salt`:
deterministic for a given partitioning, uniform across a hot key's rows
(a content-hash salt would collapse identical rows onto one salt value,
defeating the point).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    other_key: str | None = None,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `skewed` (hot-key side) with `other` on key columns,
    spreading each hot key over `salt` reducers. `other` rows are
    replicated once per salt value via an explode (no driver loop).
    Output columns = skewed's then other's (minus its join key)."""
    other_key = other_key or key
    left = skewed.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    right = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    joined = left.join(
        right,
        (left[key] == right[other_key]) & (left["_salt"] == right["_salt"]),
        how,
    )
    drop = [right[other_key], left["_salt"], right["_salt"]]
    if other_key == key:
        # same-named key: keep the left one only
        return joined.drop(*drop)
    return joined.drop(*drop)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt: int = 32,
) -> DataFrame:
    """Two-phase skew-safe aggregation. `aggs` maps output column ->
    "fn(col)" with fn in count/sum/min/max/avg; count(*) is "count(1)".
    Exactly equals df.groupBy(keys).agg(...)."""
    parsed: dict[str, tuple[str, str]] = {}
    for out, spec in aggs.items():
        fn, _, col = spec.partition("(")
        parsed[out] = (fn.strip().lower(), col.rstrip(")").strip())

    salted = df.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salt)))
    partial_exprs, final_exprs = [], []
    for out, (fn, col) in parsed.items():
        if fn == "count":
            c = F.lit(1) if col in ("1", "*", "0") else F.col(col)
            partial_exprs.append(F.count(c).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"_ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"_pc_{out}"))
            final_exprs.append(
                (F.sum(f"_ps_{out}") / F.sum(f"_pc_{out}")).alias(out))
        else:
            raise ValueError(f"unsupported aggregate: {fn}")
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
