"""Scalar function surface of the engine, as reusable pyspark Column
helpers.

This is the complete built-in function set of the reference engine
(reference src/engine/operators/functions.rs:1-50, parsed at
src/syntax/parser.rs:266-298,363-385) re-expressed as Catalyst
expressions, so every helper stays inside whole-stage codegen — no
Python UDFs. The SQL dialect compiler (`locustdb_spark.dialect`)
routes function calls here; users composing DataFrames directly can
import these for identical semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "to_year",
    "length_bytes",
    "regex_match",
    "floor_int",
    "int_div",
    "like_pattern_to_regex",
    "morton_interleave",
    "equi_depth_bucket",
    "build_zorder_key",
]


def equi_depth_bucket(col: Column, boundaries: list[float]) -> Column:
    """Rank a value into len(boundaries)+1 equi-depth buckets: the
    bucket index is how many (sorted, pre-computed) quantile
    boundaries the value exceeds — a JVM-side higher-order
    filter+size over an inlined literal array, no UDF. Used for
    Z-ordering skewed columns where linear min/max scaling would cram
    most rows into a few codes."""
    arr = F.array(*[F.lit(float(b)) for b in boundaries])
    c = col.cast("double")
    return F.size(F.filter(arr, lambda b: c > b)).cast("long")


def morton_interleave(
    cols_with_bounds: list[tuple[Column, float, float]],
    bits: int = 16,
) -> Column:
    """Z-order (Morton) key: each column is linearly scaled to
    `bits`-bit space using its (lo, hi) bounds, then the columns' bits
    are interleaved — bit i of column j lands at position
    i*ncols + j. A pure shift/mask Catalyst expression tree (no UDF),
    used by `LocustDB.save_zordered` and `VersionedTable.cluster` to
    make min/max file stats tight on EVERY curve column.

    `bits` is capped at 63 // ncols: interleaved bits past position 62
    would land in (or beyond) the long sign bit, producing negative /
    aliased keys that silently scramble repartitionByRange ordering —
    with 4 columns the effective default is 15 bits per column."""
    ncols = max(1, len(cols_with_bounds))
    bits = min(bits, 63 // ncols)
    if bits < 1:
        raise ValueError(
            f"morton_interleave: {ncols} columns cannot share a 63-bit "
            "key with >=1 bit each")
    scaled = []
    for col, lo, hi in cols_with_bounds:
        span = (hi - lo) or 1.0
        scaled.append(F.least(
            F.lit((1 << bits) - 1),
            ((col.cast("double") - F.lit(lo)) / F.lit(span)
             * F.lit((1 << bits) - 1)).cast("long"),
        ))
    morton = F.lit(0)
    for i in range(bits):
        for j, s in enumerate(scaled):
            morton = morton.bitwiseOR(
                F.shiftleft(
                    F.shiftright(s, i).bitwiseAND(F.lit(1)),
                    i * len(scaled) + j,
                )
            )
    return morton


def build_zorder_key(df, cols: list[str], bits: int = 16,
                     equi_depth: bool = False) -> Column:
    """Morton key over `cols` of `df`, ready for repartitionByRange +
    sortWithinPartitions. Linear mode scales each column by its
    (min, max) — one aggregate job; equi-depth mode ranks each column
    into 2^k quantile buckets (k = min(bits, 8), boundaries from one
    approxQuantile pass) so heavily skewed columns still spread across
    the curve instead of cramming into a few codes."""
    if equi_depth:
        k = min(bits, 8)
        n = 1 << k
        probs = [i / n for i in range(1, n)]
        # one pass computes boundaries for every column
        bounds = df.stat.approxQuantile(
            [c for c in cols], probs, 0.001)
        return morton_interleave(
            [(equi_depth_bucket(F.col(c).cast("double"), bs),
              0.0, float(n - 1))
             for c, bs in zip(cols, bounds)],
            bits=k,
        )
    stats = df.agg(*[
        f(F.col(c).cast("double")).alias(f"{c}__{nm}")
        for c in cols for nm, f in (("min", F.min), ("max", F.max))
    ]).head()
    return morton_interleave(
        [(F.col(c), stats[f"{c}__min"], stats[f"{c}__max"])
         for c in cols],
        bits=bits,
    )


def to_year(col: Column, is_timestamp: bool = False) -> Column:
    """Calendar year of a unix-seconds epoch column (reference
    functions.rs:8-13). Pass is_timestamp=True when the column is
    already a Spark timestamp."""
    if is_timestamp:
        return F.year(col).cast("long")
    return F.year(F.timestamp_seconds(col)).cast("long")


def length_bytes(col: Column) -> Column:
    """BYTE length of a string (reference functions.rs:45-50 measures
    bytes, not characters — `octet_length`, not `length`)."""
    return F.octet_length(col).cast("long")


def regex_match(col: Column, pattern: str) -> Column:
    """Boolean regex match (reference functions.rs:30-42). The pattern
    is a plan-time literal in the reference; keep it a Python str so
    Catalyst compiles it once."""
    return col.rlike(pattern)


def floor_int(col: Column) -> Column:
    """Float → int floor (reference functions.rs:15-20)."""
    return F.floor(col)


def int_div(left: Column, right: Column) -> Column:
    """Truncating i64 division — Rust `/` semantics (reference
    query_plan.rs:826-839). Spark's `div` truncates toward zero like
    Rust; plain `/` would promote to double."""
    return F.call_function("div", left, right)


def like_pattern_to_regex(pattern: str) -> str:
    """SQL LIKE pattern → regex, the reference's plan-time rewrite
    (query_plan.rs:1236-1294): `%` → `.*`, `_` → `.`, everything else
    escaped. Exposed for clients that need the rewrite outside Spark
    (e.g. pushing a LIKE into an external system)."""
    import re

    out = []
    for ch in pattern:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"
