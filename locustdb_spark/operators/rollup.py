"""Incremental rollup maintenance: a persisted aggregate table over an
append-only fact table, refreshed by scanning ONLY newly-appended files.

This is the batch analog of the reference's WAL flush → partition merge
cycle (reference src/scheduler/inner_locustdb.rs:334-430 `wal_flush`,
src/engine/execution/batch_merging.rs MergeAggregate): the reference
keeps per-partition aggregates mergeable so queries combine them
pairwise; here the *stored rollup itself* is the merged partial, and
each maintenance round folds the new partitions in.

Scale shape: maintenance cost is O(appended data), not O(corpus). At
100 TB with a 0.1% daily append, a refresh reads ~100 GB instead of
re-aggregating 100 TB — the same reason the reference flushes its WAL
incrementally instead of re-batching every partition. All supported
aggregates (sum / count / min / max, avg derived as sum/count at read
time) are commutative monoids, so merging stored partials with new
partials is exact, not approximate.

Storage: the rollup lives in plain parquet next to a JSON manifest
listing every fact file already folded in. The swap is
write-new-then-rename, so a crashed maintenance run leaves the previous
rollup + manifest intact (re-running redoes only the interrupted round).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# aggregate -> (partial column builder, merge function over partials)
_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing
    "min": F.min,
    "max": F.max,
}


class IncrementalRollup:
    """Maintains ``rollup_dir`` = groupBy(keys).agg(aggs) over the
    parquet files of ``fact_dir``.

    ``aggs``: mapping of output column -> (func, fact column) with func
    in {sum, count, min, max}. ``avg`` is intentionally absent — store
    sum and count, divide at read time (averages are not mergeable).
    """

    def __init__(
        self,
        spark: SparkSession,
        fact_dir: str,
        rollup_dir: str,
        keys: list[str],
        aggs: dict[str, tuple[str, str]],
    ):
        for out, (func, _col) in aggs.items():
            if func not in _MERGE:
                raise ValueError(
                    f"{out}: {func} is not mergeable; store sum+count "
                    f"and derive it at read time")
        self.spark = spark
        self.fact_dir = fact_dir
        self.rollup_dir = rollup_dir
        self.keys = list(keys)
        self.aggs = dict(aggs)

    # ------------------------------------------------------------------

    def _manifest_path(self) -> str:
        return os.path.join(self.rollup_dir, "_processed_files.json")

    def _processed(self) -> set[str]:
        try:
            with open(self._manifest_path()) as f:
                return set(json.load(f))
        except FileNotFoundError:
            return set()

    def _fact_files(self) -> list[str]:
        if not os.path.isdir(self.fact_dir):
            return []
        return sorted(
            os.path.join(self.fact_dir, f)
            for f in os.listdir(self.fact_dir)
            if f.endswith(".parquet")
        )

    def _data_dir(self) -> str | None:
        link = os.path.join(self.rollup_dir, "CURRENT")
        try:
            with open(link) as f:
                return os.path.join(self.rollup_dir, f.read().strip())
        except FileNotFoundError:
            return None

    # ------------------------------------------------------------------

    def _partial(self, df: DataFrame) -> DataFrame:
        """Aggregate a slice of the fact table into partial form."""
        exprs = [
            getattr(F, func)(F.col(col)).alias(out)
            for out, (func, col) in self.aggs.items()
        ]
        return df.groupBy(*self.keys).agg(*exprs)

    def _merge(self, parts: DataFrame) -> DataFrame:
        exprs = [
            _MERGE[func](F.col(out)).alias(out)
            for out, (func, _col) in self.aggs.items()
        ]
        return parts.groupBy(*self.keys).agg(*exprs)

    def maintain(self) -> dict:
        """Fold any new fact files into the rollup. Returns stats:
        {"new_files": n, "total_files": m, "refreshed": bool}."""
        processed = self._processed()
        files = self._fact_files()
        new = [f for f in files if f not in processed]
        if not new:
            return {"new_files": 0, "total_files": len(files),
                    "refreshed": False}

        fresh = self._partial(self.spark.read.parquet(*new))
        current = self._data_dir()
        if current is not None:
            stored = self.spark.read.parquet(current)
            merged = self._merge(stored.unionByName(fresh))
        else:
            merged = self._merge(fresh)

        # write-new-then-swap: the old generation stays readable until
        # the CURRENT pointer flips (single rename = atomic on POSIX)
        os.makedirs(self.rollup_dir, exist_ok=True)
        gen = f"gen-{uuid.uuid4().hex[:12]}"
        merged.write.mode("overwrite").parquet(
            os.path.join(self.rollup_dir, gen))
        tmp_ptr = os.path.join(self.rollup_dir, f".CURRENT.{gen}")
        with open(tmp_ptr, "w") as f:
            f.write(gen)
        os.replace(tmp_ptr, os.path.join(self.rollup_dir, "CURRENT"))
        tmp_mf = self._manifest_path() + f".{gen}"
        with open(tmp_mf, "w") as f:
            json.dump(sorted(processed | set(new)), f)
        os.replace(tmp_mf, self._manifest_path())
        if current is not None:
            shutil.rmtree(current, ignore_errors=True)
        return {"new_files": len(new), "total_files": len(files),
                "refreshed": True}

    def read(self) -> DataFrame:
        """The current rollup (partial form: counts are counts, sums are
        sums; derive averages as sum/count)."""
        current = self._data_dir()
        if current is None:
            raise FileNotFoundError(
                f"rollup at {self.rollup_dir} has never been maintained")
        return self.spark.read.parquet(current)
