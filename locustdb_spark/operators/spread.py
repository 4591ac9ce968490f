"""Input-parallelism guard for compute-bound per-row operators.

The failure mode this exists for (OPTIMIZATION_r12.md, guide §2.5
"input skew"): a whole documents/embeddings table at gate/sweep scale
fits in one or two 128 MB parquet splits, so a compute-bound
projection (interpreted higher-order-function chains, Arrow kernels,
mapInPandas codecs) runs on 1-2 cores of local[32] — measured 16x
slowdowns (multimodal_h264_gop 226.9 s at sf1 on ~2 splits vs ~14 s
of spread CPU). Spark's split planning cannot see per-row compute
cost: `maxSplitBytes` is floored by `openCostInBytes` (4 MB), so a
6 MB file never yields more than ~2 splits no matter the core count.

`spread_small_scan` repartitions the input up to
`sparkContext.defaultParallelism` ONLY when the scan is starved
(fewer partitions than cores). It is scale-adaptive by construction:

- At 100 TB a corpus scan arrives in thousands of splits, the guard
  is a no-op, and no exchange is added — the heavy operators stay
  map-only over the scan.
- At gate scale the added RoundRobin exchange moves the small input
  once (documents at sf1 ~6 MB) and buys a cores-x speedup of the
  compute stage.
- The driver's low-core bench rerun is honored automatically:
  `defaultParallelism` follows `local[$SPARK_GRAFT_CPUS]`, nothing is
  hard-coded.

Streaming DataFrames expose no `.rdd` and micro-batch sizing is the
source's job, so the guard skips them (same contract as the original
minhash-local copy of this logic, now shared).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame) -> DataFrame:
    """Repartition `df` to `defaultParallelism` iff it currently has
    fewer partitions (no-op on streaming inputs and on any input that
    already has at least one split per core)."""
    if df.isStreaming:
        return df
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        df = df.repartition(parallelism)
    return df
