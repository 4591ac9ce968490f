"""SparkSession factory tuned for the LocustDB-on-Spark engine.

Reference behavior being reproduced (cswinter/LocustDB):
- overflow-checked arithmetic / SUM (src/engine/operators/numeric_operators.rs,
  query_plan.rs:691-707) -> spark.sql.ansi.enabled=true
- aggressive per-column compression (src/mem_store/column.rs:116-126) ->
  Parquet zstd + dictionary + AQE.

Design for scale: these settings are the single place where cluster-level
tuning lives.  On a real cluster, shuffle partitions should be ~2-3x total
cores and maxPartitionBytes sized so a task's working set fits in executor
memory; AQE coalesces and handles skew at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "locustdb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    ansi: bool = True,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's tuned defaults."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # Python workers must be able to import this package (colgen /
    # pipeline operators ship generator objects to executors). Locally
    # that means the package root on PYTHONPATH (workers inherit the
    # driver's environment); on a real cluster, distribute the package
    # with --py-files / pip instead.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
        )
    # In local mode the driver JVM IS the cluster: caches, shuffle
    # buffers, and result collection all live in its heap, and Spark's
    # 1 GiB default turns into GC thrash / cache spill at a few million
    # rows. 28g stays under the 32 GiB compressed-oops threshold —
    # above it every JVM pointer doubles and cache-heavy workloads get
    # measurably slower. Override via SPARK_GRAFT_DRIVER_MEM; ignored
    # for a remote master where executors own the data.
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "28g")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.driver.memory", driver_mem)
        .config("spark.driver.maxResultSize", "8g")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # this is what turns a static 32-partition plan into a sane one.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any pandas_udf path (dedup/similarity/multimodal ops).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # toPandas result delivery: the default ("legacy") struct
        # handling converts column-by-column through a slow fallback
        # path — ~14x slower on multi-million-row results. "row" keeps
        # the pure-Arrow conversion. (Struct columns arrive as dicts
        # instead of Row objects; the engine returns scalars only.)
        .config("spark.sql.execution.pandas.structHandlingMode", "row")
        # Arrow result batches: the 10k-row default fragments a
        # multi-million-row toPandas into thousands of RecordBatches
        # whose per-batch overhead dominates the fetch (measured at a
        # 21M-group aggregate: 2.0s -> 1.0s with 128k+ batches). 128k
        # rows keeps worst-case per-batch memory modest even for wide
        # string results (vs 1M+, which only pays off for narrow
        # numeric frames — bench harnesses may raise it per-workload).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        # Runtime bloom-filter pruning: for selective joins, build a
        # bloom filter on the small side and push it into the big
        # side's scan — at 100 TB this skips row groups that cannot
        # match before they're read.
        # (runtimeFilter.semiJoinReduction is deliberately NOT set: on
        # this Spark build merely setting the conf hangs SparkSession
        # startup; the bloom-filter runtime filter above is the one
        # that matters for scan pruning.)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        # Bigger in-memory-cache batches keep whole-stage codegen in
        # one columnar batch longer (~1.4x on cached low-cardinality
        # group-bys vs the 10k default; analogous to the reference's
        # 65536-row partitions). 256k/1M measured no reliable further
        # gain at 105M rows once JIT warm-up ordering was controlled
        # (ABA runs), so keep the smaller per-batch footprint.
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "65536")
        # Vectorized first-level hash map for partial aggregation:
        # ~1.3-1.9x on low-cardinality group-bys (measured at 105M rows:
        # count-by-int-key 2.8 -> 4.1 G rows/s, sum 3.5 -> 4.7). Off by
        # default in Spark only out of conservatism; keys/values here are
        # always the fixed-width types it supports.
        .config("spark.sql.codegen.aggregate.map.vectorized.enable", "true")
        # Parquet encodings ~= LocustDB's dict/delta/lz4/pco column codecs.
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Overflow parity: checked arithmetic like the reference engine.
        .config("spark.sql.ansi.enabled", str(ansi).lower())
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cluster_conf(
    target_input_tb: float = 100.0,
    executors: int = 1000,
    executor_cores: int = 4,
) -> dict[str, str]:
    """Recommended conf overrides for a real cluster deployment,
    derived from the workload size instead of guessed constants. Local
    runs ignore this; submit with e.g.

        spark-submit --conf $(k=v pairs from this dict) ...

    Sizing logic (the numbers the 100 TB design depends on):
    - shuffle partitions ~= min(50k, input_bytes / 200 MB): keeps a
      shuffle partition's spill-free working set near the per-core
      memory share while bounding scheduler pressure; AQE coalesces
      the ones that end up small.
    - files.maxPartitionBytes 256 MB: fewer, fatter scan tasks — row
      groups stay intact and per-task overhead amortizes.
    - broadcast threshold 64 MB: dimension tables broadcast instead of
      shuffling the fact side (driver/executor memory at cluster scale
      absorbs 64 MB easily).
    - AQE advisory 128 MB: post-shuffle partitions coalesce to the
      same per-task target.
    """
    input_bytes = target_input_tb * 1e12
    shuffle_parts = int(min(50_000, max(
        executors * executor_cores * 2, input_bytes / 200e6)))
    return {
        "spark.sql.shuffle.partitions": str(shuffle_parts),
        "spark.sql.files.maxPartitionBytes": str(256 * 1024 * 1024),
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes":
            str(128 * 1024 * 1024),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # skewed partitions split when > 5x median and > 256 MB
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "5",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            str(256 * 1024 * 1024),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.sql.ansi.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }
