"""Port of the reference's committed benchmark suite
(reference benches/basic.rs:22-138, results in BASELINE.md): generates
the NYC-taxi-shaped `trips` tables with colgen and times the ten
baseline queries through the LocustDB dialect.

Usage:
    python scripts/bench_reference.py [e6|e7|e8 ...]   (default: e6 e7)

Prints one JSON line per table scale:
    {"table": "trips_e7", "rows": N, "queries": {name: {"sec": s,
     "rows_per_s": r}}}

The reference benches in-memory tables (BASELINE.md config), so the
generated DataFrame is cached before timing; timings are best-of-3
(the reference's cargo-bench convention).
"""

from __future__ import annotations

import json
import os
import sys
import time

# Resolve the repo root by this file's location, not CWD (r7,
# ADVICE): with "." the bench.py import below only worked when run
# from the repo root, and failed mid-benchmark AFTER timings were
# collected when run from anywhere else. Importing at module top
# makes a broken path fail before any work is done.
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))

from bench import host_calibration  # noqa: E402
from locustdb_spark import LocustDB, get_spark  # noqa: E402
from locustdb_spark.sources import colgen  # noqa: E402

SCALES = {
    # name -> (partitions, partition_size); benches/basic.rs:22-24
    "e6": (64, 1 << 14),
    "e7": (80, 1 << 17),
    "e8": (100, 1 << 20),
}

STEP67 = list(range(1, 4000, 67))

COLUMNS = [
    ("total_amount", colgen.int_uniform(-1000, 50_000)),
    ("pickup_datetime", colgen.splayed(1_200_000_000, 3)),
    ("uniform_u32", colgen.int_uniform(0, 2**32 - 1)),
    ("trip_id", colgen.incrementing_int()),
    ("passenger_count", colgen.int_weighted(
        [0, 1, 2, 4, 5, 6, 7, 8, 9, 208],
        [4.0, 1000.0, 200.0, 60.0, 30.0, 95.0, 34.0, 1.0, 1.0, 0.001])),
    ("vendor_id", colgen.string_weighted(
        ["1", "2", "3", "CMT", "DDS", "VTS"],
        [195.0, 260.0, 0.006, 493.0, 142.0, 503.0])),
    ("reducible1", colgen.int_weighted(STEP67, [1.0] * len(STEP67))),
    ("reducible2", colgen.int_weighted(STEP67, [1.0] * len(STEP67))),
    ("cab_type", colgen.string_markov_chain(
        ["green", "yellow"], [[1.0, 0.0], [0.0, 1.0]])),
]

# benches/basic.rs:88-138 (same order as BASELINE.md)
QUERIES = {
    "count_by_passenger_count":
        "select passenger_count, count(1) as cnt from {t}",
    "sum_total_amt_by_passenger_count":
        "select passenger_count, sum(total_amount) as s from {t}",
    "count_by_vendor_id_and_passenger_count":
        "select vendor_id, passenger_count, count(1) as cnt from {t}",
    "count_cab_type":
        "select cab_type, count(0) as cnt from {t}",
    "avg_total_amount_by_passenger_count":
        "select passenger_count, count(0) as cnt, "
        "sum(total_amount) as s from {t}",
    "count_by_passenger_count_pickup_year_trip_distance":
        "select passenger_count, to_year(pickup_datetime) as yr, "
        "total_amount / 1000 as td, count(0) as cnt from {t}",
    "sparse_filter":
        "select trip_id from {t} where (passenger_count = 0) "
        "and (vendor_id = 'DDS') and (total_amount < 500) "
        "and (cab_type = 'green') limit 100",
    "top_n":
        "select total_amount from {t} order by total_amount desc limit 100",
    "hashmap_grouping":
        "select passenger_count, reducible1, reducible2, count(0) as cnt "
        "from {t}",
    "group_by_trip_id":
        "select trip_id / 5 as g, sum(total_amount) as s from {t}",
}


def main() -> None:
    scales = [s for s in sys.argv[1:] if s in SCALES] or ["e6", "e7"]
    spark = get_spark(app_name="bench-reference")
    # Cache compression stays ON here: the e8 table uncompressed (~7 GB of
    # raw vectors + codegen working memory) does not reliably fit the
    # storage pool, and evicted partitions re-read from disk at ~0.4 s per
    # query — far worse than the ~1.3x decode cost. The reference's own
    # config is mem_lz4 compressed too (BASELINE.md).
    db = LocustDB(spark=spark)

    for scale in scales:
        parts, psize = SCALES[scale]
        name = f"trips_{scale}"
        df = colgen.gen_table_df(spark, COLUMNS, parts, psize)
        df.cache()
        n = df.count()  # materialize the cache (reference: in-memory table)
        db.register_df(name, df)
        # Same sizing rule as bench.py: below ~1 GB of input a handful of
        # shuffle partitions keeps stage latency low and AQE's per-stage
        # re-planning (~100 ms/job here) costs more than it saves; its
        # value (coalescing/skew-splitting multi-GB shuffles) only exists
        # at scale, so e6/e7 disable it and e8 keeps it on.
        small = n * 72 < 1e9  # ~72 B/row across the 9 columns
        spark.conf.set("spark.sql.adaptive.enabled",
                       "false" if small else "true")
        # e8: 64 partitions (2x cores) lets AQE balance the 21M-group
        # shuffle of group_by_trip_id without starving the small-result
        # queries; measured neutral-to-better on the other nine.
        spark.conf.set("spark.sql.shuffle.partitions",
                       "8" if small else "64")
        # This suite's biggest result set (group_by_trip_id at e8) is
        # 21M narrow numeric rows; 1M-row Arrow batches cut the fetch
        # ~2x vs the engine's 128k default (safe here — no wide string
        # results).
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch",
                       "1048576")

        # The reference's cargo-bench numbers are ns/iter in a
        # long-lived, fully-JIT-warmed process. Matching that takes two
        # levels of warm-up here: per-query warm iterations (C2-compile
        # this query's codegen), and a whole-suite warm pass first —
        # shared JVM paths (scheduler, cache scan, Arrow transfer) keep
        # speeding up for minutes of process life, and an A/B/A
        # experiment showed the same plan+config 1.9x faster in an aged
        # JVM than in a fresh one. Each timed run is still a full job:
        # scan, shuffle, agg, Arrow fetch.
        out = {}
        warmups = int(os.environ.get("BENCH_WARMUPS", "12"))
        for benched_pass in range(2):
            for qname, sql in QUERIES.items():
                qdf = db.sql(sql.format(t=name))
                for _ in range(warmups):
                    qdf.toPandas()
                best = float("inf")
                for _ in range(5):
                    t0 = time.perf_counter()
                    qdf.toPandas()
                    best = min(best, time.perf_counter() - t0)
                out[qname] = {"sec": round(best, 4),
                              "rows_per_s": int(n / best)}
        # r6: attach the fixed-workload host probes (bench.py) so a
        # cross-round ratio drift is attributable to the host vs the
        # plan without a separate investigation
        print(json.dumps({"table": name, "rows": n, "queries": out,
                          "host_calibration": host_calibration(spark)}),
              flush=True)
        df.unpersist()


if __name__ == "__main__":
    main()
