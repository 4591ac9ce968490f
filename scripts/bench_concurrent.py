"""Concurrent-query throughput: N client threads round-robin the ten
dialect benchmark queries against shared cached tables — the
reference's actual serving workload (its HTTP server executes queries
from many clients over one shared worker pool, reference
src/server/mod.rs + scheduler/inner_locustdb.rs worker_loop).

Spark serves concurrent queries from one session natively: each
collect() is a job, jobs from different threads interleave across the
scheduler pools. FAIR mode keeps short queries from queueing behind
long ones.

Usage: python scripts/bench_concurrent.py [SF_DIR]
Prints one JSON line: {"concurrency": {"1": qps, "8": qps, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, ".")

from bench import dialect_queries  # noqa: E402
from locustdb_spark import LocustDB, get_spark  # noqa: E402

SF_DIR = (sys.argv[1] if len(sys.argv) > 1
          else os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
QUERIES_PER_LEVEL = int(os.environ.get("BENCH_CONC_QUERIES", "64"))


def main() -> None:
    spark = get_spark(
        app_name="bench-concurrent",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    db = LocustDB(spark=spark)
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()
    df.count()
    db.register_df("lineitem", df)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    sqls = list(dialect_queries().values())
    dfs = [db.sql(q) for q in sqls]
    for qdf in dfs:  # warm both codegen and the JIT
        qdf.toPandas()
        qdf.toPandas()

    def run_slice(idxs: list[int]) -> None:
        for i in idxs:
            dfs[i % len(dfs)].toPandas()

    out = {}
    for conc in (1, 4, 16):
        idxs = list(range(QUERIES_PER_LEVEL))
        chunks = [idxs[k::conc] for k in range(conc)]
        threads = [threading.Thread(target=run_slice, args=(c,))
                   for c in chunks]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        out[str(conc)] = round(QUERIES_PER_LEVEL / wall, 1)
    print(json.dumps({"metric": "concurrent dialect queries/sec",
                      "sf_dir": SF_DIR, "queries": QUERIES_PER_LEVEL,
                      "concurrency_qps": out}))


if __name__ == "__main__":
    main()
