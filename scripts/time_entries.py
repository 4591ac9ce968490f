"""Steady-state timing of __spark_entry__.queries() entries with the
noop sink (guide §1.4): build the DataFrame once (plan/build time
reported separately), then `runs` noop writes; report min and median.
Optionally dump .explain("formatted") next to the timing.

Usage: python scripts/time_entries.py <sf_dir> <name> [name ...]
       [--runs N] [--plans DIR]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402


def main() -> None:
    argv = list(sys.argv[1:])
    runs = 3
    plans_dir = None
    rebuild = False
    if "--rebuild" in argv:
        # entries that collect() internally (pagerank, persisted-index
        # probes) do their work inside fn(); re-invoke it per run
        rebuild = True
        argv.remove("--rebuild")
    if "--runs" in argv:
        i = argv.index("--runs")
        runs = int(argv[i + 1])
        del argv[i:i + 2]
    if "--plans" in argv:
        i = argv.index("--plans")
        plans_dir = argv[i + 1]
        del argv[i:i + 2]
    sf_dir, names = argv[0], argv[1:]

    from locustdb_spark import get_spark

    spark = get_spark(app_name="time-entries")
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"build:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        # force plan build (analysis) without executing
        df.schema
        build_s = time.perf_counter() - t0
        if plans_dir:
            import os

            os.makedirs(plans_dir, exist_ok=True)
            with open(f"{plans_dir}/{name}.txt", "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution
                    .ExplainMode.fromString("formatted")))
        times = []
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"run{i}:{name}")
            t0 = time.perf_counter()
            d = fn(spark, sf_dir) if rebuild else df
            d.write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        times.sort()
        out[name] = {
            "build_s": round(build_s, 3),
            "min_s": round(times[0], 3),
            "med_s": round(times[len(times) // 2], 3),
            "all": [round(t, 3) for t in times],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTALS " + json.dumps(out))


if __name__ == "__main__":
    main()
