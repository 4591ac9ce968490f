"""Dump `.explain("formatted")` for every bench.py query into
plans/r12/<name>_<suffix>.txt (suffix = argv[1], default "before").

Reconstructs the DataFrames exactly as bench.py does (same cached
tables, same session confs) so the committed plans are the plans the
bench actually times.

Usage: python scripts/dump_bench_plans.py [before|after]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  — reuse the harness's query definitions

SUFFIX = sys.argv[1] if len(sys.argv) > 1 else "before"
# r13: optional second arg picks the round directory (default r12 for
# reproducibility of the r12 artifacts)
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "plans",
    sys.argv[2] if len(sys.argv) > 2 else "r12")
SF_DIR = bench.SF_DIR


def main() -> None:
    from pyspark.sql import functions as F

    from locustdb_spark import LocustDB, get_spark

    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="dump-bench-plans")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    db = LocustDB(spark=spark)
    spark.conf.set("spark.sql.inMemoryColumnarStorage.compressed", "false")
    tables = ("lineitem", "orders", "customer", "documents", "embeddings")
    total_mb = 0.0
    legacy = os.environ.get("BENCH_PLANS_LEGACY") == "1"
    for t in tables:
        path = f"{SF_DIR}/{t}.parquet"
        total_mb += os.path.getsize(path) / 1e6
        nparts = (max(2, min(32, int(os.path.getsize(path) / 2e6)))
                  if legacy else bench.cache_partitions(spark, path))
        df = spark.read.parquet(path).repartition(nparts).cache()
        df.count()
        db.register_df(t, df)
    if total_mb < 1000:
        spark.conf.set(
            "spark.sql.shuffle.partitions",
            "8" if legacy else
            str(bench.small_input_shuffle_partitions(spark)))
        spark.conf.set("spark.sql.adaptive.enabled", "false")

    import contextlib
    import io

    def dump(name: str, df) -> None:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT_DIR, f"{name}_{SUFFIX}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("dumped", name)

    for name, sql in bench.dialect_queries().items():
        dump(name, db.sql(sql))

    from locustdb_spark.operators.dedup import minhash_signatures
    from locustdb_spark.operators.events import funnel
    from locustdb_spark.operators.similarity import cosine_topk, knn_join

    docs = db.snapshot("documents")
    dump("dedup_minhash", bench.minhash_df(db))

    emb = db.snapshot("embeddings")
    q = [float(x)
         for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    dump("sim_cosine_topk", cosine_topk(emb, q, k=10))

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    dump("event_funnel", funnel(ev, ["view", "click", "purchase"]))

    probes = emb.filter(F.col("vec_id") % 97 == 0)
    dump("sim_knn_join", knn_join(emb, probes, k=5))


if __name__ == "__main__":
    main()
