"""bench.py rot guard: every benchmark query must compile through the
dialect and execute at sf0.001. Keeps the driver-facing harness from
breaking silently when the dialect or operators evolve."""

import os
import sys

import pytest
from pyspark.sql import functions as F

from conftest import TESTDATA_SF

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def bench_db(spark):
    from locustdb_spark import LocustDB

    db = LocustDB(spark=spark)
    for t in ("lineitem", "orders", "customer", "documents", "embeddings"):
        db.register_parquet(t, f"{TESTDATA_SF}/{t}.parquet")
    return db


def test_all_bench_queries_run(bench_db):
    import bench

    for name, sql in bench.dialect_queries().items():
        rows = bench_db.sql(sql).limit(5).collect()
        assert isinstance(rows, list), name


def test_bench_operator_headliners_run(spark, bench_db):
    from locustdb_spark.operators.dedup import minhash_signatures
    from locustdb_spark.operators.events import funnel
    from locustdb_spark.operators.similarity import cosine_topk, knn_join

    docs = bench_db.snapshot("documents")
    assert minhash_signatures(docs, num_hashes=8).limit(3).count() == 3
    emb = bench_db.snapshot("embeddings")
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head().embedding]
    assert cosine_topk(emb, qv, k=3).count() == 3
    assert knn_join(emb, emb.filter(F.col("vec_id") % 97 == 0),
                    k=3).count() > 0
    ev = spark.read.parquet(f"{TESTDATA_SF}/events.parquet")
    assert funnel(ev, ["view", "click", "purchase"]).count() == 3


def test_registry_oracle_parity():
    """Registry integrity (r6): since r4 every queries() entry is
    value-hash gated, so queries() and oracle_sql() must stay in
    exact key bijection — an entry added to one side without the
    other silently downgrades the driver gate to rows-only (or dies
    at gate time). Also pins the rotation invariants: the rotated
    order is a permutation of the full registry, and the 50-entry
    prefix mixes at least two tiers."""
    import __spark_entry__ as entry

    q = set(entry.queries().keys())
    o = set(entry.oracle_sql().keys())
    assert q == o, (sorted(q - o), sorted(o - q))
    order = list(entry.queries().keys())
    assert len(order) == len(set(order))
    pipeline_prefixes = ("dedup_", "pipeline_", "text_", "sample_",
                        "sim_", "multimodal_")
    tiers = {("pipe" if k.startswith(pipeline_prefixes) else
              ("x" if k.startswith("x_") else "dial"))
             for k in order[:50]}
    assert len(tiers) >= 2, tiers
