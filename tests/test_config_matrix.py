"""Config-matrix analog of the reference's test_query_ec harness
(reference tests/query_tests.rs:31-81): the same query corpus must
return identical results under every storage/execution configuration —
tiny partitions (many parquet files), compacted storage, and a
single-reducer shuffle — exactly as the reference asserts equality
across its batch_size / max_partition_length / combine_factor matrix
and before/after force_flush."""

import os

import pytest

from conftest import DATA
from locustdb_spark import LocustDB

QUERIES = [
    "SELECT enum, count(0) FROM default",
    "SELECT enum, sum(float) FROM default",
    "SELECT nullable_int, count(0) FROM default",
    "SELECT string_packed FROM default ORDER BY string_packed LIMIT 5",
    "SELECT id, float FROM default ORDER BY float, id",
    "SELECT id / 5, count(0) FROM default",
    "SELECT count(0) FROM default WHERE nullable_int IS NOT NULL",
    "SELECT id FROM default ORDER BY id LIMIT 3 OFFSET 2",
]


def run_all(db):
    out = []
    for q in QUERIES:
        rows = db.run_query(q)["rows"]
        out.append(sorted(map(tuple, rows), key=lambda r: tuple(map(str, r))))
    return out


@pytest.fixture(scope="module")
def baseline(spark, tmp_path_factory):
    db = LocustDB(db_path=str(tmp_path_factory.mktemp("m0")), spark=spark)
    db.load_csv(os.path.join(DATA, "edge_cases.csv"), "default",
                allow_nulls=True)
    return run_all(db)


def test_tiny_partitions_match(spark, tmp_path_factory, baseline):
    """partition_size=3 -> every few rows its own parquet file."""
    db = LocustDB(db_path=str(tmp_path_factory.mktemp("m1")), spark=spark,
                  partition_size=3)
    db.load_csv(os.path.join(DATA, "edge_cases.csv"), "default",
                allow_nulls=True, partition_size=3)
    assert run_all(db) == baseline


def test_compacted_storage_matches(spark, tmp_path_factory, baseline):
    """Tiny partitions then compaction (reference wal_flush + combine)."""
    db = LocustDB(db_path=str(tmp_path_factory.mktemp("m2")), spark=spark,
                  partition_size=3)
    db.load_csv(os.path.join(DATA, "edge_cases.csv"), "default",
                allow_nulls=True, partition_size=3)
    db.compact("default")
    assert run_all(db) == baseline


def test_single_reducer_matches(spark, tmp_path_factory, baseline):
    """shuffle.partitions=1 — merge order must not affect results."""
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try:
        db = LocustDB(db_path=str(tmp_path_factory.mktemp("m3")),
                      spark=spark)
        db.load_csv(os.path.join(DATA, "edge_cases.csv"), "default",
                    allow_nulls=True)
        assert run_all(db) == baseline
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def test_buffered_rows_match_flushed(spark, tmp_path_factory, baseline):
    """Rows ingested through the write buffer (pre-flush) must answer
    queries identically to the same rows after force_flush."""
    import csv as csvmod

    with open(os.path.join(DATA, "edge_cases.csv")) as f:
        rdr = csvmod.DictReader(f)
        raw = list(rdr)

    def coerce(v):
        if v == "":
            return None
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v

    rows_ = [{k: coerce(v) for k, v in r.items()} for r in raw]
    db = LocustDB(db_path=str(tmp_path_factory.mktemp("m4")), spark=spark)
    db.ingest("default", rows_)
    pre = run_all(db)
    db.force_flush()
    post = run_all(db)
    assert pre == post
