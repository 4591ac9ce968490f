"""Persistence / restart tests (reference tests/ingestion_test.rs:
restore from disk, WAL recovery, compaction survival)."""

import pytest

from locustdb_spark.engine import LocustDB
from locustdb_spark.sources import colgen


def q(db, sql):
    return sorted(map(tuple, db.run_query(sql)["rows"]))


def test_restore_after_restart(spark, tmp_path):
    path = str(tmp_path / "db")
    db = LocustDB(spark=spark, db_path=path)
    db.ingest("t", [{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    db.force_flush()
    expected = q(db, "SELECT k, v FROM t")

    db2 = LocustDB(spark=spark, db_path=path)
    assert q(db2, "SELECT k, v FROM t") == expected
    assert "t" in db2.table_names()


def test_unflushed_buffer_lost_flushed_kept(spark, tmp_path):
    # The buffer is the WAL analog held in process memory; only
    # flushed data survives a "crash" (new handle). The reference
    # persists WAL segments too — our durability boundary is the
    # flush, documented in engine.py.
    path = str(tmp_path / "db")
    db = LocustDB(spark=spark, db_path=path)
    db.ingest("t", [{"v": 1}])
    db.force_flush()
    db.ingest("t", [{"v": 2}])  # not flushed

    db2 = LocustDB(spark=spark, db_path=path)
    assert q(db2, "SELECT v FROM t") == [(1,)]


def test_append_after_restart_and_compact(spark, tmp_path):
    path = str(tmp_path / "db")
    db = LocustDB(spark=spark, db_path=path, partition_size=4)
    for i in range(10):
        db.ingest("t", [{"v": i}])
        db.force_flush()

    db2 = LocustDB(spark=spark, db_path=path)
    db2.ingest("t", [{"v": 100}])
    db2.force_flush()
    before = q(db2, "SELECT v FROM t")
    assert len(before) == 11

    db2.compact("t")
    assert q(db2, "SELECT v FROM t") == before
    stats = {s["name"]: s for s in db2.table_stats()}
    assert stats["t"]["batches"] <= 2  # small files merged


def test_schema_evolution_survives_restart(spark, tmp_path):
    path = str(tmp_path / "db")
    db = LocustDB(spark=spark, db_path=path)
    db.ingest("t", [{"a": 1}])
    db.force_flush()
    db.ingest("t", [{"a": 2, "b": "x"}])
    db.force_flush()

    db2 = LocustDB(spark=spark, db_path=path)
    assert q(db2, "SELECT a, b FROM t") == [(1, None), (2, "x")]


def test_gen_table_api(spark, tmp_path):
    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    db.gen_table("g", partitions=2, partition_size=100, columns=[
        ("x", colgen.int_uniform(0, 10)),
        ("tag", colgen.string_weighted(["a", "b"], [1.0, 1.0])),
    ])
    rows = q(db, "SELECT tag, count(0) FROM g")
    assert sum(c for _, c in rows) == 200


def test_sql_extended_full_spark_sql(spark, tmp_path):
    """sql_extended: full Spark SQL (JOIN / HAVING / DISTINCT / CTEs)
    over engine tables incl. buffered rows — the growth path past the
    dialect's reference-parity restrictions, which sql() still
    enforces."""
    import pytest as _pytest

    from locustdb_spark.dialect.parser import NotImplementedQueryError

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    db.ingest("users", [{"uid": 1, "name": "ann"}, {"uid": 2, "name": "bo"}])
    db.ingest("orders2", [{"uid": 1, "amt": 10.0}, {"uid": 1, "amt": 5.0},
                          {"uid": 2, "amt": 1.0}])
    # buffered (unflushed) rows are visible to extended SQL too
    rows = db.sql_extended("""
        WITH totals AS (
          SELECT uid, sum(amt) AS total FROM orders2 GROUP BY uid
        )
        SELECT DISTINCT u.name, t.total
        FROM users u JOIN totals t ON u.uid = t.uid
        GROUP BY u.name, t.total HAVING t.total > 2
        ORDER BY u.name
    """).collect()
    assert [(r.name, r.total) for r in rows] == [("ann", 15.0)]
    # the default dialect still rejects with reference parity
    with _pytest.raises(NotImplementedQueryError):
        db.sql("SELECT name FROM users JOIN orders2 ON uid = uid")


def test_operational_surface(spark, tmp_path):
    """ast / recover / perf_counter / evict_cache / memory_only
    (reference locustdb.rs:25-211)."""
    from locustdb_spark import LocustDB

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    db.ingest("t", [{"a": 1}, {"a": 2}])
    db.force_flush()
    db.run_query("SELECT a FROM t")

    pc = db.perf_counter()
    assert pc["rows_ingested"] == 2 and pc["flushes"] == 1
    assert pc["queries"] == 1 and pc["rows_returned"] == 2

    # ast: parse tree for valid SQL, error text for invalid
    assert "a" in db.ast("SELECT a FROM t")
    assert "NotImplemented" in db.ast("SELECT a FROM t JOIN u")

    # recover: a fresh handle over the same db_path sees the table
    db2 = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    assert "t" in db2.recover()
    # no ORDER BY -> row order is partition-read order (unspecified,
    # same as the reference); compare as a set
    assert sorted(db2.run_query("SELECT a FROM t")["rows"]) == [(1,), (2,)]

    # evict_cache: cached registered views get unpersisted
    df = spark.range(5).cache()
    df.count()
    db.register_df("cached", df)
    assert db.evict_cache() == 1 and not df.is_cached

    assert LocustDB.memory_only(spark=spark).table_names() == []


def test_load_json(spark, tmp_path):
    """Batch JSON-lines load lands in the same append/flush path as
    CSV (source-matrix completeness)."""
    import json

    from locustdb_spark import LocustDB

    src = tmp_path / "ev.jsonl"
    src.write_text("\n".join(
        json.dumps({"host": f"h{i % 2}", "cpu": i / 10}) for i in range(6)))
    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    db.load_json(str(src), "metrics")
    rows = db.run_query("SELECT host, count(0) AS n FROM metrics")["rows"]
    assert sorted(rows) == [("h0", 3), ("h1", 3)]
    db.force_flush()
    assert sorted(db.run_query(
        "SELECT host, count(0) AS n FROM metrics")["rows"]) == \
        [("h0", 3), ("h1", 3)]
    assert db.perf_counter().get("json_loads") == 1


def test_ingest_sparse_nullable(spark, tmp_path):
    """Row-at-a-time ingestion where a column appears only on every
    7th row (reference ingestion_test.rs test_ingest_sparse_nullable):
    the sparse column reads as NULL elsewhere, and both filter
    formulations agree."""
    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    vals = []
    for i in range(15):
        row = {"row": float(i)}
        if i % 7 == 0:
            v = 0.1 + i
            vals.append(v)
            row["sparse_float"] = v
        db.ingest("default", [row])
    db.force_flush()
    q1 = q(db, "SELECT row, sparse_float FROM default "
              "WHERE row IS NOT NULL AND (sparse_float IS NOT NULL)")
    q2 = q(db, "SELECT row, sparse_float FROM default "
              "WHERE (sparse_float IS NOT NULL)")
    assert q1 == [(float(i * 7), v) for i, v in enumerate(vals)]
    assert q1 == q2


def test_persist_meta_tables(spark, tmp_path):
    """_meta_tables survives a restart and lists each table plus its
    _meta_columns_<t> registry (reference ingestion_test.rs
    test_persist_meta_tables)."""
    path = str(tmp_path / "db")
    db = LocustDB(spark=spark, db_path=path)
    db.ingest("qwerty", [{"value": 1.0}])
    db.ingest("asdf", [{"value": 1.0}])
    db.force_flush()

    db2 = LocustDB(spark=spark, db_path=path)
    names = {r[0] for r in db2.run_query("SELECT name FROM _meta_tables")["rows"]}
    assert {"qwerty", "_meta_columns_qwerty",
            "asdf", "_meta_columns_asdf"} <= names


def test_concurrent_queries_during_ingest(spark, tmp_path):
    """Queries racing row ingestion must each see a consistent snapshot
    (reference ingestion_test.rs test_many_concurrent_requests,
    scaled down): every result is a valid prefix count, never a crash
    or a torn read."""
    import threading

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    db.ingest("m", [{"i": 0}])
    errors = []
    counts = []

    def reader():
        try:
            for _ in range(5):
                counts.append(db.run_query("SELECT count(0) FROM m")["rows"][0][0])
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    for batch in range(10):
        db.ingest("m", [{"i": batch + 1}])
    for t in threads:
        t.join()
    assert not errors
    assert all(1 <= c <= 11 for c in counts)
    assert db.run_query("SELECT count(0) FROM m")["rows"] == [(11,)]


def test_ingest_reference_wal_segment(spark, tmp_path):
    """Replay a reference-format WAL file (packed-capnp WalSegment)
    into engine tables and query it back."""
    from locustdb_spark import LocustDB
    from locustdb_spark.sources.event_buffer import (
        ColumnData, EventBuffer, TableBuffer, WalSegment)

    seg = WalSegment(id=7, data=EventBuffer(tables={
        "walmetrics": TableBuffer(len=3, columns={
            "seq": ColumnData("i64", [0, 1, 2]),
            "v": ColumnData("sparse_f64", [4.5], [1]),
        }),
    }))
    p = tmp_path / "00007.wal"
    p.write_bytes(seg.serialize())
    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    assert db.ingest_wal_segment(str(p)) == 3
    out = db.run_query("SELECT seq, v FROM walmetrics")["rows"]
    assert sorted((r[0], r[1]) for r in out) == [
        (0, None), (1, 4.5), (2, None)]
