"""Manifest-based versioned tables (locustdb_spark/versioned.py):
atomic append, time travel, reader-safe compaction, vacuum, and
crash-orphan invisibility — the consistent-snapshot contract the
reference gets from its meta store (meta_store.rs:16-102)."""

import os

import pytest


def _store(kind: str):
    from locustdb_spark.versioned import (
        ConditionalPutCommitStore, PosixCommitStore)

    return (PosixCommitStore() if kind == "posix"
            else ConditionalPutCommitStore())


@pytest.fixture(params=["posix", "condput"])
def vt(spark, tmp_path, request):
    """Every table-level test runs under BOTH commit backends: the
    POSIX os.link store and the object-store-shaped conditional-put
    store — the protocol must not silently depend on hard links."""
    from locustdb_spark import VersionedTable

    return VersionedTable(spark, str(tmp_path / "db" / "events_v"),
                          commit_store=_store(request.param))


def _rows(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def test_append_and_time_travel(spark, vt):
    v1 = vt.append(_rows(spark, 0, 10))
    v2 = vt.append(_rows(spark, 10, 25))
    assert (v1, v2) == (1, 2)
    assert vt.read().count() == 25
    assert vt.read(version=1).count() == 10
    assert sorted(r.id for r in vt.read(version=1).collect()) == list(range(10))


def test_compaction_preserves_data_and_old_versions(spark, vt):
    for i in range(4):
        vt.append(_rows(spark, i * 10, (i + 1) * 10))
    before = sorted(r.id for r in vt.read().collect())
    n_files_before = len(vt._load_manifest(vt.latest_version())["files"])
    # pin a reader to the pre-compaction version
    pinned = vt.read(version=4)
    vt.compact(target_file_mb=128)  # tiny data -> 1 file
    after = sorted(r.id for r in vt.read().collect())
    assert after == before == list(range(40))
    assert len(vt._load_manifest(vt.latest_version())["files"]) == 1
    assert n_files_before > 1
    # the pinned reader still materializes: its files were not deleted
    assert pinned.count() == 40
    assert vt.read(version=4).count() == 40


def test_compaction_is_incremental(spark, vt):
    """Only under-sized files are rewritten; right-sized files carry
    into the new manifest untouched (O(small bytes), not O(table))."""
    vt.append(_rows(spark, 0, 50_000).coalesce(1))      # one big file
    vt.append(_rows(spark, 50_000, 50_010).coalesce(1))  # small
    vt.append(_rows(spark, 50_010, 50_020).coalesce(1))  # small
    before = set(vt._load_manifest(vt.latest_version())["files"])
    sizes = {f: os.path.getsize(os.path.join(vt.data_dir, f))
             for f in before}
    big = max(sizes, key=sizes.get)
    cutoff_mb = (sizes[big] - 1) / 1024 / 1024  # big stays, smalls go
    vt.compact(target_file_mb=128, small_file_mb=cutoff_mb)
    after = vt._load_manifest(vt.latest_version())["files"]
    assert big in after                      # untouched
    assert len(after) == 2                   # big + 1 combined file
    assert vt.read().count() == 50_020
    # a no-op cutoff commits nothing
    v = vt.latest_version()
    assert vt.compact(small_file_mb=0.0) == v


def test_vacuum_removes_dropped_files_and_orphans(spark, vt):
    vt.append(_rows(spark, 0, 10))
    vt.append(_rows(spark, 10, 20))
    vt.compact()
    # simulate a crashed append: files written, manifest never committed
    orphan = os.path.join(vt.data_dir, "deadbeef-orphan.parquet")
    _rows(spark, 900, 910).coalesce(1).write.mode(
        "overwrite").parquet(orphan + ".dir")
    os.rename(
        next(os.path.join(orphan + ".dir", f)
             for f in os.listdir(orphan + ".dir") if f.endswith(".parquet")),
        orphan)
    # invisible to every committed version
    assert vt.read().count() == 20
    deleted = vt.vacuum(keep_last=1, retention_seconds=0)
    assert "deadbeef-orphan.parquet" in deleted
    assert vt.read().count() == 20          # latest unaffected
    with pytest.raises(ValueError):
        vt.read(version=1)                  # retired by vacuum
    # all remaining files are referenced by the kept manifest
    live = set(vt._load_manifest(vt.latest_version())["files"])
    on_disk = {f for f in os.listdir(vt.data_dir) if f.endswith(".parquet")}
    assert on_disk == live


def test_manifest_file_skipping(spark, vt):
    """read(where=...) prunes files via manifest [min,max] stats —
    no footer reads at query time; files without stats are kept."""
    vt.append(_rows(spark, 0, 100).coalesce(1))
    vt.append(_rows(spark, 100, 200).coalesce(1))
    vt.append(_rows(spark, 200, 300).coalesce(1))
    pruned = vt.read(where={"id": (120, 130)})
    assert len(pruned.inputFiles()) == 1          # only the middle file
    assert pruned.count() == 100                  # pruning, not filtering
    assert pruned.filter("id BETWEEN 120 AND 130").count() == 11
    # a range overlapping nothing -> empty frame with the right schema
    empty = vt.read(where={"id": (10_000, 20_000)})
    assert empty.count() == 0 and "id" in empty.columns
    # unknown column -> conservatively keep everything
    assert vt.read(where={"nope": (0, 1)}).count() == 300
    # stats carry forward through later commits for untouched files
    vt.append(_rows(spark, 300, 310).coalesce(1))
    assert len(vt.read(where={"id": (120, 130)}).inputFiles()) == 1


def test_cluster_makes_stats_tight_on_second_dimension(spark, vt):
    """cluster() (OPTIMIZE-ZORDER analog): after Morton-clustering on
    (id, v), a manifest-stat range filter on the SECOND dimension
    prunes most files — the combination of z-order + manifest skipping."""
    df = spark.range(0, 4000).selectExpr(
        "id", "CAST((id * 7919) % 1000 AS LONG) AS v")
    vt.append(df)
    vt.cluster(["id", "v"], num_files=16)
    pruned = vt.read(where={"v": (0, 99)})
    assert 0 < len(pruned.inputFiles()) <= 8
    assert pruned.filter("v < 100").count() == \
        df.filter("v < 100").count() > 0
    assert vt.read().count() == 4000


def test_stats_cols_narrowing(spark, tmp_path):
    """stats_cols limits manifest stats to the named columns; ranges
    on unlisted columns conservatively keep every file."""
    from locustdb_spark import VersionedTable

    t = VersionedTable(spark, str(tmp_path / "narrow"),
                       stats_cols=["id"])
    t.append(_rows(spark, 0, 100).coalesce(1))
    t.append(_rows(spark, 100, 200).coalesce(1))
    stats = t._load_manifest(t.latest_version())["stats"]
    assert all(set(s) == {"id"} for s in stats.values())
    assert len(t.read(where={"id": (0, 50)}).inputFiles()) == 1
    assert len(t.read(where={"v": (0, 50)}).inputFiles()) == 2  # kept


def test_equi_depth_bucket_known_values(spark):
    from pyspark.sql import functions as F

    from locustdb_spark.functions import equi_depth_bucket

    df = spark.createDataFrame([(5,), (15,), (30,), (31,)], "x long")
    out = [r.b for r in df.select(
        equi_depth_bucket(F.col("x"), [10.0, 20.0, 30.0]).alias("b")
    ).collect()]
    assert out == [0, 1, 2, 3]  # strictly-greater boundary semantics


def test_cluster_equi_depth_skewed_column(spark, vt):
    """v = id^2 is heavily skewed; equi-depth clustering still yields
    tight per-file stats so a mid-mass v-slice prunes most files, and
    the clustered table stays identical."""
    df = spark.range(0, 4096).selectExpr("id", "id * id AS v")
    vt.append(df)
    vt.cluster(["id", "v"], num_files=16, equi_depth=True)
    lo, hi = 1024 ** 2, 2048 ** 2 - 1      # quartile-to-median mass
    pruned = vt.read(where={"v": (lo, hi)})
    assert 0 < len(pruned.inputFiles()) <= 8
    assert pruned.filter(f"v BETWEEN {lo} AND {hi}").count() == \
        df.filter(f"v BETWEEN {lo} AND {hi}").count() > 0
    assert vt.read().count() == 4096


def test_append_if_absent_is_idempotent(spark, vt):
    vt.append_if_absent(_rows(spark, 0, 10), key="id")
    # replay the same batch + 5 new rows: only the new rows land
    vt.append_if_absent(_rows(spark, 0, 15), key="id")
    assert vt.read().count() == 15
    assert sorted(r.id for r in vt.read().collect()) == list(range(15))
    # full replay commits an empty delta but stays consistent
    vt.append_if_absent(_rows(spark, 0, 15), key="id")
    assert vt.read().count() == 15


def test_versioned_live_dialect_binding(spark, tmp_path):
    """db.versioned(name) registers a LIVE dialect table: each query
    resolves the latest committed version, no re-registration after
    appends or maintenance."""
    from locustdb_spark import LocustDB

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    t = db.versioned("vlive")
    t.append(spark.range(5).selectExpr("id AS a"))
    assert db.run_query("SELECT count(0) FROM vlive")["rows"] == [(5,)]
    t.append(spark.range(5, 12).selectExpr("id AS a"))
    assert db.run_query("SELECT count(0) FROM vlive")["rows"] == [(12,)]
    t.compact()
    assert db.run_query("SELECT sum(a) FROM vlive")["rows"] == [(66,)]
    assert "vlive" in db.table_names()
    assert db.versioned("vlive") is t          # same handle
    db.table_stats()                           # doesn't choke on it


def test_txn_id_makes_append_exactly_once(spark, vt):
    """A replayed append (same or older txn_id) is a no-op — the
    crashed-between-sink-and-checkpoint case of foreachBatch."""
    v1 = vt.append(_rows(spark, 0, 10), txn_id=0)
    assert vt.append(_rows(spark, 0, 10), txn_id=0) == v1  # replay
    assert vt.read().count() == 10
    vt.append(_rows(spark, 10, 20), txn_id=1)
    assert vt.append(_rows(spark, 0, 20), txn_id=0) == 2   # stale replay
    assert vt.read().count() == 20


def test_stream_ingest_versioned_exactly_once(spark, tmp_path):
    """End-to-end: JSON stream -> VersionedTable with batch-id txn;
    restarting the drained query appends nothing."""
    import json as _json

    from locustdb_spark import LocustDB
    from locustdb_spark.streaming.streams import stream_ingest_versioned

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text("\n".join(
        _json.dumps({"k": i}) for i in range(25)))
    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    table = db.versioned("stream_v")
    for _ in range(2):  # second run: checkpoint says all-caught-up
        q = stream_ingest_versioned(
            spark, str(src), table, "k long",
            str(tmp_path / "ckpt"))
        q.awaitTermination(120)
    assert table.read().count() == 25
    # a direct replay of batch 0 is also refused by the txn guard
    v = table.latest_version()
    assert table.append(
        spark.range(99).selectExpr("id AS k"), txn_id=0) == v
    assert table.read().count() == 25


def test_schema_drift_on_append(spark, vt):
    """Later versions may add columns (schemaless ingest, reference
    raw_col.rs:58-106): old files read as NULL for the new column."""
    vt.append(spark.range(0, 5).selectExpr("id"))
    vt.append(spark.range(5, 8).selectExpr("id", "id * 10 AS extra"))
    out = vt.read()
    assert set(out.columns) == {"id", "extra"}
    rows = {r.id: r.extra for r in out.collect()}
    assert rows[0] is None and rows[7] == 70
    # time travel still sees the old shape
    assert vt.read(version=1).columns == ["id"]


def _mp_commit_worker(root, wid, n_commits, store_kind="posix"):
    """Race raw manifest commits from a separate PROCESS (the commit
    protocol is pure file ops; data files are stand-ins)."""
    from locustdb_spark.versioned import (
        ConditionalPutCommitStore, PosixCommitStore, VersionedTable)

    store = (PosixCommitStore() if store_kind == "posix"
             else ConditionalPutCommitStore())
    t = VersionedTable(None, root, commit_store=store)
    for i in range(n_commits):
        while True:
            base = t.latest_version()
            prev = t._load_manifest(base)["files"] if base else []
            v = t._commit(base, prev + [f"w{wid}-{i}.parquet"], "{}")
            if v is not None:
                break


@pytest.mark.parametrize("store_kind", ["posix", "condput"])
def test_multiprocess_commit_protocol_no_lost_updates(tmp_path,
                                                      store_kind):
    """OS-level writers (separate processes, not threads) racing the
    put-if-absent manifest commit: every commit lands exactly once —
    under the os.link backend AND the conditional-put backend."""
    import multiprocessing as mp

    from locustdb_spark.versioned import VersionedTable

    root = str(tmp_path / "mp")
    VersionedTable(None, root)  # create dirs
    ctx = mp.get_context("spawn")
    procs = [ctx.Process(target=_mp_commit_worker,
                         args=(root, w, 15, store_kind))
             for w in range(4)]
    for p in procs:
        p.start()
    for p in procs:
        p.join(120)
    assert all(p.exitcode == 0 for p in procs)
    t = VersionedTable(None, root)
    assert t.latest_version() == 60
    files = t._load_manifest(60)["files"]
    assert len(files) == 60 and len(set(files)) == 60
    # every worker's every commit is present — nothing overwritten
    assert {f"w{w}-{i}.parquet" for w in range(4) for i in range(15)} \
        == set(files)


def test_concurrent_appends_no_lost_updates(spark, tmp_path):
    """Racing writers (separate instances, shared root) must all land:
    the fails-if-exists manifest create + append retry loop means no
    commit is silently overwritten."""
    import threading

    from locustdb_spark import VersionedTable

    root = str(tmp_path / "race")
    errs = []

    def worker(offset):
        try:
            t = VersionedTable(spark, root)
            for i in range(4):
                t.append(spark.range(offset + i * 10,
                                     offset + i * 10 + 10)
                         .selectExpr("id", "id * 2 AS v"))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(k * 1000,))
               for k in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    t = VersionedTable(spark, root)
    assert t.latest_version() == 12           # all 12 commits landed
    assert t.read().count() == 120            # no rows lost
    assert len(set(r.id for r in t.read().collect())) == 120


def test_append_racing_compact_stays_consistent(spark, tmp_path):
    """Appends racing a retrying compactor: every row survives, no
    duplicates, and the final state is readable — CommitConflict only
    ever aborts the stale rewrite, never the data."""
    import threading

    from locustdb_spark import VersionedTable
    from locustdb_spark.versioned import CommitConflict

    root = str(tmp_path / "ac")
    w = VersionedTable(spark, root)
    w.append(_rows(spark, 0, 10))
    stop = threading.Event()
    errs = []

    def compactor():
        c = VersionedTable(spark, root)
        while not stop.is_set():
            try:
                c.compact(small_file_mb=10_000)
            except CommitConflict:
                continue  # stale rewrite aborted; retry
            except Exception as e:  # noqa: BLE001
                errs.append(e)
                return

    t = threading.Thread(target=compactor)
    t.start()
    try:
        for i in range(1, 6):
            w.append(_rows(spark, i * 10, (i + 1) * 10))
    finally:
        stop.set()
        t.join()
    assert not errs
    out = VersionedTable(spark, root).read()
    assert out.count() == 60
    assert len({r.id for r in out.collect()}) == 60


def test_compact_conflict_detected(spark, vt):
    """A compact() computed from a stale live set must raise
    CommitConflict, never silently drop the concurrent commit."""
    from locustdb_spark.versioned import CommitConflict

    vt.append(_rows(spark, 0, 10))
    vt.append(_rows(spark, 10, 20))
    stale = vt.latest_version
    frozen = vt.latest_version()
    vt.append(_rows(spark, 20, 30))           # concurrent writer wins
    vt.latest_version = lambda: frozen        # freeze the stale view
    try:
        with pytest.raises(CommitConflict):
            vt.compact(small_file_mb=10_000)
    finally:
        vt.latest_version = stale
    # nothing was lost: the concurrent append's rows are intact
    assert vt.read().count() == 30


def test_random_op_sequences_preserve_table_contents(spark, tmp_path):
    """Model-based check: any interleaving of append / compact /
    cluster / vacuum must leave read() equal to the union of appended
    rows — maintenance operations may reorganize files but can never
    lose, duplicate, or corrupt a row."""
    import itertools
    import tempfile

    from locustdb_spark import VersionedTable

    sequences = [
        ["append", "compact", "append", "vacuum", "cluster"],
        ["append", "append", "cluster", "compact", "vacuum", "append"],
        ["append", "vacuum", "append", "compact", "compact"],
        ["append", "cluster", "vacuum", "cluster", "append", "vacuum"],
    ]
    counter = itertools.count()
    for ops in sequences:
        vt = VersionedTable(
            spark, tempfile.mkdtemp(dir=tmp_path, prefix="model"))
        expected: set[int] = set()
        for op in ops:
            if op == "append":
                lo = next(counter) * 100
                vt.append(_rows(spark, lo, lo + 37).coalesce(2))
                expected.update(range(lo, lo + 37))
            elif op == "compact":
                vt.compact(small_file_mb=10_000)
            elif op == "cluster":
                vt.cluster(["id", "v"], num_files=3)
            elif op == "vacuum":
                vt.vacuum(keep_last=1, retention_seconds=0)
            got = sorted(r.id for r in vt.read().collect())
            assert got == sorted(expected), (ops, op)
            # v values ride along uncorrupted
            assert all(r.v == r.id * 2 for r in vt.read().collect())


def test_history_surface(spark, vt):
    vt.append(_rows(spark, 0, 10), txn_id=0)
    vt.append(_rows(spark, 10, 30), txn_id=1)
    h = vt.history()
    assert [e["version"] for e in h] == [1, 2]
    assert h[0]["num_files"] <= h[1]["num_files"]
    assert h[1]["last_txn"] == 1 and h[0]["last_txn"] == 0
    assert all(e["bytes"] > 0 for e in h)


def test_empty_version_history_raises(vt):
    with pytest.raises(ValueError):
        vt.read()


def test_append_is_atomic_under_schema(spark, vt):
    """The manifest stores the schema, so even a files-empty version
    reads with a stable schema."""
    df = _rows(spark, 0, 5)
    vt.append(df.limit(0))
    out = vt.read()
    # parquet round-trips relax nullability; names/types must hold
    assert [(f.name, f.dataType) for f in out.schema.fields] == \
        [(f.name, f.dataType) for f in df.schema.fields]
    assert out.count() == 0


def test_multiprocess_append_compact_vacuum_churn(spark, tmp_path):
    """Full maintenance churn from SEPARATE Spark driver processes
    (not threads): two workers interleave append + compact + vacuum
    against one table root while this process holds a pinned reader.
    Invariants: no lost rows, no duplicate rows, no CommitConflict
    deadlock (workers retry), and the pinned version stays readable —
    the default vacuum retention window is what protects a racing
    appender's not-yet-committed files."""
    import subprocess
    import sys
    import textwrap

    from locustdb_spark import VersionedTable

    root = str(tmp_path / "churn")
    boot = VersionedTable(spark, root)
    boot.append(_rows(spark, 900_000, 900_010))
    pinned_version = boot.latest_version()
    pinned = boot.read(version=pinned_version)

    worker_src = textwrap.dedent("""
        import sys
        sys.path.insert(0, {repo!r})
        from pyspark.sql import SparkSession
        from locustdb_spark.versioned import CommitConflict, VersionedTable

        root, wid = sys.argv[1], int(sys.argv[2])
        spark = (SparkSession.builder.master("local[2]")
                 .appName(f"churn-{{wid}}")
                 .config("spark.sql.shuffle.partitions", "2")
                 .config("spark.ui.enabled", "false")
                 .getOrCreate())
        vt = VersionedTable(spark, root)
        for i in range(6):
            lo = wid * 10_000 + i * 100
            vt.append(spark.range(lo, lo + 50)
                      .selectExpr("id", "id * 2 AS v").coalesce(1))
            if i % 2 == 0:
                try:
                    vt.compact(small_file_mb=10_000)
                except CommitConflict:
                    pass  # a concurrent commit won; not an error
            if i % 3 == 2:
                # default retention window: must never delete files a
                # racing appender just staged
                vt.vacuum(keep_last=3)
        spark.stop()
    """).format(repo="/root/repo")
    script = tmp_path / "churn_worker.py"
    script.write_text(worker_src)

    procs = [subprocess.Popen([sys.executable, str(script), root, str(w)],
                              stdout=subprocess.DEVNULL,
                              stderr=subprocess.DEVNULL)
             for w in (1, 2)]
    for p in procs:
        assert p.wait(timeout=420) == 0
    expected = set(range(900_000, 900_010))
    for w in (1, 2):
        for i in range(6):
            lo = w * 10_000 + i * 100
            expected.update(range(lo, lo + 50))
    final = VersionedTable(spark, root).read()
    got = sorted(r.id for r in final.collect())
    assert got == sorted(expected)          # nothing lost, nothing doubled
    assert all(r.v == r.id * 2 for r in final.collect())
    # the reader pinned before the churn still materializes: the
    # retention window kept its files even though the workers' vacuums
    # retired the old manifest itself (re-opening version 1 BY NUMBER
    # correctly raises after retirement — the pin is the DataFrame)
    assert pinned.count() == 10
    assert pinned_version == 1


def test_schema_conflict_promotes_int_to_string(spark, vt):
    """Appending a string column where earlier versions hold ints must
    promote (engine Int<Float<String lattice) instead of failing
    parquet mergeSchema: old files read back as strings, new batch
    lands as strings, time travel keeps the old type."""
    vt.append(spark.createDataFrame([(1, 10), (2, 20)], ["id", "x"]))
    vt.append(spark.createDataFrame([(3, "high"), (4, "low")],
                                    ["id", "x"]))
    out = vt.read()
    assert dict(out.dtypes)["x"] == "string"
    rows = {r.id: r.x for r in out.collect()}
    assert rows == {1: "10", 2: "20", 3: "high", 4: "low"}
    # time travel sees the pre-promotion type
    assert dict(vt.read(version=1).dtypes)["x"] == "bigint"


def test_schema_conflict_promotes_int_to_float(spark, vt):
    vt.append(spark.createDataFrame([(1, 10)], ["id", "x"]))
    vt.append(spark.createDataFrame([(2, 2.5)], ["id", "x"]))
    out = vt.read()
    assert dict(out.dtypes)["x"] == "double"
    assert {r.id: r.x for r in out.collect()} == {1: 10.0, 2: 2.5}


def test_schema_conflict_survives_compaction_and_skipping(spark, vt):
    """Compacting across a promotion rewrites old-typed files into the
    promoted schema; reads, counts and new appends stay consistent."""
    vt.append(spark.createDataFrame(
        [(i, i * 10) for i in range(50)], ["id", "x"]).coalesce(1))
    vt.append(spark.createDataFrame(
        [(i, f"s{i}") for i in range(50, 100)], ["id", "x"]).coalesce(1))
    vt.compact(target_file_mb=128)
    out = vt.read()
    assert dict(out.dtypes)["x"] == "string"
    assert out.count() == 100
    rows = {r.id: r.x for r in out.collect()}
    assert rows[0] == "0" and rows[99] == "s99"
    # post-compaction appends keep working and promote on arrival
    vt.append(spark.createDataFrame([(100, 7)], ["id", "x"]))
    assert {r.x for r in vt.read().filter("id = 100").collect()} == {"7"}


def test_schema_drift_plus_promotion_together(spark, vt):
    """New column + type conflict in the same append: drift fills
    NULLs, conflict promotes."""
    vt.append(spark.createDataFrame([(1, 5)], ["id", "x"]))
    vt.append(spark.createDataFrame([(2, 1.5, "tag")],
                                    ["id", "x", "extra"]))
    out = vt.read()
    assert dict(out.dtypes)["x"] == "double"
    rows = {r.id: (r.x, r.extra) for r in out.collect()}
    assert rows == {1: (5.0, None), 2: (1.5, "tag")}


def test_hadoop_storage_backend_full_lifecycle(spark, tmp_path):
    """Object-store-shaped storage backend: a `file:` URI root routed
    through Spark's Hadoop FileSystem stack (storage.HadoopStorage) —
    the identical code path an s3a:// or gs:// root takes, minus the
    network. Full lifecycle: append, txn replay, promotion, manifest
    skipping, compact, cluster, vacuum, history."""
    from locustdb_spark import VersionedTable
    from locustdb_spark.storage import HadoopStorage

    root = f"file:{tmp_path}/hadoop_vt"
    vt = VersionedTable(spark, root)  # auto-selects HadoopStorage
    assert isinstance(vt.fs, HadoopStorage)
    vt.append(_rows(spark, 0, 100).coalesce(1), txn_id=0)
    assert vt.append(_rows(spark, 0, 100), txn_id=0) == 1  # replay
    vt.append(_rows(spark, 100, 200).coalesce(1))
    assert vt.read().count() == 200
    assert vt.read(version=1).count() == 100
    # manifest min/max skipping works through the URI scan
    assert len(vt.read(where={"id": (120, 130)}).inputFiles()) == 1
    # type promotion through the hadoop path
    vt.append(spark.createDataFrame([(999, "str")], ["id", "v"]))
    assert dict(vt.read().dtypes)["v"] == "string"
    assert vt.read().count() == 201
    vt.compact(target_file_mb=128)
    assert vt.read().count() == 201
    vt.cluster(["id"], num_files=2)
    assert vt.read().count() == 201
    deleted = vt.vacuum(keep_last=1, retention_seconds=0)
    assert deleted and vt.read().count() == 201
    h = vt.history()
    assert h[-1]["bytes"] > 0 and h[-1]["num_files"] >= 1


def test_hadoop_storage_commit_race_threads(spark, tmp_path):
    """put_if_absent via FileSystem.create(overwrite=false) under
    racing threads: every commit lands exactly once."""
    import threading

    from locustdb_spark import VersionedTable

    root = f"file:{tmp_path}/hadoop_race"
    VersionedTable(spark, root)
    errs = []

    def worker(wid):
        try:
            t = VersionedTable(spark, root)
            for i in range(8):
                while True:
                    base = t.latest_version()
                    prev = t._load_manifest(base)["files"] if base else []
                    if t._commit(base, prev + [f"w{wid}-{i}.parquet"],
                                 "{}") is not None:
                        break
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errs
    t = VersionedTable(spark, root)
    assert t.latest_version() == 32
    assert len(set(t._load_manifest(32)["files"])) == 32
