"""Streaming CRASH-RECOVERY tests (r6, VERDICT task 4): the
exactly-once claims under failure, not just clean replays.

Mechanism: Structured Streaming commits a micro-batch in two steps —
the sink effect (our foreachBatch append), then the checkpoint's
`commits/<batchId>` marker. A crash BETWEEN the two is the dangerous
window: on restart Spark finds `offsets/<k>` without `commits/<k>`
and RE-EXECUTES batch k with the same batch id. We simulate exactly
that crash point by deleting the final `commits/<k>` file after a
completed run, then restarting from the checkpoint — a deterministic
re-delivery of a batch whose sink effect already landed. The
idempotence ledgers (VersionedTable txn_id manifests; the IVF fold's
`_stream_txns.json`) must absorb the replay: final state equals the
clean run, nothing double-appended, and the pipeline keeps making
progress afterwards.
"""

import json
import os
import time

import pytest  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401


def _write_batch_file(src_dir, name, rows, mtime):
    os.makedirs(src_dir, exist_ok=True)
    path = os.path.join(src_dir, name)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.utime(path, (mtime, mtime))


def _drain(q):
    """availableNow queries self-terminate, but the session keeps the
    query registered (and its checkpoint dir locked) for a beat after
    awaitTermination returns — stop and spin until inactive so the
    next restart on the SAME checkpoint doesn't trip Spark's
    concurrent-use guard."""
    q.awaitTermination(300)
    q.stop()
    for _ in range(300):
        if not q.isActive:
            return
        time.sleep(0.1)
    raise TimeoutError("streaming query never deactivated")


def _last_commit(ckpt):
    commits = os.path.join(ckpt, "commits")
    ids = [int(n) for n in os.listdir(commits) if n.isdigit()]
    return os.path.join(commits, str(max(ids))), max(ids)


def _remove_marker(marker):
    """Delete a commit marker AND its local-FS checksum sibling
    (.N.crc) — leaving the crc behind makes the healed rewrite fail
    with FileAlreadyExists, which is not the crash being simulated."""
    os.remove(marker)
    crc = os.path.join(os.path.dirname(marker),
                       "." + os.path.basename(marker) + ".crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_versioned_sink_replay_after_commit_marker_loss(spark, tmp_path):
    """Crash between VersionedTable manifest commit and checkpoint
    commit: the replayed batch id hits the table's txn ledger and
    appends NOTHING — row set and version chain equal the clean run —
    and the stream still ingests genuinely new data afterwards."""
    from locustdb_spark import VersionedTable
    from locustdb_spark.streaming.streams import stream_ingest_versioned

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = VersionedTable(spark, str(tmp_path / "vt"))
    schema = "id long, v double"
    t0 = time.time() - 1000

    # batch 0 (run 1), then batch 1 (run 2) — separate runs so each
    # file gets its own micro-batch id under maxFilesPerTrigger=64
    _write_batch_file(src, "a.json",
                      [{"id": i, "v": i * 1.0} for i in range(10)], t0)
    _drain(stream_ingest_versioned(spark, src, table, schema, ckpt))
    _write_batch_file(src, "b.json",
                      [{"id": i, "v": i * 1.0} for i in range(10, 20)],
                      t0 + 1)
    _drain(stream_ingest_versioned(spark, src, table, schema, ckpt))

    rows_clean = sorted((r.id, r.v) for r in table.read().collect())
    assert [x[0] for x in rows_clean] == list(range(20))
    v_clean = table.latest_version()

    # ---- simulate the crash: the sink committed, the checkpoint
    # marker for the last batch did not ----
    marker, last_id = _last_commit(ckpt)
    _remove_marker(marker)

    # restart: Spark re-executes batch `last_id`; the append must be
    # recognized by txn_id and skipped
    _drain(stream_ingest_versioned(spark, src, table, schema, ckpt))
    rows_replay = sorted((r.id, r.v) for r in table.read().collect())
    assert rows_replay == rows_clean  # nothing duplicated
    assert table.latest_version() == v_clean  # replay commits nothing
    assert os.path.exists(marker)  # checkpoint healed

    # recovery is not a dead end: new data still flows
    _write_batch_file(src, "c.json",
                      [{"id": i, "v": i * 1.0} for i in range(20, 25)],
                      t0 + 2)
    _drain(stream_ingest_versioned(spark, src, table, schema, ckpt))
    final = sorted(r.id for r in table.read().collect())
    assert final == list(range(25))
    assert table.latest_version() == v_clean + 1


def test_ivf_fold_replay_after_commit_marker_loss(spark, tmp_path):
    """Crash between the IVF fold's index append + ledger write and
    the checkpoint commit: the replayed batch id is in
    `_stream_txns.json`, so the fold is a no-op — the index equals a
    clean batch build (same ids, same clusters, probes identical) and
    subsequent batches still fold in."""
    from locustdb_spark.operators.similarity import (
        _read_index_json, build_ivf_index, probe_ivf_index)
    from locustdb_spark.streaming.streams import stream_append_ivf_index

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(i, [1.0, 0.02 * i]) for i in range(20)] + \
           [(100 + i, [0.02 * i, 1.0]) for i in range(20)]
    seed = spark.createDataFrame(
        rows[:10], "vec_id long, embedding array<double>")
    idx = str(tmp_path / "ivf")
    build_ivf_index(seed, idx, centroids=cents, assign="expr")

    src = str(tmp_path / "emb_src")
    ckpt = str(tmp_path / "ivf_ckpt")
    schema = "vec_id long, embedding array<double>"
    t0 = time.time() - 1000
    _write_batch_file(src, "a.json",
                      [{"vec_id": i, "embedding": v}
                       for i, v in rows[10:25]], t0)
    _drain(stream_append_ivf_index(spark, src, idx, schema, ckpt,
                                 assign="expr"))
    _write_batch_file(src, "b.json",
                      [{"vec_id": i, "embedding": v}
                       for i, v in rows[25:]], t0 + 1)
    _drain(stream_append_ivf_index(spark, src, idx, schema, ckpt,
                                 assign="expr"))

    clean = sorted((r.vec_id, r.cluster) for r in
                   spark.read.parquet(idx)
                   .select("vec_id", "cluster").collect())
    assert len(clean) == 40
    ledger_clean = sorted(_read_index_json(
        spark, idx + "/_stream_txns.json"))

    marker, last_id = _last_commit(ckpt)
    assert last_id in ledger_clean
    _remove_marker(marker)

    _drain(stream_append_ivf_index(spark, src, idx, schema, ckpt,
                                 assign="expr"))
    replay = sorted((r.vec_id, r.cluster) for r in
                    spark.read.parquet(idx)
                    .select("vec_id", "cluster").collect())
    assert replay == clean  # no double-append, no torn partitions
    # the ledger records each batch exactly once
    assert sorted(_read_index_json(
        spark, idx + "/_stream_txns.json")) == ledger_clean

    # the recovered index equals a clean batch build, probe-for-probe
    full = str(tmp_path / "ivf_full")
    build_ivf_index(
        spark.createDataFrame(rows,
                              "vec_id long, embedding array<double>"),
        full, centroids=cents, assign="expr")
    got = probe_ivf_index(spark, idx, [1.0, 0.05], k=3,
                          nprobe=1).collect()
    exp = probe_ivf_index(spark, full, [1.0, 0.05], k=3,
                          nprobe=1).collect()
    assert got == exp

    # and the stream keeps folding new batches after recovery
    _write_batch_file(src, "c.json",
                      [{"vec_id": 300 + i,
                        "embedding": [1.0, 0.5 + 0.01 * i]}
                       for i in range(5)], t0 + 2)
    _drain(stream_append_ivf_index(spark, src, idx, schema, ckpt,
                                 assign="expr"))
    assert spark.read.parquet(idx).count() == 45
