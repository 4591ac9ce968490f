"""Streaming-surface tests: micro-batch JSON ingestion (WAL-analog
checkpointing), watermarked windowed aggregation, and the stateful
sessionization operator — all driven with availableNow triggers so
they run bounded."""

import json
import os

import pytest
from pyspark.sql import functions as F

from locustdb_spark import LocustDB


@pytest.fixture()
def stream_db(spark, tmp_path):
    return LocustDB(db_path=str(tmp_path / "db"), spark=spark)


def write_json(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_stream_ingest_json(stream_db, tmp_path):
    from locustdb_spark.streaming.streams import stream_ingest_json

    src = tmp_path / "incoming"
    write_json(str(src / "a.json"),
               [{"host": "a", "cpu": 0.5}, {"host": "b", "cpu": 0.7}])
    write_json(str(src / "b.json"), [{"host": "c", "cpu": 0.9}])

    q = stream_ingest_json(
        stream_db, str(src), "metrics", "host string, cpu double",
        str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    out = stream_db.run_query("SELECT host, cpu FROM metrics ORDER BY host")
    assert out["rows"] == [("a", 0.5), ("b", 0.7), ("c", 0.9)]

    # restart with the same checkpoint: no duplicate ingestion (WAL parity)
    q2 = stream_ingest_json(
        stream_db, str(src), "metrics", "host string, cpu double",
        str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    out2 = stream_db.run_query("SELECT host, cpu FROM metrics ORDER BY host")
    assert out2["rows"] == out["rows"]

    # new file arrives -> next run picks up only the delta
    write_json(str(src / "c.json"), [{"host": "d", "cpu": 1.0}])
    q3 = stream_ingest_json(
        stream_db, str(src), "metrics", "host string, cpu double",
        str(tmp_path / "ckpt"))
    q3.awaitTermination(120)
    assert stream_db.run_query("SELECT count(0) FROM metrics")["rows"] == [(4,)]


def test_windowed_counts_batch_semantics(spark):
    """Windowed agg logic validated in batch mode (same expression)."""
    from locustdb_spark.streaming.streams import windowed_counts

    rows = [
        ("2024-01-01 10:05:00", "click", 1.0),
        ("2024-01-01 10:55:00", "click", 2.0),
        ("2024-01-01 11:05:00", "view", 3.0),
    ]
    df = spark.createDataFrame(rows, "ts string, event_type string, value double") \
        .withColumn("ts", F.to_timestamp("ts"))
    out = {(str(r.window_start), r.event_type): (r.cnt, r.sum_value)
           for r in windowed_counts(df).collect()}
    assert out[("2024-01-01 10:00:00", "click")] == (2, 3.0)
    assert out[("2024-01-01 11:00:00", "view")] == (1, 3.0)


def test_stream_dedup(spark, tmp_path):
    """Duplicate event_ids within the watermark horizon are dropped
    across micro-batches (state-store backed, bounded by watermark)."""
    from locustdb_spark.streaming.streams import stream_dedup

    src = tmp_path / "events"
    write_json(
        str(src / "a.json"),
        [
            {"ts": "2024-01-01 10:00:00", "event_id": 1, "v": 1.0},
            {"ts": "2024-01-01 10:01:00", "event_id": 2, "v": 2.0},
            {"ts": "2024-01-01 10:02:00", "event_id": 1, "v": 9.0},  # dup
        ],
    )
    write_json(
        str(src / "b.json"),
        [
            {"ts": "2024-01-01 10:03:00", "event_id": 2, "v": 9.0},  # dup
            {"ts": "2024-01-01 10:04:00", "event_id": 3, "v": 3.0},
        ],
    )
    stream = (
        spark.readStream.schema("ts string, event_id long, v double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        stream_dedup(stream, ["event_id"])
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT event_id, count(*) AS c FROM dedup_out GROUP BY 1"
    ).collect()
    assert sorted((r.event_id, r.c) for r in got) == [(1, 1), (2, 1), (3, 1)]


def test_sessionize_stream(spark, tmp_path):
    from locustdb_spark.streaming.streams import sessionize

    src = tmp_path / "events"
    write_json(
        str(src / "e.json"),
        [
            {"ts": "2024-01-01 10:00:00", "user_id": 1},
            {"ts": "2024-01-01 10:10:00", "user_id": 1},
            # > 30 min gap -> first session closes
            {"ts": "2024-01-01 11:00:00", "user_id": 1},
            {"ts": "2024-01-01 10:00:00", "user_id": 2},
        ],
    )
    stream = (
        spark.readStream.schema("ts string, user_id long")
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    sessions = sessionize(stream, gap_seconds=1800)
    q = (
        sessions.writeStream.format("memory").queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.sql(
        "SELECT user_id, n_events FROM sessions_out ORDER BY user_id"
    ).collect()
    # user 1's first session (2 events) closed by the 11:00 event
    assert [(r.user_id, r.n_events) for r in got] == [(1, 2)]


def test_stream_enrich_broadcast_join(spark, tmp_path):
    import json

    from locustdb_spark.streaming.streams import stream_enrich

    src = tmp_path / "src"
    src.mkdir()
    (src / "a.json").write_text("\n".join(
        json.dumps({"user_id": i % 3, "value": float(i)})
        for i in range(9)))
    dim = spark.createDataFrame(
        [(0, "bronze"), (1, "silver"), (2, "gold")], "user_id int, tier string")
    stream = (spark.readStream.schema("user_id int, value double")
              .json(str(src)))
    enriched = stream_enrich(stream, dim, "user_id")
    q = (enriched.groupBy("tier").agg(F.sum("value").alias("s"))
         .writeStream.format("memory").queryName("enrich_t")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = {r.tier: r.s for r in spark.sql(
        "SELECT * FROM enrich_t").collect()}
    assert out == {"bronze": 0 + 3 + 6, "silver": 1 + 4 + 7,
                   "gold": 2 + 5 + 8}


def test_stream_stream_join_attribution(spark, tmp_path):
    """Click-to-impression attribution via watermarked stream-stream
    join: each click pairs with same-user impressions at-or-before it
    within the hour; a click 2h later must NOT match."""
    import json

    from locustdb_spark.streaming.streams import stream_stream_join

    imps = tmp_path / "imps"
    clicks = tmp_path / "clicks"
    imps.mkdir()
    clicks.mkdir()
    (imps / "a.json").write_text("\n".join([
        json.dumps({"user_id": 1, "imp_ts": "2026-01-01T10:00:00"}),
        json.dumps({"user_id": 1, "imp_ts": "2026-01-01T12:00:00"}),
        json.dumps({"user_id": 2, "imp_ts": "2026-01-01T10:00:00"}),
    ]))
    (clicks / "a.json").write_text("\n".join([
        # in-window for user 1's 10:00 impression only
        json.dumps({"user_id": 1, "click_ts": "2026-01-01T10:30:00"}),
        # 2h after user 2's impression: out of window
        json.dumps({"user_id": 2, "click_ts": "2026-01-01T12:00:00"}),
    ]))
    imp_stream = (spark.readStream
                  .schema("user_id int, imp_ts timestamp")
                  .json(str(imps)))
    click_stream = (spark.readStream
                    .schema("user_id int, click_ts timestamp")
                    .json(str(clicks)))
    joined = stream_stream_join(
        imp_stream, click_stream, "user_id", "imp_ts", "click_ts",
        within="1 hour")
    q = (joined.writeStream.format("memory").queryName("attrib_t")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = [(r.user_id, str(r.imp_ts), str(r.click_ts))
           for r in spark.sql("SELECT * FROM attrib_t").collect()]
    assert out == [(1, "2026-01-01 10:00:00", "2026-01-01 10:30:00")]


def test_stream_ingest_with_rollup(spark, tmp_path):
    """Streamed micro-batches keep the incremental rollup equal to a
    full recompute after every drain (streams.stream_ingest_with_rollup
    + operators/rollup.py)."""
    import json as _json
    import os

    from pyspark.sql import functions as F

    from locustdb_spark.engine import LocustDB
    from locustdb_spark.operators.rollup import IncrementalRollup
    from locustdb_spark.streaming.streams import stream_ingest_with_rollup

    db = LocustDB(spark=spark, db_path=str(tmp_path / "db"))
    src = tmp_path / "incoming"
    src.mkdir()
    rollup = IncrementalRollup(
        spark,
        fact_dir=os.path.join(db.tables_dir, "m"),
        rollup_dir=str(tmp_path / "rollup"),
        keys=["host"],
        aggs={"total": ("sum", "v"), "cnt": ("count", "v")})

    def drain(batch_rows):
        path = src / f"batch-{len(list(src.iterdir()))}.json"
        path.write_text("\n".join(_json.dumps(r) for r in batch_rows))
        q = stream_ingest_with_rollup(
            db, str(src), "m", "host string, v long",
            str(tmp_path / "ckpt"), rollup)
        q.awaitTermination(60)

    drain([{"host": "a", "v": 1}, {"host": "b", "v": 2}])
    drain([{"host": "a", "v": 10}])
    db.force_flush()
    rollup.maintain()  # fold anything the last trigger left buffered

    got = sorted(map(tuple, rollup.read().select(
        "host", "total", "cnt").collect()))
    want = sorted(map(tuple, db.snapshot("m").groupBy("host").agg(
        F.sum("v").alias("total"), F.count("v").alias("cnt")).collect()))
    assert got == want == [("a", 11, 2), ("b", 2, 1)]


def test_stream_minhash_near_dup(spark, tmp_path):
    """Streaming MinHash-LSH dedup: near-identical docs arriving in
    LATER micro-batches are flagged against the first-seen anchor;
    distinct docs are not. Verdicts agree with the batch LSH banding
    (same signatures, same band partitioning) on the same corpus."""
    import json as _json

    from locustdb_spark.streaming.streams import (
        near_dup_verdicts, stream_minhash_band_candidates)

    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the deep dark forest tonight")
    other = ("completely different content about spark structured "
             "streaming stateful operators and their state stores")
    batch1 = [{"doc_id": 1, "text": base},
              {"doc_id": 2, "text": other}]
    batch2 = [{"doc_id": 3, "text": base + " extra"},  # near-dup of 1
              {"doc_id": 4, "text": "unrelated short text entirely "
                                    "about gardening and tomatoes"}]
    src = tmp_path / "docs"
    src.mkdir()
    for name, rows in (("a.json", batch1), ("b.json", batch2)):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    cand = stream_minhash_band_candidates(stream, num_hashes=8, bands=4)
    q = (
        cand.writeStream.format("memory").queryName("nd_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.table("nd_out")
    assert out.count() == 16  # 4 docs x 4 bands
    verdicts = {r.doc_id: (r.is_dup, r.dup_of)
                for r in near_dup_verdicts(out).collect()}
    assert verdicts[1] == (False, None)
    assert verdicts[2] == (False, None)
    assert verdicts[3][0] is True and verdicts[3][1] == 1
    assert verdicts[4] == (False, None)
