"""Batch ≡ stream equivalence harness (VERDICT r4 task 5).

Each streaming operator is replayed over a deterministic micro-batch
script (one JSON file per micro-batch, forced file-at-a-time with
maxFilesPerTrigger=1 and strictly increasing mtimes so the file source
processes them in script order), and the stream's final answer is
asserted EQUAL to the corresponding batch operator run once over the
union of all batches:

  streaming/streams.py sessionize            == operators/events.sessionize
  stream_minhash_band_candidates + verdicts  == batch MinHash-LSH verdicts
  stream_ingest_with_rollup                  == one-shot groupBy (and
                                                IncrementalRollup.read)
  windowed_counts (stream run)               == windowed_counts (batch run)
  stream_stream_join                         == static join, same condition
  stream_dedup                               == keep-one-per-id distinct
  stream_append_ivf_index                    == batch build, same centroids
  stream_enrich                              == static broadcast left join

This is the oracle-style check the streaming family lacked: pytest
previously pinned each op's behavior in isolation; here the CLAIMED
semantics ("the streaming analog of batch X") is what's tested.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.usefixtures("spark")


def write_script(src_dir, batches):
    """Write one JSON-lines file per micro-batch with ascending mtimes
    so the file stream source replays them in order."""
    os.makedirs(src_dir, exist_ok=True)
    t0 = time.time() - 1000
    for i, rows in enumerate(batches):
        path = os.path.join(src_dir, f"{i:04d}.json")
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        os.utime(path, (t0 + i, t0 + i))


def run_stream(spark, src_dir, schema, ckpt, sink_name, transform,
               prepare=None):
    """Replay the script through `transform` into a memory sink and
    return the final table as a DataFrame."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(src_dir)
    )
    if prepare is not None:
        stream = prepare(stream)
    q = (
        transform(stream)
        .writeStream.format("memory").queryName(sink_name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink_name)


def test_sessionize_stream_equals_batch(spark, tmp_path):
    """Stream sessions (closed by gap or by a per-user sentinel flush
    event) == batch gap-sessionization over the union of the real
    events."""
    from locustdb_spark.operators.events import sessionize as batch_sessionize
    from locustdb_spark.streaming.streams import sessionize

    gap_s = 60
    base = 1_700_000_000
    # three users, sessions split across micro-batches: u1's first
    # session SPANS batches (state carry), u2 closes within batch 1,
    # u3 appears only in batch 2
    batches = [
        [{"user_id": 1, "ts": base + 0}, {"user_id": 1, "ts": base + 30},
         {"user_id": 2, "ts": base + 0}, {"user_id": 2, "ts": base + 200},
         {"user_id": 2, "ts": base + 210}],
        [{"user_id": 1, "ts": base + 55}, {"user_id": 1, "ts": base + 300},
         {"user_id": 3, "ts": base + 10}],
        # sentinel flush: one far-future event per user closes every
        # open session (excluded from the batch side)
        [{"user_id": u, "ts": base + 10**6} for u in (1, 2, 3)],
    ]
    src = str(tmp_path / "sess_src")
    write_script(src, batches)

    out = run_stream(
        spark, src, "user_id long, ts long",
        str(tmp_path / "sess_ckpt"), "sess_equiv_out",
        lambda s: sessionize(s, gap_seconds=gap_s),
        prepare=lambda s: s.withColumn(
            "ts", F.timestamp_seconds(F.col("ts"))),
    )
    got = sorted(
        (r.user_id, int(r.session_start.timestamp()),
         int(r.session_end.timestamp()), r.n_events)
        for r in out.collect()
        if int(r.session_start.timestamp()) < base + 10**6
    )

    union = [r for b in batches[:2] for r in b]
    df = spark.createDataFrame(
        [(r["user_id"], r["ts"] * 10**9) for r in union],
        "user_id long, ts long")
    exp = sorted(
        (r.user_id, r.session_start // 10**9, r.session_end // 10**9,
         r.n_events)
        for r in batch_sessionize(df, gap_ns=gap_s * 10**9).collect()
    )
    assert got == exp and len(got) == 5


def test_minhash_near_dup_stream_equals_batch(spark, tmp_path):
    """Streaming MinHash-LSH verdicts == batch verdicts computed from
    the same signatures/banding over the union, with the stream's
    first-seen anchor reproduced batch-side as min(doc_id) (the script
    feeds doc_ids in ascending order)."""
    from locustdb_spark.operators.dedup import minhash_signatures
    from locustdb_spark.streaming.streams import (
        near_dup_verdicts, stream_minhash_band_candidates)

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "the quick brown fox jumps over the lazy dog",   # exact dup
        2: "the quick brown fox jumps over the lazy cat",   # near dup
        3: "completely different content about spark engines",
        4: "completely different content about spark engines",  # dup of 3
        5: "unique snowflake text with no relatives at all",
    }
    batches = [
        [{"doc_id": i, "text": texts[i]} for i in (0, 1)],
        [{"doc_id": i, "text": texts[i]} for i in (2, 3)],
        [{"doc_id": i, "text": texts[i]} for i in (4, 5)],
    ]
    src = str(tmp_path / "mh_src")
    write_script(src, batches)

    num_hashes, bands = 8, 4
    cands = run_stream(
        spark, src, "doc_id long, text string",
        str(tmp_path / "mh_ckpt"), "mh_equiv_out",
        lambda s: stream_minhash_band_candidates(
            s, num_hashes=num_hashes, bands=bands),
    )
    got = sorted(
        (r.doc_id, bool(r.is_dup), r.dup_of)
        for r in near_dup_verdicts(spark.table("mh_equiv_out")).collect()
    )

    # batch analog: same signatures (xxhash64 fast path), same band
    # keys, anchor = min(doc_id) per bucket
    union = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    sigs = minhash_signatures(union, num_hashes=num_hashes,
                              hash_fn="xxhash64")
    rows_per_band = num_hashes // bands
    band_structs = [
        F.xxhash64(F.lit(b), *[F.col(f"mh{b * rows_per_band + i}")
                               for i in range(rows_per_band)])
        .alias("band_key")
        for b in range(bands)
    ]
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("band_key"))
    anchors = banded.groupBy("band_key").agg(
        F.min("doc_id").alias("anchor_id"))
    matched = F.col("anchor_id") != F.col("doc_id")
    exp = sorted(
        (r.doc_id, bool(r.is_dup), r.dup_of)
        for r in banded.join(anchors, "band_key")
        .groupBy("doc_id")
        .agg(F.max(matched).alias("is_dup"),
             F.min(F.when(matched, F.col("anchor_id"))).alias("dup_of"))
        .collect()
    )
    assert got == exp
    dup_map = {d: (i, a) for d, i, a in got}
    assert dup_map[1] == (True, 0) and dup_map[4] == (True, 3)
    assert dup_map[0][0] is False and dup_map[5][0] is False


def test_rollup_stream_equals_batch(spark, tmp_path):
    """stream_ingest_with_rollup's maintained aggregate == one-shot
    groupBy over the union of every micro-batch (and the rollup's own
    read() of the fact table it wrote)."""
    from locustdb_spark import LocustDB
    from locustdb_spark.operators.rollup import IncrementalRollup
    from locustdb_spark.streaming.streams import stream_ingest_with_rollup

    batches = [
        [{"k": "a", "v": 1.0}, {"k": "b", "v": 2.0}],
        [{"k": "a", "v": 3.0}],
        [{"k": "c", "v": 4.0}, {"k": "a", "v": 5.0}],
    ]
    src = str(tmp_path / "ru_src")
    write_script(src, batches)

    import os

    db = LocustDB(db_path=str(tmp_path / "ru_db"), spark=spark)
    rollup = IncrementalRollup(
        spark, os.path.join(db.tables_dir, "metrics"),
        str(tmp_path / "ru_agg"), keys=["k"],
        aggs={"sum_v": ("sum", "v"), "cnt": ("count", "v"),
              "max_v": ("max", "v")})
    q = stream_ingest_with_rollup(
        db, src, "metrics", "k string, v double",
        str(tmp_path / "ru_ckpt"), rollup)
    q.awaitTermination(300)
    db.force_flush()
    rollup.maintain()  # fold anything the last trigger left buffered

    got = sorted((r.k, r.sum_v, r.cnt, r.max_v)
                 for r in rollup.read().collect())
    union = spark.createDataFrame(
        [(r["k"], r["v"]) for b in batches for r in b],
        "k string, v double")
    exp = sorted(
        (r.k, r.sum_v, r.cnt, r.max_v)
        for r in union.groupBy("k").agg(
            F.sum("v").alias("sum_v"), F.count("v").alias("cnt"),
            F.max("v").alias("max_v")).collect())
    assert got == exp == [("a", 9.0, 3, 5.0), ("b", 2.0, 1, 2.0),
                          ("c", 4.0, 1, 4.0)]


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    """The SAME windowed_counts expression run as a watermarked stream
    (append mode: windows emit when the watermark passes them) == its
    batch run over the union. A far-future sentinel batch advances the
    watermark so every real window finalizes."""
    from locustdb_spark.streaming.streams import windowed_counts

    rows = [
        ("2024-01-01 10:05:00", "click", 1.0),
        ("2024-01-01 10:55:00", "click", 2.0),
        ("2024-01-01 11:05:00", "view", 3.0),
        ("2024-01-01 11:40:00", "click", 4.0),
    ]
    sentinel = ("2024-06-01 00:00:00", "sentinel", 0.0)
    batches = [[dict(zip(("ts", "event_type", "value"), r))
                for r in rows[:2]],
               [dict(zip(("ts", "event_type", "value"), r))
                for r in rows[2:]],
               [dict(zip(("ts", "event_type", "value"), sentinel))]]
    src = str(tmp_path / "wc_src")
    write_script(src, batches)

    out = run_stream(
        spark, src, "ts string, event_type string, value double",
        str(tmp_path / "wc_ckpt"), "wc_equiv_out",
        windowed_counts,
        prepare=lambda s: s.withColumn("ts", F.to_timestamp("ts")),
    )
    got = sorted(
        (str(r.window_start), r.event_type, r.cnt, r.sum_value)
        for r in out.collect() if r.event_type != "sentinel"
    )
    union = spark.createDataFrame(
        rows, "ts string, event_type string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    exp = sorted(
        (str(r.window_start), r.event_type, r.cnt, r.sum_value)
        for r in windowed_counts(union).collect()
    )
    assert got == exp and len(got) == 3


def test_stream_stream_join_equals_static_join(spark, tmp_path):
    """Watermarked stream-stream attribution join == the same join
    condition evaluated statically over the unions (all rows inside
    the watermark horizon, so eviction cannot drop a true match)."""
    from locustdb_spark.streaming.streams import stream_stream_join

    imps = [
        {"ad_id": 1, "imp_ts": "2024-01-01 10:00:00"},
        {"ad_id": 2, "imp_ts": "2024-01-01 10:05:00"},
        {"ad_id": 1, "imp_ts": "2024-01-01 10:30:00"},
    ]
    clicks = [
        {"ad_id": 1, "click_ts": "2024-01-01 10:10:00"},  # -> imp 10:00
        {"ad_id": 2, "click_ts": "2024-01-01 12:00:00"},  # outside 1h
        {"ad_id": 1, "click_ts": "2024-01-01 10:40:00"},  # -> both imps
    ]
    lsrc, rsrc = str(tmp_path / "imp_src"), str(tmp_path / "clk_src")
    write_script(lsrc, [imps[:2], imps[2:]])
    write_script(rsrc, [clicks[:1], clicks[1:]])

    lschema, rschema = "ad_id long, imp_ts string", "ad_id long, click_ts string"
    lstream = (spark.readStream.schema(lschema)
               .option("maxFilesPerTrigger", "1").json(lsrc)
               .withColumn("imp_ts", F.to_timestamp("imp_ts")))
    rstream = (spark.readStream.schema(rschema)
               .option("maxFilesPerTrigger", "1").json(rsrc)
               .withColumn("click_ts", F.to_timestamp("click_ts")))
    q = (
        stream_stream_join(lstream, rstream, "ad_id", "imp_ts",
                           "click_ts", within="1 hour",
                           watermark="48 hours")
        .writeStream.format("memory").queryName("ssj_equiv_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ssj_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = sorted((r.ad_id, str(r.imp_ts), str(r.click_ts))
                 for r in spark.table("ssj_equiv_out").collect())

    ldf = spark.createDataFrame(
        [(r["ad_id"], r["imp_ts"]) for r in imps], lschema
    ).withColumn("imp_ts", F.to_timestamp("imp_ts"))
    rdf = spark.createDataFrame(
        [(r["ad_id"], r["click_ts"]) for r in clicks], rschema
    ).withColumn("click_ts", F.to_timestamp("click_ts"))
    cond = (
        (ldf["ad_id"] == rdf["ad_id"])
        & (F.col("click_ts") >= F.col("imp_ts"))
        & (F.col("click_ts") <= F.col("imp_ts") + F.expr("INTERVAL 1 hour"))
    )
    exp = sorted((r.ad_id, str(r.imp_ts), str(r.click_ts))
                 for r in ldf.join(rdf, cond).drop(rdf["ad_id"]).collect())
    assert got == exp and len(got) == 3


def test_stream_dedup_equals_batch_distinct(spark, tmp_path):
    """Streaming watermark dedup keeps exactly one row per id (the
    first seen) == batch distinct-id semantics over the union."""
    from locustdb_spark.streaming.streams import stream_dedup

    batches = [
        [{"ts": "2024-01-01 10:00:00", "event_id": 1, "v": 1.0},
         {"ts": "2024-01-01 10:01:00", "event_id": 2, "v": 2.0}],
        [{"ts": "2024-01-01 10:02:00", "event_id": 1, "v": 9.0},
         {"ts": "2024-01-01 10:03:00", "event_id": 3, "v": 3.0}],
        [{"ts": "2024-01-01 10:04:00", "event_id": 2, "v": 9.0},
         {"ts": "2024-01-01 10:05:00", "event_id": 4, "v": 4.0}],
    ]
    src = str(tmp_path / "dd_src")
    write_script(src, batches)
    out = run_stream(
        spark, src, "ts string, event_id long, v double",
        str(tmp_path / "dd_ckpt"), "dd_equiv_out",
        lambda s: stream_dedup(s, ["event_id"]),
        prepare=lambda s: s.withColumn("ts", F.to_timestamp("ts")),
    )
    got = sorted((r.event_id, r.v) for r in out.collect())
    # first-seen row per id over the scripted order
    seen, exp = set(), []
    for b in batches:
        for r in b:
            if r["event_id"] not in seen:
                seen.add(r["event_id"])
                exp.append((r["event_id"], r["v"]))
    assert got == sorted(exp) and len(got) == 4


def test_stream_append_ivf_index_equals_batch_build(spark, tmp_path):
    """Streaming ANN-index maintenance == batch build with the same
    frozen centroids over the union; the probe answers match, and a
    replayed micro-batch id is a no-op (ledger idempotence)."""
    from locustdb_spark.operators.similarity import (
        append_ivf_index, build_ivf_index, probe_ivf_index)
    from locustdb_spark.streaming.streams import stream_append_ivf_index

    cents = [[1.0, 0.0], [0.0, 1.0]]
    rows = [(i, [1.0, 0.02 * i]) for i in range(20)] + \
           [(100 + i, [0.02 * i, 1.0]) for i in range(20)]
    seed = spark.createDataFrame(
        rows[:10], "vec_id long, embedding array<double>")
    idx = str(tmp_path / "ivf_stream")
    build_ivf_index(seed, idx, centroids=cents, assign="expr")

    batches = [[{"vec_id": i, "embedding": v} for i, v in rows[10:25]],
               [{"vec_id": i, "embedding": v} for i, v in rows[25:]]]
    src = str(tmp_path / "emb_src")
    write_script(src, batches)
    q = stream_append_ivf_index(
        spark, src, idx, "vec_id long, embedding array<double>",
        str(tmp_path / "ivf_stream_ckpt"), assign="expr")
    q.awaitTermination(300)

    full = str(tmp_path / "ivf_stream_full")
    build_ivf_index(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        full, centroids=cents, assign="expr")
    a = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(idx).select("vec_id", "cluster")
               .collect())
    b = sorted((r.vec_id, r.cluster) for r in
               spark.read.parquet(full).select("vec_id", "cluster")
               .collect())
    assert a == b and len(a) == 40
    got = probe_ivf_index(spark, idx, [1.0, 0.05], k=3, nprobe=1).collect()
    exp = probe_ivf_index(spark, full, [1.0, 0.05], k=3, nprobe=1).collect()
    assert got == exp

    # replaying a committed batch id must not double-append: drive the
    # same source through a FRESH checkpoint — batch ids repeat, the
    # ledger skips them
    q2 = stream_append_ivf_index(
        spark, src, idx, "vec_id long, embedding array<double>",
        str(tmp_path / "ivf_stream_ckpt2"), assign="expr")
    q2.awaitTermination(300)
    assert spark.read.parquet(idx).count() == 40


def test_stream_enrich_equals_static_join(spark, tmp_path):
    """Stream-static broadcast enrichment == the same left join
    evaluated statically over the union of all micro-batches."""
    from locustdb_spark.streaming.streams import stream_enrich

    dim = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "k string, label string")
    batches = [
        [{"k": "a", "v": 1.0}, {"k": "c", "v": 2.0}],
        [{"k": "b", "v": 3.0}, {"k": "a", "v": 4.0}],
    ]
    src = str(tmp_path / "en_src")
    write_script(src, batches)
    out = run_stream(
        spark, src, "k string, v double",
        str(tmp_path / "en_ckpt"), "enrich_equiv_out",
        lambda s: stream_enrich(s, dim, "k"),
    )
    got = sorted((r.k, r.v, r.label) for r in out.collect())
    union = spark.createDataFrame(
        [(r["k"], r["v"]) for b in batches for r in b],
        "k string, v double")
    exp = sorted((r.k, r.v, r.label)
                 for r in union.join(dim, "k", "left").collect())
    assert got == exp and len(got) == 4
