"""Structured Streaming surface: continuous ingestion + streaming
analytics.

The reference's "streaming" is continuous ingestion only — an HTTP
endpoint appends event buffers under a WAL and a background thread
batches them into partitions (reference src/scheduler/
inner_locustdb.rs:236-430). Here that maps to Structured Streaming
micro-batches appended to the table directory via foreachBatch, with
the stream checkpoint playing the WAL's role (exactly-once append on
restart).

Beyond the reference we expose real streaming analytics, which Spark
gives us natively: watermarked event-time windows and a custom
stateful operator (sessionization via applyInPandasWithState).

Scale notes: foreachBatch appends parquet per micro-batch — at high
rates pair it with the engine's `compact()` maintenance job (small-
file compaction, reference table.rs:248-298). Windowed aggregations
shuffle only (key, window) partials; state store size is bounded by
the watermark horizon.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_ingest_json(
    db,
    source_dir: str,
    table: str,
    schema: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuously ingest JSON files from `source_dir` into `table`.

    The checkpoint directory is the WAL analog: a micro-batch is either
    fully appended and committed or replayed on restart.
    Returns the StreamingQuery.
    """
    stream = (
        db.spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "64")
        .json(source_dir)
    )

    def append_batch(batch_df: DataFrame, batch_id: int) -> None:
        db.ingest_df(table, batch_df)

    writer = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window counts over an event stream.
    Late rows beyond the watermark are dropped; state is bounded."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(key_col),
            "cnt",
            "sum_value",
        )
    )


def stream_dedup(
    events: DataFrame,
    id_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: drop events whose id columns were already
    seen within the watermark horizon. `dropDuplicatesWithinWatermark`
    keys the state store on the id columns and expires entries past the
    watermark, so state stays bounded no matter how long the stream
    runs — the property that matters on an always-on ingest pipeline
    (an unbounded dropDuplicates would accumulate state forever).
    """
    id_cols = id_cols or ["event_id"]
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(id_cols)
    )


SESSION_OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events int, closed boolean"
)
SESSION_STATE_SCHEMA = "start long, last long, n int"


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Custom stateful streaming operator: per-user sessionization with
    an inactivity gap, via applyInPandasWithState (reference has no
    analog — its streams are ingest-only)."""
    import pandas as pd

    def update(key, pdfs, state: GroupState):
        (user_id,) = key
        ts_values: list[int] = []
        for pdf in pdfs:
            ts_values.extend(
                int(t.timestamp()) for t in pd.to_datetime(pdf[ts_col])
            )
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start, unit="s")],
                    "session_end": [pd.Timestamp(last, unit="s")],
                    "n_events": [n],
                    "closed": [True],
                }
            )
            return
        ts_values.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_values[0], ts_values[0], 0
        out_rows = []
        for t in ts_values:
            if t - last > gap_seconds:
                out_rows.append((user_id, start, last, n, True))
                start, n = t, 0
            last = t
            n += 1
        state.update((start, last, n))
        state.setTimeoutDuration(gap_seconds * 1000)
        if out_rows:
            yield pd.DataFrame(
                {
                    "user_id": [r[0] for r in out_rows],
                    "session_start": [pd.Timestamp(r[1], unit="s")
                                      for r in out_rows],
                    "session_end": [pd.Timestamp(r[2], unit="s")
                                    for r in out_rows],
                    "n_events": [r[3] for r in out_rows],
                    "closed": [r[4] for r in out_rows],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def stream_enrich(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment: join each micro-batch against a
    dimension table. The static side is broadcast, so enrichment adds
    no stream-side shuffle and no state store — the canonical pattern
    for attaching dimension attributes (user profile, document source
    metadata) to an event stream at any rate. The static side is
    re-read per micro-batch, so dimension updates are picked up
    without restarting the query."""
    return stream_df.join(F.broadcast(dim_df), on, how)


def stream_ingest_versioned(
    spark,
    source_dir: str,
    table,
    schema: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuously ingest JSON files into a VersionedTable with
    EXACTLY-ONCE appends end-to-end: the micro-batch id is passed as
    the table's txn_id, so a batch replayed after a crash between the
    manifest commit and the checkpoint commit is recognized and
    skipped (versioned.py append txn_id — the Delta idempotent-writer
    pattern). The checkpoint alone only guarantees at-least-once into
    a non-transactional sink; the txn_id closes that gap."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "64")
        .json(source_dir)
    )

    def append_batch(batch_df, batch_id: int) -> None:
        table.append(batch_df, txn_id=batch_id)

    writer = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_stream_join(
    left_df: DataFrame,
    right_df: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: pair right-stream events with
    same-key left-stream events that happened at-or-before them within
    `within` (the attribution shape: click joins the impression that
    preceded it). Both sides carry watermarks AND the join condition
    bounds event-time distance — together these let the state store
    evict rows past the horizon; without them stream-stream join state
    grows without limit. The two event-time columns must have distinct
    names. State is partitioned by join key, so scale-out is linear in
    key cardinality."""
    l = left_df.withWatermark(left_ts, watermark)
    r = right_df.withWatermark(right_ts, watermark)
    cond = (
        (l[key] == r[key])
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, how).drop(r[key])


def stream_ingest_with_rollup(
    db,
    source_dir: str,
    table: str,
    schema: str,
    checkpoint_dir: str,
    rollup,
    available_now: bool = True,
):
    """`stream_ingest_json` + continuous aggregate maintenance: after
    each micro-batch commits to the fact table, the IncrementalRollup
    folds exactly the newly-written files into its persisted aggregate
    (operators/rollup.py) — the full analog of the reference's
    WAL-flush -> partition-merge cycle (inner_locustdb.rs:334-430)
    where the merged aggregate stays queryable the whole time.

    Crash semantics compose: a replayed micro-batch re-appends files
    the checkpoint didn't commit, and the rollup manifest skips files
    it already folded, so the rollup converges to the full recompute
    regardless of where a crash lands. Maintenance work per trigger is
    O(micro-batch), never O(table).
    """
    stream = (
        db.spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "64")
        .json(source_dir)
    )

    def append_and_maintain(batch_df: DataFrame, batch_id: int) -> None:
        db.ingest_df(table, batch_df)
        rollup.maintain()

    writer = (
        stream.writeStream.foreachBatch(append_and_maintain)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_append_ivf_index(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    schema: str,
    checkpoint_dir: str,
    available_now: bool = True,
    assign: str = "numpy",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Continuous ANN-index maintenance: micro-batches of embedding
    rows (JSON files in `source_dir`) are assigned with the persisted
    index's FROZEN centroids and appended to its cluster partitions
    (operators/similarity.append_ivf_index) — the streaming leg of the
    build -> append -> drift -> retrain lifecycle. A 100 TB corpus's
    embeddings arrive continuously; this keeps the IVF index queryable
    and fresh at O(micro-batch) cost per trigger, with `ivf_drift` /
    `ivf_retrain_needed` as the companion monitoring job.

    Idempotence: each folded micro-batch id is recorded in
    `index_path/_stream_txns.json` AFTER its append and replays are
    skipped, so a restart from the checkpoint cannot double-append a
    batch whose ledger entry committed. A crash in the narrow window
    between append-complete and ledger-write can still duplicate that
    one batch on replay (the parquet-append sink is not transactional)
    — pipelines needing strict exactly-once should ingest through
    `stream_ingest_versioned` (txn_id manifests) and index from there.
    Returns the StreamingQuery."""
    from ..operators.similarity import (
        _read_index_json, _write_index_json, append_ivf_index)

    ledger_path = index_path.rstrip("/") + "/_stream_txns.json"

    def fold_batch(batch_df: DataFrame, batch_id: int) -> None:
        done = _read_index_json(spark, ledger_path) or []
        if batch_id in done:
            return
        append_ivf_index(batch_df, index_path, vec_col=vec_col,
                         id_col=id_col, assign=assign)
        _write_index_json(spark, ledger_path, done + [batch_id])

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "64")
        .json(source_dir)
    )
    writer = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------
# streaming near-dup dedup (minhash-band state)
# ---------------------------------------------------------------------

NEAR_DUP_OUTPUT_SCHEMA = (
    "band_key long, doc_id long, anchor_id long, first_in_bucket boolean"
)
NEAR_DUP_STATE_SCHEMA = "anchor_id long"


def stream_minhash_band_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 5,
    state_ttl_minutes: int | None = None,
) -> DataFrame:
    """Streaming MinHash-LSH near-dup detection, stage 1+2: the
    stateless signature/banding projection (operators/dedup.py
    minhash_signatures — zero-shuffle per micro-batch) feeds a
    stateful per-band-bucket first-seen operator.

    Emits one row per (document, band): `anchor_id` is the FIRST
    document ever seen in that band bucket across the whole stream
    history, `first_in_bucket` marks whether this document created the
    bucket. A document is a near-dup candidate of `anchor_id` iff any
    of its bands lands in an existing bucket (`first_in_bucket` false
    and anchor != doc) — the streaming analog of batch
    `lsh_candidate_pairs` restricted to first-anchor links (the same
    star-shape collapse the batch collapse_exact path uses; downstream
    connected components are unchanged).

    Scale shape: per-bucket state is ONE long (the anchor id) — a
    billion-bucket corpus is ~8 GB of state sharded across the
    cluster's state stores (use the RocksDB provider beyond memory
    scale). `state_ttl_minutes` expires idle buckets so an unbounded
    stream can dedup against a sliding corpus horizon instead of all
    history (documented recall trade-off; None keeps every bucket
    forever). The per-band shuffle moves (band_key, doc_id) longs
    only — corpus text never shuffles.

    The per-document dup verdict needs all `bands` rows of a doc;
    aggregate downstream (`near_dup_verdicts` for batch sinks /
    foreachBatch) — chaining a second stateful aggregation inside the
    same streaming query is not supported by Spark for
    applyInPandasWithState outputs.
    """
    import pandas as pd

    from ..operators.dedup import minhash_signatures

    sigs = minhash_signatures(
        docs, text_col=text_col, id_col=id_col,
        num_hashes=num_hashes, shingle_k=shingle_k,
        hash_fn="xxhash64")
    rows_per_band = num_hashes // bands
    band_structs = []
    for b in range(bands):
        lanes = [F.col(f"mh{b * rows_per_band + i}")
                 for i in range(rows_per_band)]
        band_structs.append(
            F.xxhash64(F.lit(b), *lanes).alias("band_key"))
    banded = sigs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array(*band_structs)).alias("band_key"),
    )

    def update(key, pdfs, state: GroupState):
        (band_key,) = key
        if state.hasTimedOut:
            state.remove()
            return
        ids: list[int] = []
        for pdf in pdfs:
            ids.extend(int(v) for v in pdf["doc_id"])
        if not ids:
            return
        ids.sort()
        if state.exists:
            (anchor,) = state.get
            first_flags = [False] * len(ids)
        else:
            anchor = ids[0]
            first_flags = [i == 0 for i in range(len(ids))]
        state.update((anchor,))
        if state_ttl_minutes is not None:
            state.setTimeoutDuration(state_ttl_minutes * 60 * 1000)
        yield pd.DataFrame({
            "band_key": [band_key] * len(ids),
            "doc_id": ids,
            "anchor_id": [anchor] * len(ids),
            "first_in_bucket": first_flags,
        })

    return banded.groupBy("band_key").applyInPandasWithState(
        update,
        outputStructType=NEAR_DUP_OUTPUT_SCHEMA,
        stateStructType=NEAR_DUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout
                     if state_ttl_minutes is not None
                     else GroupStateTimeout.NoTimeout),
    )


def near_dup_verdicts(candidates: DataFrame) -> DataFrame:
    """Reduce per-band candidate rows to one verdict per document:
    (doc_id, is_dup, dup_of). `dup_of` is the smallest anchor among
    matched buckets (stable representative). Batch-side helper — run
    it inside foreachBatch or over the candidate sink."""
    matched = F.col("anchor_id") != F.col("doc_id")
    return (
        candidates.groupBy("doc_id")
        .agg(
            F.max(matched).alias("is_dup"),
            F.min(F.when(matched, F.col("anchor_id"))).alias("dup_of"),
        )
    )
