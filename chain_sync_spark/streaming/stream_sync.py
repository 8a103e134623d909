"""Structured Streaming runtime for the sync engine (SURVEY.md §2.7).

The reference's main loop is a hand-rolled micro-batch consumer:
fetch a block range, transform, upsert, advance cursor, sleep ~3 s
(listener.js:157-195). Structured Streaming provides that contract
natively — source offsets replace the block cursor, triggers replace
the sleep loop, and `foreachBatch` hands each micro-batch to the
exact same handler/MERGE pipeline the batch engine uses. One code
path, two runtimes.

Also here: event-time windowed aggregation with watermarks — the
streaming form of operators/temporal.py's window queries. Late rows
older than the watermark are dropped; closed windows emit in append
mode (at-least-once into an idempotent keyed sink = effectively
exactly-once, same argument as the batch engine).

Scale notes: a file/Kafka source shards micro-batches across
executors; the stateful window aggregation keeps per-window partial
state in the state store keyed by (window, group keys) — bounded by
the watermark horizon, not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from chain_sync_spark.sources.blocks import OP_STREAM_SCHEMA


def stream_ops_from_json(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming op source: the JSON-lines directory an RPC fetch
    stage appends to (S1's streaming form)."""
    reader = spark.readStream.schema(OP_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def windowed_op_counts(
    ops: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling window counts per op type with a late-data
    watermark — the streaming twin of window_tumbling_events."""
    w = F.window("ts", window)
    return (
        ops.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), F.col("op_type"))
        .agg(F.count(F.lit(1)).alias("n_ops"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "op_type",
            "n_ops",
        )
    )


def dedup_ops_within_watermark(ops: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup — the streaming twin of the batch
    dedup_exact_documents operator, and an explicit form of the
    dedup the reference gets implicitly from idempotent upserts
    (listener.js crash replay re-delivers whole blocks): redelivered
    ops are dropped on (block_num, op_type, op) identity, emitted
    rows come out exactly once.

    Scale: state is keyed by the dedup columns and bounded by the
    watermark horizon — a key is remembered only until the event-time
    watermark passes it, so state size tracks the late-data window,
    not the stream length."""
    return ops.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["block_num", "op_type", "op"]
    )


def join_votes_to_comments_stream(
    ops: DataFrame, max_lag: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: each vote op matches the comment op
    that created its post, provided the vote arrives within
    `max_lag` of the comment (the event-time range condition that
    lets Spark bound join state). Both sides carry a watermark, so
    buffered rows age out once the watermark passes comment_ts +
    max_lag — state is bounded by the lag window, not the stream
    length."""
    comments = (
        ops.filter(F.col("op_type") == "comment")
        .select(
            F.get_json_object("op", "$.author").alias("author"),
            F.get_json_object("op", "$.permlink").alias("permlink"),
            F.col("ts").alias("comment_ts"),
        )
        .withWatermark("comment_ts", max_lag)
    )
    votes = (
        ops.filter(F.col("op_type") == "vote")
        .select(
            F.get_json_object("op", "$.voter").alias("voter"),
            F.get_json_object("op", "$.author").alias("v_author"),
            F.get_json_object("op", "$.permlink").alias("v_permlink"),
            F.col("ts").alias("vote_ts"),
        )
        .withWatermark("vote_ts", max_lag)
    )
    return comments.join(
        votes,
        (F.col("author") == F.col("v_author"))
        & (F.col("permlink") == F.col("v_permlink"))
        & (F.col("vote_ts") >= F.col("comment_ts"))
        & (F.col("vote_ts") <= F.col("comment_ts") + F.expr(f"INTERVAL {max_lag}")),
    ).select("author", "permlink", "voter", "comment_ts", "vote_ts")


def run_stream_sync(
    engine,
    ops: DataFrame,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Drive a SyncEngine from a streaming op source: every
    micro-batch flows through the same process_batch → MERGE path as
    the batch loop. Offsets/commits live in the streaming checkpoint;
    the merges are idempotent, so at-least-once delivery is safe
    (reference crash-replay contract).

    `available_now=True` processes everything currently in the source
    then stops — the reference's STOP_BLOCK_NUMBER backfill mode.
    """

    def _process(batch_df: DataFrame, _batch_id: int) -> None:
        engine.process_batch(batch_df)

    writer = (
        ops.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --- rollup store commit protocol -----------------------------------------
#
# The stored rollup and its replay marker must commit ATOMICALLY, and a
# crash at any point must be recoverable:
#   staging = store.staging   (new merged table, written first)
#   old     = store.old       (previous table, renamed aside — never rmtree'd
#                              before the new table is in place)
# Commit order: write staging (incl. _rollup_commit.json inside it, so
# marker and data land in the same rename) → rename store → store.old →
# rename staging → store → remove store.old.  _recover_store() repairs
# every crash window: leftover staging is discarded (batch replays),
# a missing store with store.old present is restored, a surviving
# store.old next to a committed store is cleared.
#
# The marker is keyed on (checkpoint identity, batch_id): batch ids
# restart at 0 under a fresh checkpoint, so a bare high-water mark would
# silently skip genuinely NEW data.  Contract: the store belongs to its
# checkpoint — reset them TOGETHER.  Re-pointing an existing store at a
# new checkpoint over an already-ingested source re-merges (double
# counts) by design; that is the caller asserting the source only holds
# new data.

_COMMIT_META = "_rollup_commit.json"


def _recover_store(store_dir: str) -> None:
    """Repair any crash window of the rollup-store swap (idempotent)."""
    import os
    import shutil

    staging, old = store_dir + ".staging", store_dir + ".old"
    if os.path.isdir(staging):
        shutil.rmtree(staging)  # incomplete write — the batch will replay
    if os.path.isdir(old):
        if os.path.isdir(store_dir):
            shutil.rmtree(old)  # crash after commit, before cleanup
        else:
            os.replace(old, store_dir)  # crash mid-swap — restore previous


def _read_commit_meta(store_dir: str) -> dict:
    import json
    import os

    path = os.path.join(store_dir, _COMMIT_META)
    if not os.path.exists(path):
        return {}
    with open(path) as fh:
        return json.load(fh)


def _commit_store(merged: DataFrame, store_dir: str, meta: dict) -> None:
    """Write merged+marker to staging, then swap in recoverably."""
    import json
    import os
    import shutil

    staging, old = store_dir + ".staging", store_dir + ".old"
    merged.write.mode("overwrite").parquet(staging)
    # marker inside the staged dir: data and replay mark commit in ONE
    # rename (underscore prefix → invisible to parquet readers)
    with open(os.path.join(staging, _COMMIT_META), "w") as fh:
        json.dump(meta, fh)
    if os.path.isdir(store_dir):
        os.replace(store_dir, old)
    os.replace(staging, store_dir)
    if os.path.isdir(old):
        shutil.rmtree(old)


def run_stream_rollup(
    stream_df: DataFrame,
    store_dir: str,
    keys: list[str],
    checkpoint_dir: str,
) -> StreamingQuery:
    """Incremental materialized-rollup maintenance under Structured
    Streaming: each micro-batch's PARTIAL aggregate
    (operators/incremental.rollup_events) merges into the stored
    per-key totals — O(batch) per trigger, the streaming twin of the
    batch incremental.merge_rollup round.

    Idempotence: foreachBatch delivers at-least-once; a (checkpoint
    identity, batch-id) high-water mark committed atomically WITH the
    table (see the commit-protocol note above) skips replayed batches
    — replay-safe across restarts and crash-recoverable at every step
    (same advance-after-commit argument as the sync engine's cursor,
    listener.js:140-142). The store is bound to its checkpoint: reset
    the two together. The local store swap is staging-dir + recoverable
    double rename; at scale the same delta feeds the partition-pruned
    MERGE path (sync/merge.py) or a transactional MERGE INTO.
    """
    import os

    from chain_sync_spark.operators.incremental import merge_rollup, rollup_events

    ckpt_id = os.path.realpath(checkpoint_dir)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _recover_store(store_dir)
        meta = _read_commit_meta(store_dir)
        if meta.get("checkpoint") == ckpt_id and meta.get("batch_id", -1) >= batch_id:
            return  # replayed batch under the same checkpoint — already merged
        spark = batch_df.sparkSession
        delta = rollup_events(batch_df, keys)
        if os.path.isdir(store_dir):
            merged = merge_rollup(spark.read.parquet(store_dir), delta, keys)
        else:
            merged = delta
        _commit_store(merged, store_dir, {"checkpoint": ckpt_id, "batch_id": batch_id})

    return (
        stream_df.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
