"""Streaming sink into the versioned snapshot table — the join between
streaming/events.py and sources/snapshots.py (round-4 verdict #4).

``foreachBatch`` hands the sink each micro-batch as a static DataFrame
plus a monotonically increasing ``batch_id``. Each NON-EMPTY batch
commits as one snapshot version, with the batch_id stored in the
manifest metadata. That makes the sink idempotent under Spark's
recovery contract: after a crash between the snapshot commit and the
streaming checkpoint advance, the restarted query REPLAYS the last
batch with the SAME batch_id — the sink sees the id already committed
and skips, so no duplicate version is ever written. (Spark guarantees
batch_id stability across restarts; it does not guarantee the batch
runs once — exactly-once must come from the sink, and here it comes
from the manifest, exactly how Iceberg/Delta streaming sinks dedupe on
(queryId, batchId) in the commit metadata.)

Driver-side cost per batch: listing the committed manifests (small
JSONs) — independent of data size; the data path is one distributed
parquet write, same as any batch snapshot commit.

Reference: pacasam is batch-only and overwrites one flat GeoPackage per
run (connectors/geopandas.py:24-31); this is the incremental-ingest
extension — every micro-batch of finalized sessions lands as a
time-travelable version with per-file lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pacasam_spark.sources.snapshots import snapshots, write_snapshot


def committed_batch_ids(table_dir: str) -> set[int]:
    """batch_ids already committed to the snapshot table (from manifest
    metadata) — the sink's replay-dedup set."""
    out = set()
    for m in snapshots(table_dir):
        b = m.get("metadata", {}).get("batch_id")
        if b is not None:
            out.add(int(b))
    return out


def snapshot_batch_writer(table_dir: str, metadata: dict | None = None):
    """A ``foreachBatch`` function committing each non-empty micro-batch
    as one snapshot version of ``table_dir``. Empty batches (e.g. the
    no-data batch that flushes append-mode windows after the watermark
    advances) commit nothing; a replayed batch_id commits nothing."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batch_ids(table_dir):
            return  # crash-recovery replay: version already committed
        # isEmpty is a limit-1 job — cheap, and the empty no-data batch
        # after watermark advance must not burn a version
        if df.isEmpty():
            return
        meta = dict(metadata or {})
        meta["batch_id"] = batch_id
        write_snapshot(df, table_dir, meta)

    return write_batch


def sessions_to_snapshots(
    spark: SparkSession,
    events_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> int:
    """Drain the bounded session stream (streaming/events.py semantics:
    append mode emits each finalized session exactly once) into the
    snapshot table; returns the number of committed versions. Restarting
    with the same ``checkpoint_dir`` resumes from the streaming
    checkpoint — already-processed input is not re-read, and a replayed
    in-flight batch is deduped by the sink."""
    from pacasam_spark.streaming.events import EVENTS_SCHEMA

    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    sessions = (
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            F.col("w.end").cast("timestamp_ntz").alias("session_end"),
            "n_events",
        )
    )
    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(snapshot_batch_writer(table_dir))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return len(snapshots(table_dir))
