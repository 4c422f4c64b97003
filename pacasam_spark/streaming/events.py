"""Structured Streaming over the events table.

The reference is batch-only (SURVEY.md §2.10) — streaming here extends
the engine the way a training-data ingest pipeline needs it: the SAME
rollup written once (``hourly_rollup``) runs as a batch query or a
Structured Streaming query; on bounded input the streaming result equals
the batch result, which makes it oracle-checkable.

Incremental-ingest mapping of the reference's behaviors:
- chunked PostGIS reads (connectors/lipac.py:83-89) -> file-source
  micro-batches (maxFilesPerTrigger);
- resumable extraction (K5) -> checkpointLocation + idempotent sink.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def hourly_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour counts + exact decimal sums per event_type —
    shared by the batch and streaming paths."""
    return (
        events.groupBy(F.window("ts", "1 hour").start.alias("hour_start"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(27,4)")).cast("double").alias("sum_value"),
        )
    )


def hourly_rollup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the rollup as a Structured Streaming query over the events
    parquet (file source, bounded), drain it through a memory sink in
    complete mode, and return the final result as a static DataFrame."""
    name = f"hourly_rollup_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/events*.parquet")  # glob: file source needs a dir/glob
    )
    q = (
        hourly_rollup(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


def user_event_counts_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: running per-user event counts
    via applyInPandasWithState (the engine's extension point for
    reference-style stateful logic, SURVEY.md §2.14)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    name = f"user_counts_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/events*.parquet")  # glob: file source needs a dir/glob
    )

    def update(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    out = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # update mode appends every state change; the final count per user is
    # the max.
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
