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


def session_rollup(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user sessions via Catalyst's native ``session_window`` — the
    scale path for sessionization: a partial-merging hash aggregation
    (sessions merge map-side within partitions before the user_id
    shuffle), no per-user sort window, and the SAME expression runs under
    ``readStream`` with a watermark for the unbounded case. Returns
    (user_id, session_start, session_end, n_events). Boundary closure:
    session_window MERGES windows whose ranges touch, so an event
    landing EXACTLY ``gap`` after its predecessor extends the session —
    identical to a lag-flag sessionizer with the strict predicate
    ``ts > prev + gap`` (what the q30/q45/q50 oracles use). Pinned by
    tests/test_streaming.py::test_session_window_gap_boundary."""
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def session_rollup_stream(
    spark: SparkSession,
    events_dir: str,
    gap: str = "30 minutes",
    watermark: str = "0 seconds",
) -> DataFrame:
    """``session_rollup`` under ``readStream`` + watermark, append mode —
    the production-stream shape. Late-data semantics (pinned by
    tests/test_streaming.py::test_session_rollup_stream_late_data_cannot_mutate_emitted):
    finalized sessions emit exactly once and are IMMUTABLE — a late
    event whose session was already evicted is dropped by the state
    operator; a late event whose session is still open in state may
    legitimately merge (Spark documents row-level late dropping as
    best-effort, not guaranteed). On a bounded file source the output is
    every session whose end precedes the final watermark; sessions still
    open within ``gap`` of the last observed event stay pending (the
    streaming-vs-batch delta is exactly those tail sessions)."""
    name = f"session_rollup_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    sessions = (
        # watermarks require TIMESTAMP (not NTZ); the session timezone is
        # pinned to UTC, so the round-trip cast is the identity
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


def sessionize_stateful(
    spark: SparkSession, sf_dir: str, gap_minutes: int = 30
) -> DataFrame:
    """Stateful streaming sessionization: the streaming twin of the batch
    lag+cumsum sessionizer (driver q30) via ``applyInPandasWithState``.
    State per user = (last event time, open session seq/count/start), all
    as epoch-microsecond longs (exact — no float time math). Each batch
    sorts its rows by (ts, event_id), continues the open session when the
    gap <= ``gap_minutes``, and emits every session it touched; a later
    batch that extends a session re-emits it with a larger count, so the
    bounded-input result is the per-(user, seq) max — equal to the batch
    result when events arrive in time order (bounded file source here).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    name = f"sessionize_{uuid.uuid4().hex[:8]}"
    gap_us = gap_minutes * 60 * 1_000_000
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{sf_dir}/events*.parquet")
    )

    def update(key, pdfs, state: GroupState):
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
        if state.exists:
            last_ts, seq, cur_n, cur_start = state.get
        else:
            last_ts, seq, cur_n, cur_start = None, 0, 0, 0
        prev = ts_us.shift(1)
        new_sess = prev.isna() | (ts_us > prev + gap_us)
        if last_ts is not None:
            # The sessionizer is only correct when micro-batches arrive
            # in global time order per user (bounded in-order file source
            # here). A batch starting BEFORE the stored last_ts would be
            # appended to the open session with an inflated count and a
            # too-late session_start — fail loudly instead of corrupting
            # output. (Out-of-order production streams belong in
            # session_window + watermark, not this exact-batch twin.)
            if int(ts_us.iloc[0]) < last_ts:
                raise ValueError(
                    f"sessionize_stateful: out-of-order micro-batch for "
                    f"user {key[0]}: event at {int(ts_us.iloc[0])}us "
                    f"predates state last_ts {last_ts}us"
                )
            new_sess.iloc[0] = ts_us.iloc[0] > last_ts + gap_us
        seqs = new_sess.cumsum() + seq
        out_rows = []
        for s, grp in ts_us.groupby(seqs):
            n = len(grp)
            start = int(grp.iloc[0])
            if s == seq and last_ts is not None:  # continued open session
                n += cur_n
                start = cur_start
            out_rows.append((key[0], int(s), n, start))
        last = out_rows[-1]
        state.update((int(ts_us.iloc[-1]), last[1], last[2], last[3]))
        out = pd.DataFrame(
            out_rows, columns=["user_id", "sess_seq", "n_events", "start_us"]
        )
        out["session_start"] = out["start_us"].astype("datetime64[us]")
        yield out.drop(columns=["start_us"])

    result = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=(
            "user_id long, sess_seq long, n_events long, "
            "session_start timestamp_ntz"
        ),
        stateStructType="last_ts long, seq long, n long, start long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    q = (
        result.writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # a session extended across batches re-emits: keep the final (max) count
    return (
        spark.table(name)
        .groupBy("user_id", "sess_seq")
        .agg(F.max("n_events").alias("n_events"),
             F.min("session_start").alias("session_start"))
    )


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
