"""Streaming sessionizer contract tests. The value-correctness of
q36/q37/q45 is driver-gated against DuckDB; these tests pin the
INPUT contract: in-order micro-batches sessionize exactly, out-of-order
input fails loudly instead of silently corrupting session counts
(ADVICE r2: a regressing batch used to be appended to the open session
with an inflated count and a too-late session_start)."""

import datetime as dt
import os

import pytest

from pacasam_spark.streaming.events import sessionize_stateful

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, path, rows):
    spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(minutes=m), uid, "click", 1.0, "{}")
            for i, (uid, m) in enumerate(rows)
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(path)


def test_sessionize_stateful_in_order_batches(spark, tmp_path):
    """Two in-order files (one per micro-batch): a gap < 30 min continues
    the session ACROSS batches; a gap > 30 min opens a new one."""
    d = str(tmp_path / "ev")
    os.makedirs(d)
    _write_events(spark, f"{d}/events_a.parquet", [(1, 0), (1, 10), (2, 0)])
    os.utime(f"{d}/events_a.parquet", (1_000_000, 1_000_000))
    _write_events(spark, f"{d}/events_b.parquet", [(1, 25), (1, 90), (2, 200)])
    os.utime(f"{d}/events_b.parquet", (2_000_000, 2_000_000))

    got = {
        (r["user_id"], r["sess_seq"]): r["n_events"]
        for r in sessionize_stateful(spark, d).collect()
    }
    assert got == {
        (1, 1): 3,  # 0, 10, 25 min — continued across the batch boundary
        (1, 2): 1,  # 90 min
        (2, 1): 1,
        (2, 2): 1,  # 200 min
    }


def test_sessionize_stateful_rejects_out_of_order_batches(spark, tmp_path):
    """A micro-batch whose first event predates the stored last_ts must
    raise (loud failure), not corrupt the open session."""
    d = str(tmp_path / "ev_ooo")
    os.makedirs(d)
    # file A (processed first: older mtime) holds the LATER events
    _write_events(spark, f"{d}/events_a.parquet", [(1, 100), (1, 110)])
    os.utime(f"{d}/events_a.parquet", (1_000_000, 1_000_000))
    _write_events(spark, f"{d}/events_b.parquet", [(1, 5)])
    os.utime(f"{d}/events_b.parquet", (2_000_000, 2_000_000))

    with pytest.raises(Exception, match="out-of-order"):
        sessionize_stateful(spark, d).collect()


def test_session_rollup_stream_append_matches_batch(spark, tmp_path):
    """session_rollup under readStream + watermark (append mode) emits
    exactly the batch sessions finalized before the last watermark: a
    far-future 'flush' event closes everything earlier; only its own
    still-open session stays pending."""
    from pacasam_spark.streaming.events import session_rollup, session_rollup_stream

    d = str(tmp_path / "ev_sw")
    os.makedirs(d)
    _write_events(
        spark, f"{d}/events_a.parquet", [(1, 0), (1, 10), (2, 0), (1, 90)]
    )
    os.utime(f"{d}/events_a.parquet", (1_000_000, 1_000_000))
    # batch 2: one event per user far in the future (the flush sessions)
    _write_events(spark, f"{d}/events_b.parquet", [(1, 100000), (2, 100000)])
    os.utime(f"{d}/events_b.parquet", (2_000_000, 2_000_000))

    batch = session_rollup(spark.read.parquet(f"{d}/*.parquet"))
    flush_start = T0 + dt.timedelta(minutes=100000)
    expected = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect()
        if r["session_start"] != flush_start  # pending at stream end
    )
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_rollup_stream(spark, f"{d}/*.parquet").collect()
    )
    assert got == expected
    assert len(got) == 3  # u1: [0,10], [90]; u2: [0]
