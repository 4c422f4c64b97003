"""Video frame-sampling over opaque binary columns: the vraw container
codec is real end-to-end; mp4 stays the documented stub but flows
through the SAME operator plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pacasam_spark import imaging
from pacasam_spark.video import (
    decode_vraw,
    encode_vraw,
    frame_sample,
    synth_video,
    video_metadata,
)


def test_vraw_roundtrip_and_sparse_decode():
    frames = [imaging.synth_pixels(f"v/f{i}", 16, 16) for i in range(10)]
    data = encode_vraw(frames, fps=5, fmt="png")
    all_frames, fps = decode_vraw(data)
    assert fps == 5 and [i for i, _a in all_frames] == list(range(10))
    assert all(np.array_equal(a, frames[i]) for i, a in all_frames)  # png lossless
    sampled, _ = decode_vraw(data, every=4)
    assert [i for i, _a in sampled] == [0, 4, 8]


def test_frame_sample_spark(spark):
    rows = [(f"v{i}", synth_video(f"v{i}", n_frames=48, fps=24), "vraw")
            for i in range(4)]
    df = spark.createDataFrame(
        rows, "video_id string, bytes binary, container string"
    )
    out = frame_sample(df, every=12).cache()
    got = out.collect()
    assert len(got) == 4 * 4  # frames 0, 12, 24, 36 per video
    assert {r["frame_idx"] for r in got} == {0, 12, 24, 36}
    assert all(abs(r["t_sec"] - r["frame_idx"] / 24) < 1e-9 for r in got)
    assert all(r["w"] == r["h"] == 32 for r in got)
    # payloads decode back to the exact source frame (png round-trip of
    # the jl-decoded pixels), and the phash matches a direct computation
    r = next(r for r in got if r["video_id"] == "v1" and r["frame_idx"] == 12)
    arr = imaging.decode(bytes(r["bytes"]), "png")
    src, _ = decode_vraw(synth_video("v1", n_frames=48, fps=24), every=12)
    src_arr = dict(src)[12]
    assert np.array_equal(arr, src_arr)
    assert r["phash"] == imaging.phash64(src_arr)

    # metadata path: header-only, no frame decode
    meta = {m["video_id"]: m for m in video_metadata(df).collect()}
    assert meta["v0"]["n_frames"] == 48 and meta["v0"]["fps"] == 24
    assert abs(meta["v0"]["duration_sec"] - 2.0) < 1e-9

    # frame-level near-dup: the same video twice collides on every phash
    dup = spark.createDataFrame(
        [("a", synth_video("x"), "vraw"), ("b", synth_video("x"), "vraw")],
        "video_id string, bytes binary, container string",
    )
    fs = frame_sample(dup, every=24, out_fmt=None)
    pairs = (
        fs.alias("l")
        .join(fs.alias("r"), ["frame_idx", "phash"])
        .filter(F.col("l.video_id") < F.col("r.video_id"))
    )
    assert pairs.count() == 2  # both sampled frames collide


def test_mp4_is_an_honest_stub(spark):
    df = spark.createDataFrame(
        [("m", b"\x00\x00\x00 ftypisom....", "mp4")],
        "video_id string, bytes binary, container string",
    )
    with pytest.raises(Exception, match="stubbed"):
        frame_sample(df, every=10).collect()


# --- ISO BMFF (mp4) demux: real metadata path (pacasam_spark.mp4box) ----


def test_mp4_build_parse_round_trip():
    from pacasam_spark.mp4box import build_mp4, mp4_metadata, walk_boxes

    data = build_mp4(width=128, height=72, n_frames=96, fps=24,
                     mdat=b"\x17" * 960)
    m = mp4_metadata(data)
    assert m["brand"] == "isom"
    t = m["tracks"][0]
    assert (t["width"], t["height"]) == (128, 72)
    assert t["n_samples"] == 96
    assert t["codec"] == "avc1" and t["handler"] == "vide"
    assert t["language"] == "und"
    # fps=24 divides the default 12288 timescale exactly
    assert m["duration_sec"] == 4.0 and t["fps"] == 24.0
    types = [b[0] for b in walk_boxes(data)]
    for required in ("ftyp", "moov", "mvhd", "trak", "tkhd", "mdia",
                     "mdhd", "hdlr", "minf", "stbl", "stsd", "stts",
                     "stsz", "stco", "mdat"):
        assert required in types, required


def test_mp4_malformed_rejected():
    import pytest as _pytest

    from pacasam_spark.mp4box import mp4_metadata

    with _pytest.raises(ValueError, match="not an ISO BMFF"):
        mp4_metadata(b"RIFFxxxxWAVE" + b"\0" * 32)
    with _pytest.raises(ValueError, match="malformed box"):
        import struct as _s

        bad = _s.pack(">I4s", 3, b"ftyp")  # size < header
        mp4_metadata(bad + b"\0" * 16)


def test_video_metadata_dispatches_on_container(spark):
    """video_metadata serves BOTH containers in one pass: vraw headers
    and real mp4 box trees."""
    from pacasam_spark.mp4box import build_mp4
    from pacasam_spark.video import synth_video, video_metadata

    rows = [
        ("v1", bytearray(synth_video("v1", n_frames=12, fps=6))),
        ("m1", bytearray(build_mp4(n_frames=48, fps=24))),
    ]
    df = spark.createDataFrame(rows, "video_id string, bytes binary")
    got = {r["video_id"]: r for r in video_metadata(df).collect()}
    assert got["v1"]["n_frames"] == 12 and got["v1"]["fps"] == 6
    assert got["v1"]["duration_sec"] == 2.0
    assert got["m1"]["n_frames"] == 48 and got["m1"]["fps"] == 24
    assert got["m1"]["duration_sec"] == 2.0
