"""PCM WAV codec + audio feature extraction (multimodal columns: audio
as an opaque binary column with typed metadata; the decode step for WAV
is REAL — RIFF/WAVE PCM is pure struct — while lossy audio (mp3/ogg)
and video stay behind the documented NotImplementedError in
imaging.decode, the genuinely library-bound codecs).

Features follow the same Arrow-batched shape as the image path
(extract/images.py): pure numpy per payload inside mapInPandas, no
per-sample Python."""

from __future__ import annotations

import struct

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """16-bit PCM RIFF/WAVE bytes for float samples in [-1, 1] (mono:
    (n,), multi-channel: (n, ch))."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2")
    data = pcm.tobytes()
    block = ch * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    hdr += b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, ch, rate, rate * block, block, 16
    )
    hdr += b"data" + struct.pack("<I", len(data))
    return hdr + data


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """(samples float64 in [-1, 1] shaped (n, ch), sample rate) from
    PCM WAV bytes (8/16/32-bit integer PCM; walks RIFF chunks, so extra
    LIST/fact chunks are fine)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, fmt, raw = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _br, _block, bits = fmt
    if audio_fmt != 1:
        raise NotImplementedError(
            f"WAV format {audio_fmt} (non-PCM) needs a codec library"
        )
    dt = {8: np.uint8, 16: np.dtype("<i2"), 32: np.dtype("<i4")}[bits]
    x = np.frombuffer(raw, dt).astype(np.float64)
    if bits == 8:  # unsigned convention
        x = (x - 128.0) / 128.0
    else:
        x = x / float(2 ** (bits - 1) - 1)
    return x.reshape(-1, ch), rate


def audio_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """Per-payload audio statistics (duration / rms / peak / zero-cross
    rate) decoded in Arrow batches — the audio analogue of the image
    metadata op (driver q32)."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        if f.name != bytes_col
    ) + ", sample_rate int, n_samples long, duration_sec double, " \
        "rms double, peak double, zero_cross_rate double"

    keep = [f.name for f in df.schema.fields if f.name != bytes_col]

    def feats(batches):
        import pandas as pd

        for pdf in batches:
            rows = {k: pdf[k] for k in keep}
            cols = {k: [] for k in (
                "sample_rate", "n_samples", "duration_sec", "rms", "peak",
                "zero_cross_rate",
            )}
            for payload in pdf[bytes_col]:
                x, rate = decode_wav(bytes(payload))
                mono = x.mean(axis=1)
                n = len(mono)
                cols["sample_rate"].append(rate)
                cols["n_samples"].append(n)
                cols["duration_sec"].append(n / rate if rate else 0.0)
                cols["rms"].append(float(np.sqrt(np.mean(mono**2))) if n else 0.0)
                cols["peak"].append(float(np.abs(mono).max()) if n else 0.0)
                cols["zero_cross_rate"].append(
                    float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
                    if n > 1 else 0.0
                )
            yield pd.DataFrame({**rows, **cols})

    return df.mapInPandas(feats, out_schema)


def synth_wav(audio_id: str, seconds: float = 0.5, rate: int = 16000) -> bytes:
    """Deterministic test tone: id-hashed frequency sine + harmonics."""
    import zlib

    h = zlib.crc32(audio_id.encode()) & 0xFFFF
    freq = 220.0 + (h % 440)
    t = np.arange(int(seconds * rate)) / rate
    x = 0.6 * np.sin(2 * np.pi * freq * t) + 0.2 * np.sin(4 * np.pi * freq * t)
    return encode_wav(x, rate)
