"""PCM WAV codec + Arrow-batched audio features (multimodal columns:
the audio decode step is REAL for PCM WAV; lossy audio stays a
documented stub)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pacasam_spark.audio import (
    audio_features,
    decode_wav,
    encode_wav,
    synth_wav,
)


def test_wav_roundtrip_16bit():
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.9, 0.9, 4000)
    back, rate = decode_wav(encode_wav(x, rate=8000))
    assert rate == 8000 and back.shape == (4000, 1)
    assert np.abs(back[:, 0] - x).max() < 1.0 / 32000  # 16-bit quantization
    # stereo
    st = rng.uniform(-0.5, 0.5, (1000, 2))
    back2, _ = decode_wav(encode_wav(st, rate=44100))
    assert back2.shape == (1000, 2)
    assert np.abs(back2 - st).max() < 1.0 / 32000


def test_wav_rejects_non_pcm():
    data = bytearray(encode_wav(np.zeros(10)))
    data[20] = 3  # audio format 3 = IEEE float
    with pytest.raises(NotImplementedError, match="non-PCM"):
        decode_wav(bytes(data))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"nope")


def test_audio_features_spark(spark):
    rows = [(f"a{i}", synth_wav(f"a{i}", seconds=0.25)) for i in range(8)]
    df = spark.createDataFrame(rows, "audio_id string, bytes binary")
    out = audio_features(df)
    got = {r["audio_id"]: r for r in out.collect()}
    assert len(got) == 8
    r = got["a0"]
    assert r["sample_rate"] == 16000 and r["n_samples"] == 4000
    assert abs(r["duration_sec"] - 0.25) < 1e-9
    # a sine of amplitude ~0.6+0.2 harmonics: rms in a sane band, peak < 1
    assert 0.2 < r["rms"] < 0.8 and 0.5 < r["peak"] <= 1.0
    assert 0.0 < r["zero_cross_rate"] < 0.5
    # deterministic across invocations (hash is crc-based, not PYTHONHASHSEED)
    again = {r["audio_id"]: r["rms"] for r in audio_features(df).collect()}
    assert again == {k: v["rms"] for k, v in got.items()}
