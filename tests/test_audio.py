"""Audio multimodal column: WAV byte-level round trip, feature math vs
hand-computed values, and the error-to-NULL contract (multimodal/audio.py)."""

from __future__ import annotations

import numpy as np
import pytest

from wicsmmiretl_spark.multimodal.audio import (
    audio_features,
    parse_pcm16_wav,
    pcm16_wav_bytes,
    synth_wav,
)


def test_wav_byte_roundtrip():
    s = np.array([0, 100, -100, 32767, -32768, 7], dtype=np.int16)
    buf = pcm16_wav_bytes(s, sample_rate=16000)
    rate, back = parse_pcm16_wav(buf)
    assert rate == 16000
    assert np.array_equal(back, s)
    # 44-byte RIFF header + 2 bytes per sample — the exact PCM16 layout.
    assert len(buf) == 44 + 2 * len(s)


def test_parse_rejects_garbage():
    with pytest.raises(ValueError, match="truncated"):
        parse_pcm16_wav(b"RIFF")
    with pytest.raises(ValueError, match="magic"):
        parse_pcm16_wav(b"\x00" * 64)


def test_synth_orders_and_features_hand_computed(spark):
    # Key 1: samples [100, -100, 100, -100] delivered OUT of order — synth
    # must sort by the order columns. frame_size=2 -> two frames, each
    # RMS exactly 100; 3 strict sign flips over 3 adjacent pairs.
    rows = [(1, 2, -100), (1, 1, 100), (1, 4, -100), (1, 3, 100), (2, 1, 50)]
    df = spark.createDataFrame(rows, "k long, o long, s int")
    wav = synth_wav(df, "k", ["o"], "s", sample_rate=8000)
    got = {r["k"]: r for r in wav.collect()}
    assert got[1]["n_samples"] == 4 and got[2]["n_samples"] == 1
    rate, s1 = parse_pcm16_wav(bytes(got[1]["audio"]))
    assert rate == 8000 and list(s1) == [100, -100, 100, -100]

    feats = {r["k"]: r for r in audio_features(wav.select("k", "audio"), frame_size=2).collect()}
    assert feats[1]["n_frames"] == 2
    assert feats[1]["rms_mean"] == pytest.approx(100.0, abs=1e-6)
    assert feats[1]["zcr"] == pytest.approx(1.0, abs=1e-6)  # 3 flips / 3 pairs
    # Single sample: one frame, RMS = |s|, zcr undefined -> NULL.
    assert feats[2]["n_frames"] == 1
    assert feats[2]["rms_mean"] == pytest.approx(50.0, abs=1e-6)
    assert feats[2]["zcr"] is None


def test_features_bad_bytes_become_nulls(spark):
    good = pcm16_wav_bytes(np.array([10, -10, 10], dtype=np.int16))
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"not a wav")), (3, None)],
        "k long, audio binary",
    )
    got = {r["k"]: r for r in audio_features(df).collect()}
    assert got[1]["n_samples"] == 3 and got[1]["rms_mean"] == pytest.approx(10.0, abs=1e-6)
    assert got[2]["n_samples"] is None and got[2]["rms_mean"] is None
    assert got[3]["n_samples"] is None


def test_validates_inputs(spark):
    df = spark.createDataFrame([(1, b"x")], "k long, audio binary")
    with pytest.raises(ValueError, match="frame_size"):
        audio_features(df, frame_size=0)
    with pytest.raises(ValueError, match="column"):
        synth_wav(df, "nope", ["k"], "k")
