"""Pure-stdlib WAV codec + the audio decode stage."""

from __future__ import annotations

import numpy as np
import pytest

from etl_sprint_2_5_spark.operators.wav_codec import wav_decode, wav_encode


def test_roundtrip_mono_and_stereo():
    rng = np.random.default_rng(3)
    for shape, rate in [((100,), 8000), ((64, 2), 44100), ((1, 1), 16000)]:
        a = rng.integers(-32768, 32768, size=shape, dtype=np.int16)
        out, r = wav_decode(wav_encode(a, rate))
        exp = a[:, None] if a.ndim == 1 else a
        assert r == rate and out.shape == exp.shape and (out == exp).all()


def test_loud_failures():
    with pytest.raises(ValueError, match="malformed WAV"):
        wav_decode(b"RIFF\x10\x00\x00\x00WAVEjunkjunk")
    good = wav_encode(np.zeros(10, np.int16), 8000)
    with pytest.raises(ValueError):
        wav_decode(good[:30])  # truncated header


def test_audio_stage_modes(spark):
    from etl_sprint_2_5_spark.operators import multimodal as M

    wav = wav_encode(np.arange(-50, 50, dtype=np.int16), 8000)
    rows = [
        ("ok", bytearray(wav)),
        ("corrupt", bytearray(b"RIFF\x00\x00\x00\x00WAVE broken")),
        ("other", bytearray(b"ID3 not a wav at all, mp3-ish")),
    ]
    df = spark.createDataFrame(rows, "id string, payload binary")
    got = {r["id"]: r for r in M.decode_audio(df, "id", "payload").collect()}
    assert got["ok"]["decode_ok"] == "real"
    assert (got["ok"]["sample_rate"], got["ok"]["n_frames"],
            got["ok"]["channels"], got["ok"]["duration_ms"]) == (8000, 100, 1, 12)
    assert got["corrupt"]["decode_ok"] == "corrupt"
    assert got["corrupt"]["n_frames"] == 0
    assert got["other"]["decode_ok"] == "fake"
    assert got["other"]["sample_rate"] >= 8000
