"""FFMPEG mixin shim tests: native fallbacks match the BS.1770 meter
(the reference validates ffmpeg r128 against pyloudnorm,
tests/core/test_ffmpeg.py:26-36; here the native meter IS the backend
when ffmpeg is absent)."""
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from audiotools_tpu.core.ffmpeg import ffmpeg_available, r128stats
from tests.fixtures import speech_like


def test_r128stats_native(tmp_path):
    sig = AudioSignal(speech_like(0, 2.0)[None, None], 44100)
    p = tmp_path / "x.wav"
    sig.write(p, subtype="FLOAT")
    stats = r128stats(str(p))
    assert set(stats) >= {"I", "I Threshold", "LRA"}
    # matches the in-memory meter closely
    assert abs(stats["I"] - float(np.asarray(sig.loudness())[0])) < 0.2


def test_ffmpeg_loudness_matches_meter():
    sig = AudioSignal(speech_like(1, 2.0)[None, None], 44100)
    direct = float(np.asarray(sig.clone().loudness())[0])
    viaf = float(np.asarray(sig.clone().ffmpeg_loudness())[0])
    assert abs(direct - viaf) < 0.2


def test_ffmpeg_loudness_batch():
    batch = AudioSignal(
        np.stack([speech_like(i, 1.0) for i in range(3)])[:, None], 44100
    )
    out = np.asarray(batch.ffmpeg_loudness())
    assert out.shape == (3,)


def test_ffmpeg_resample_fallback():
    sig = AudioSignal(speech_like(0, 1.0)[None, None], 44100)
    out = sig.clone().ffmpeg_resample(16000)
    assert out.sample_rate == 16000
    assert out.signal_length == 16000
    # same-rate no-op
    out2 = sig.clone().ffmpeg_resample(44100)
    assert out2.signal_length == 44100


def test_load_with_ffmpeg_fallback(tmp_path):
    sig = AudioSignal(speech_like(0, 0.5)[None, None], 44100)
    p = tmp_path / "y.wav"
    sig.write(p, subtype="FLOAT")
    loaded = AudioSignal.load_from_file_with_ffmpeg(str(p))
    assert loaded.sample_rate == 44100
