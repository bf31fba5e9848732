"""STFT/ISTFT/mel/MFCC kernel tests.

Test strategy mirrors the reference (SURVEY.md §4): cross-library
equivalence (torch.stft as oracle, available on host CPU), round-trip
properties (reference tests/core/test_audio_signal.py:400-456), and
analytic checks.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from audiotools_tpu.ops import fft as F


@pytest.mark.parametrize("window_length,hop_length", [(2048, 512), (512, 128), (2048, 441)])
@pytest.mark.parametrize("window_type", ["hann", "sqrt_hann"])
def test_stft_matches_torch(window_length, hop_length, window_type):
    x = np.random.RandomState(0).randn(2, 1, 22050).astype(np.float32) * 0.5
    s = F.stft(jnp.asarray(x), window_length, hop_length, window_type)

    w = torch.from_numpy(F.get_window(window_type, window_length))
    st = torch.stft(
        torch.from_numpy(x).reshape(-1, x.shape[-1]),
        n_fft=window_length,
        hop_length=hop_length,
        window=w,
        return_complex=True,
        center=True,
    ).reshape(2, 1, -1, s.shape[-1])
    assert np.abs(np.asarray(s) - st.numpy()).max() < 1e-4


@pytest.mark.parametrize("match_stride", [False, True])
@pytest.mark.parametrize("window_length,hop_length", [(2048, 512), (256, 64)])
def test_stft_istft_roundtrip(window_length, hop_length, match_stride):
    x = np.random.RandomState(0).randn(2, 1, 22050).astype(np.float32) * 0.5
    s = F.stft(jnp.asarray(x), window_length, hop_length, "hann", match_stride)
    y = np.asarray(
        F.istft(
            s, window_length, hop_length, "hann", match_stride,
            original_length=x.shape[-1],
        )
    )
    assert y.shape == x.shape
    if match_stride:
        # frames * hop == samples (reference audio_signal.py:1206-1209)
        rp, _ = F.compute_stft_padding(
            x.shape[-1], window_length, hop_length, True
        )
        assert s.shape[-1] == (x.shape[-1] + rp) // hop_length
        d = 2 * window_length  # reference discards edges for match_stride
        assert np.abs(y[..., d:-d] - x[..., d:-d]).max() < 1e-5
    else:
        assert np.abs(y - x).max() < 1e-5


def test_istft_given_length():
    x = np.random.RandomState(1).randn(1, 1, 8000).astype(np.float32)
    s = F.stft(jnp.asarray(x), 512, 128, "hann")
    y = F.istft(s, 512, 128, "hann", length=4000)
    assert y.shape[-1] == 4000


def test_mel_filters_properties():
    # filterbank rows are nonnegative; each FFT bin in range is covered
    fb = F.mel_filters(44100, 2048, 80)
    assert fb.shape == (80, 1025)
    assert fb.min() >= 0
    assert (fb.sum(axis=1) > 0).all()
    # slaney normalization: peak * bandwidth/2 ~ 1
    mel_of = F._hz_to_mel(np.array([0.0, 1000.0, 8000.0]))
    hz = F._mel_to_hz(mel_of)
    assert np.allclose(hz, [0.0, 1000.0, 8000.0], atol=1e-6)


def test_dct_matrix_ortho():
    d = F.dct_matrix(40, 80, "ortho")
    assert d.shape == (80, 40)
    # orthonormal columns
    gram = d.T @ d
    assert np.abs(gram - np.eye(40)).max() < 1e-5


def test_mel_spectrogram_shapes_and_energy():
    x = np.random.RandomState(2).randn(2, 1, 44100).astype(np.float32) * 0.1
    mel = F.mel_spectrogram(jnp.asarray(x), 44100, n_mels=80, window_length=2048, hop_length=512)
    assert mel.shape[:3] == (2, 1, 80)
    assert np.asarray(mel).min() >= 0

    # a 1 kHz sine concentrates energy in the right mel band
    t = np.arange(44100) / 44100
    sine = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None, None]
    mel_s = np.asarray(
        F.mel_spectrogram(jnp.asarray(sine), 44100, n_mels=80, window_length=2048, hop_length=512)
    )[0, 0].mean(axis=-1)
    peak_band = mel_s.argmax()
    mel_center = F._mel_to_hz(
        np.linspace(F._hz_to_mel(0.0), F._hz_to_mel(22050.0), 82)
    )[peak_band + 1]
    assert abs(mel_center - 1000) < 150


def test_mfcc_shape():
    x = np.random.RandomState(3).randn(1, 1, 22050).astype(np.float32)
    out = F.mfcc(jnp.asarray(x), 44100, n_mfcc=40, n_mels=80)
    assert out.shape[:3] == (1, 1, 40)


def test_log_magnitude_matches_librosa_formula():
    # reference parity: amplitude_to_db-compatible
    mag = np.abs(np.random.RandomState(4).randn(3, 5, 7)).astype(np.float32)
    out = np.asarray(F.log_magnitude(jnp.asarray(mag), ref_value=1.0, amin=1e-5, top_db=80.0))
    amin = 1e-10
    expected = 10.0 * np.log10(np.maximum(mag**2, amin))
    expected -= 10.0 * np.log10(np.maximum(amin, 1.0))
    expected = np.maximum(expected, expected.max() - 80.0)
    assert np.abs(out - expected).max() < 1e-4


def test_default_win_length():
    assert F.default_win_length(44100) == 2048
    assert F.default_win_length(16000) == 512
    assert F.default_win_length(22050) == 1024


@pytest.mark.parametrize("win,hop", [(2048, 512), (512, 128)])
def test_istft_fused_synthesis_matches_matmul(win, hop):
    """The fused Pallas synthesis (iDFT matmul + OLA + envelope in one
    pass, interpret mode off-TPU) reproduces the matmul istft to bf16
    accuracy, including the match_stride frame accounting."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 1, 9000).astype(np.float32) * 0.3)
    for ms in (False, True):
        spec = F.stft(x, win, hop, match_stride=ms, method="matmul")
        ref = F.istft(
            spec, win, hop, match_stride=ms, original_length=9000,
            method="matmul",
        )
        got = F.istft(
            spec, win, hop, match_stride=ms, original_length=9000,
            method="matmul_bf16_fused_interpret",
        )
        assert got.shape == ref.shape
        scale = float(jnp.abs(ref).max())
        assert float(jnp.abs(got - ref).max()) / scale < 6e-3, (win, ms)


def test_istft_fused_cpu_fallback_runs():
    """method="matmul_bf16_fused" without interpret falls back to the
    matmul_bf16 lowering off-TPU (same contract as the Pallas meter)."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 1, 5000).astype(np.float32))
    spec = F.stft(x, 512, 128, method="matmul")
    y = F.istft(spec, 512, 128, length=5000, method="matmul_bf16_fused")
    ref = F.istft(spec, 512, 128, length=5000, method="matmul_bf16")
    assert np.abs(np.asarray(y - ref)).max() < 1e-6
