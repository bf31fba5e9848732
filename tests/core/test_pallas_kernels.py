"""Pallas kernel tests (interpret mode on CPU; hardware parity is
exercised by the profiler scripts on TPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu.ops.filters import causal_fft_conv1d
from audiotools_tpu.ops.pallas_kernels import fir_conv_causal


@pytest.mark.parametrize("taps", [33, 371, 1023])
@pytest.mark.parametrize("T", [5000, 8192])
def test_fir_conv_matches_fft_path(taps, T):
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, T).astype(np.float32))
    h = np.random.RandomState(1).randn(taps).astype(np.float32) * 0.05
    y_pl = np.asarray(fir_conv_causal(x, h, interpret=True))
    y_ref = np.asarray(causal_fft_conv1d(x, jnp.asarray(h)))
    assert y_pl.shape == y_ref.shape
    assert np.abs(y_pl - y_ref).max() < 1e-4


def test_fir_conv_k_weighting_kernel():
    from audiotools_tpu.ops.loudness import _exact_fir

    h = _exact_fir(44100, "K-weighting")
    x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 9000).astype(np.float32))
    y_pl = np.asarray(fir_conv_causal(x, h, interpret=True))
    y_ref = np.asarray(causal_fft_conv1d(x, jnp.asarray(h)))
    assert np.abs(y_pl - y_ref).max() < 1e-4


def test_fir_conv_impulse_identity():
    h = np.zeros(64, np.float32)
    h[0] = 1.0
    x = jnp.asarray(np.random.RandomState(3).randn(1, 1, 4000).astype(np.float32))
    y = np.asarray(fir_conv_causal(x, h, interpret=True))
    assert np.abs(y - np.asarray(x)).max() < 1e-6


def test_fir_conv_rejects_kernels_beyond_envelope():
    import pytest

    from audiotools_tpu.ops.pallas_kernels import MAX_TAPS, fir_conv_causal

    x = jnp.zeros((1, 4096), jnp.float32)
    with pytest.raises(ValueError):
        fir_conv_causal(x, np.zeros(MAX_TAPS + 1, np.float32))


def test_loudness_pallas_falls_back_for_exact_kernel():
    """conv_method='pallas' with the (3723-tap) exact kernel must fall back
    to the FFT path instead of exceeding the validated envelope."""
    from audiotools_tpu.ops import loudness as L

    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 44100).astype(np.float32) * 0.1)
    a = np.asarray(L.loudness(x, 44100))
    b = np.asarray(L.loudness(x, 44100, conv_method="pallas"))
    assert np.abs(a - b).max() < 1e-6


def test_fir_conv_causal_batch_per_item_kernels():
    """Per-item (traced) kernel variant matches per-item FFT convs."""
    from audiotools_tpu.ops.pallas_kernels import fir_conv_causal_batch

    rng = np.random.RandomState(7)
    B, T, K = 3, 5000, 481
    x = jnp.asarray(rng.randn(B, T).astype(np.float32))
    h = jnp.asarray((rng.randn(B, K) * 0.1).astype(np.float32))
    got = np.asarray(fir_conv_causal_batch(x, h, interpret=True))
    for i in range(B):
        want = np.asarray(causal_fft_conv1d(x[i], h[i]))
        assert np.abs(got[i] - want).max() / np.abs(want).max() < 1e-4


def test_fir_conv_causal_batch_rejects_mismatched_batch():
    from audiotools_tpu.ops.pallas_kernels import fir_conv_causal_batch

    x = jnp.zeros((2, 1000))
    h = jnp.zeros((3, 65))
    with pytest.raises(ValueError, match="batch"):
        fir_conv_causal_batch(x, h, interpret=True)


def test_equalizer_pallas_path_matches_fft():
    """The auto-selected MXU equalizer path (production on TPU) against
    the FFT evaluation of the same telescoped kernel, via interpret mode."""
    from audiotools_tpu.ops.filters import equalizer

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 1, 22050).astype(np.float32))
    db = jnp.asarray((rng.rand(2, 6) * 12 - 6).astype(np.float32))
    y_fft = np.asarray(equalizer(x, db, 44100, conv_method="fft"))
    y_pl = np.asarray(equalizer(x, db, 44100, conv_method="pallas_interpret"))
    assert np.abs(y_pl - y_fft).max() / np.abs(y_fft).max() < 1e-4


def test_equalizer_pallas_broadcasts_batch1_curve():
    """A shared EQ curve — db of shape (n_bands,) or (1, n_bands) — over a
    batched signal must broadcast on the Pallas path exactly as the FFT
    path does (reference effects.py:423-427 supports this; regression for
    a TPU-only 'kernel batch != signal batch' crash)."""
    from audiotools_tpu.ops.filters import equalizer

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(3, 2, 22050).astype(np.float32))
    for db in (
        jnp.asarray((rng.rand(6) * 12 - 6).astype(np.float32)),
        jnp.asarray((rng.rand(1, 6) * 12 - 6).astype(np.float32)),
    ):
        y_fft = np.asarray(equalizer(x, db, 44100, conv_method="fft"))
        y_pl = np.asarray(
            equalizer(x, db, 44100, conv_method="pallas_interpret")
        )
        assert y_pl.shape == x.shape
        assert np.abs(y_pl - y_fft).max() / np.abs(y_fft).max() < 1e-4
