"""DSP mixin tests (mirroring reference tests/core/test_dsp.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from tests.fixtures import speech_like


def _speech(seed=0, dur=2.0):
    return AudioSignal(speech_like(seed, dur)[None, None], 44100)


def test_collect_windows_overlap_add_identity():
    """collect_windows -> overlap_and_add reconstructs the signal
    (reference tests/core/test_dsp.py:12-39)."""
    for win_dur, hop_dur in [(0.1, 0.05), (0.2, 0.1), (0.1, 0.025)]:
        sig = _speech()
        original = sig.numpy()
        sig.collect_windows(win_dur, hop_dur)
        sig.overlap_and_add(hop_dur)
        recon = sig.numpy()
        n = min(recon.shape[-1], original.shape[-1])
        assert np.allclose(recon[..., :n], original[..., :n], rtol=1e-3, atol=1e-5)


def test_collect_windows_survives_jit_boundary():
    """The windowing bookkeeping (original batch/channels, padded length)
    rides the pytree aux data, so collect_windows under jit +
    overlap_and_add outside still reconstructs — regression for the
    state reverting to class-level None across tree_unflatten."""
    import jax

    sig = _speech()
    original = sig.numpy()
    windowed = jax.jit(lambda s: s.collect_windows(0.1, 0.05))(sig)
    recon = windowed.overlap_and_add(0.05).numpy()
    n = min(recon.shape[-1], original.shape[-1])
    assert np.allclose(recon[..., :n], original[..., :n], rtol=1e-3, atol=1e-5)


def test_windows_generator():
    sig = _speech()
    wins = list(sig.clone().windows(0.5, 0.25))
    assert len(wins) > 0
    for w in wins:
        assert w.signal_length == int(0.5 * 44100)


def test_low_pass_removes_sine():
    """440 Hz sine through low_pass(220) vanishes
    (reference tests/core/test_dsp.py:76-97)."""
    sig = AudioSignal.wave(440, 1.0, 44100)
    out = sig.clone().low_pass(220)
    # loudness drops dramatically
    assert float(out.loudness()[0]) < float(sig.loudness()[0]) - 30


def test_high_pass_removes_sine():
    sig = AudioSignal.wave(440, 1.0, 44100)
    out = sig.clone().high_pass(1000)
    assert float(out.loudness()[0]) < float(sig.loudness()[0]) - 30


def test_mask_frequencies():
    """Masked sine components are removed
    (reference tests/core/test_dsp.py:112-124)."""
    sig = AudioSignal.wave(440, 1.0, 44100) + AudioSignal.wave(4000, 1.0, 44100)
    sig.stft()
    sig.mask_frequencies(3500, 4500)
    sig.istft()
    spec = np.abs(np.fft.rfft(sig.numpy()[0, 0]))
    freqs = np.fft.rfftfreq(sig.signal_length, 1 / 44100)
    band = (freqs > 3500) & (freqs < 4500)
    keep = (freqs > 300) & (freqs < 600)
    assert spec[band].max() < 0.01 * spec[keep].max()


def test_mask_timesteps():
    sig = AudioSignal.wave(440, 2.0, 44100)
    sig.stft()
    sig.mask_timesteps(0.75, 1.25)
    sig.istft()
    x = sig.numpy()[0, 0]
    mid = np.abs(x[int(0.95 * 44100) : int(1.05 * 44100)]).max()
    edge = np.abs(x[: int(0.5 * 44100)]).max()
    assert mid < 0.1 * edge


def test_mask_low_magnitudes():
    sig = _speech()
    sig.stft()
    before = float(jnp.abs(sig.stft_data).sum())
    sig.mask_low_magnitudes(0.0)
    after = float(jnp.abs(sig.stft_data).sum())
    assert after < before


def test_shift_and_corrupt_phase():
    import jax

    sig = _speech()
    sig.stft()
    phase0 = np.asarray(sig.phase)
    sig.shift_phase(np.pi / 2)
    sig2 = _speech()
    sig2.stft()
    sig2.corrupt_phase(0.5, key=jax.random.PRNGKey(0))
    assert sig2.stft_data is not None
    sig3 = _speech()
    sig3.stft()
    sig3.corrupt_phase(0.5)  # host RNG path
    assert sig3.stft_data is not None


def test_preemphasis_shapes():
    sig = _speech()
    out = sig.clone().preemphasis()
    assert out.shape == sig.shape
