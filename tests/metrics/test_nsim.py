"""Device NSIM backend for ViSQOL (ops/nsim.py, quality.visqol).

No Google ViSQOL oracle exists in this image, so these tests pin the
defining properties: identical signals score NSIM 1.0 / the anchored
MOS maximum, independent degradation ladders are strictly monotonic in
both modes, the frame-shift alignment absorbs bulk delay, the whole
batch runs as one jitted program, and the AudioSignal wrapper semantics
match the reference's visqol signature (reference quality.py:105-159)."""
import numpy as np
import pytest

import jax.numpy as jnp

from audiotools_tpu import AudioSignal
from audiotools_tpu.ops.nsim import MODES, nsim_batch, nsim_to_moslqo


def _speech(seed, dur, fs):
    rng = np.random.RandomState(seed)
    t = np.arange(int(dur * fs)) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t + rng.rand() * 6)
    ph = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(np.sin(k * ph) / k for k in range(1, 12))
    x = x + 0.3 * rng.randn(len(t)) * np.sin(2 * np.pi * 2.5 * t) ** 2
    env = np.clip(np.sin(2 * np.pi * 1.8 * t + rng.rand() * 6), 0, 1) ** 0.5
    x = x * env
    return (x / (np.abs(x).max() + 1e-9) * 0.3).astype(np.float32)


def _noisy(x, snr_db, seed=100):
    n = np.random.RandomState(seed).randn(len(x)).astype(np.float32)
    n *= np.sqrt(np.mean(x**2) / np.mean(n**2)) * 10 ** (-snr_db / 20)
    return x + n


@pytest.mark.parametrize("mode", ["speech", "audio"])
def test_identity_and_awgn_ladder(mode):
    fs = MODES[mode]["fs"]
    x = _speech(0, 1.5, fs)
    degs = [x.copy()] + [_noisy(x, snr) for snr in (30, 20, 10, 0)]
    ref = jnp.asarray(np.stack([x] * len(degs)))
    deg = jnp.asarray(np.stack(degs))
    ns = np.asarray(nsim_batch(ref, deg, mode=mode))
    assert abs(ns[0] - 1.0) < 1e-4  # identical -> exactly 1
    assert np.all(np.diff(ns) < 0)  # strictly decreasing with noise
    assert ns[-1] < 0.85
    mos = np.asarray(nsim_to_moslqo(ns))
    assert abs(mos[0] - 4.73) < 0.01
    assert np.all(np.diff(mos) < 0)
    assert np.all((mos >= 1.0) & (mos <= 5.0))


def test_quant_ladder_and_delay():
    fs = MODES["speech"]["fs"]
    x = _speech(3, 1.5, fs)
    delayed = np.concatenate([np.zeros(int(0.05 * fs), np.float32), x])[: len(x)]
    degs = [np.round(x * (1 << b)) / (1 << b) for b in (8, 6, 4)] + [delayed]
    ref = jnp.asarray(np.stack([x] * len(degs), dtype=np.float32))
    ns = np.asarray(
        nsim_batch(ref, jnp.asarray(np.stack(degs), dtype=jnp.float32))
    )
    assert ns[0] > ns[1] > ns[2]  # quantization ladder
    assert ns[3] > 0.97  # 50 ms bulk delay absorbed by the shift search


def test_batch_is_per_item():
    """Each batch item aligns and scores independently."""
    fs = MODES["speech"]["fs"]
    a, b = _speech(1, 1.0, fs), _speech(2, 1.0, fs)
    ref = jnp.asarray(np.stack([a, b]))
    deg = jnp.asarray(np.stack([_noisy(a, 5.0), b]))
    ns = np.asarray(nsim_batch(ref, deg, mode="speech"))
    assert ns[0] < 0.92 and abs(ns[1] - 1.0) < 1e-4


def test_argument_validation_and_trim():
    fs = MODES["speech"]["fs"]
    x = _speech(7, 1.0, fs)
    # sub-frame input: a clear error, not a zero-size reduction crash
    with pytest.raises(ValueError, match="too short"):
        nsim_batch(x[None, :400], x[None, :400], mode="speech")
    with pytest.raises(ValueError, match="mode"):
        nsim_batch(x[None], x[None], mode="nope")
    # unequal lengths trim to the shorter signal instead of a broadcast
    # error; a one-hop tail must barely move the score
    deg = _noisy(x, 15.0)
    base = float(nsim_batch(x[None], deg[None], mode="speech")[0])
    longer = np.concatenate([deg, np.zeros(128, np.float32)])
    out = float(nsim_batch(x[None], longer[None], mode="speech")[0])
    assert abs(out - base) < 0.02


def test_visqol_wrapper_nsim_backend():
    from audiotools_tpu.metrics import quality

    sr = 44100
    clean = _speech(5, 1.2, sr)
    est = AudioSignal(
        np.stack([clean, _noisy(clean, 8.0)])[:, None, :].astype(np.float32), sr
    )
    ref = AudioSignal(
        np.stack([clean, clean])[:, None, :].astype(np.float32), sr
    )
    for mode in ("audio", "speech"):
        out = np.asarray(quality.visqol(est, ref, mode=mode, backend="nsim"))
        assert out.shape == (2,)
        assert out[0] > 4.3  # clean vs clean (through a 44.1k resample)
        assert out[1] < out[0] - 0.8

    try:
        import visqol  # noqa: F401
    except ImportError:
        auto = np.asarray(quality.visqol(est, ref, mode="audio"))
        nsim = np.asarray(quality.visqol(est, ref, mode="audio", backend="nsim"))
        np.testing.assert_allclose(auto, nsim, atol=1e-9)

    with pytest.raises(ValueError, match="Unrecognized mode"):
        quality.visqol(est, ref, mode="nope", backend="nsim")
    with pytest.raises(ValueError, match="backend"):
        quality.visqol(est, ref, backend="nope")
