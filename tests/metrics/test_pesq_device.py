"""Device PESQ (ops/pesq.py, quality.pesq_device).

The host P.862-architecture implementation (``metrics/_pesq.py``) is the
oracle: for zero-delay pairs the device program's roll-and-mask alignment
reduces to the host's trim, so scores must match to float32 precision.
Delayed pairs pin the alignment search (framing phase may differ from the
host by up to one hop — asserted qualitatively). The reference wraps the
``pesq`` C extension per item on the host (reference quality.py:64-102)
and has no batched or device path at all."""
import numpy as np
import pytest

import jax.numpy as jnp

from audiotools_tpu import AudioSignal
from audiotools_tpu.metrics._pesq import _MODES, pesq_native
from audiotools_tpu.metrics import quality
from audiotools_tpu.ops.pesq import pesq_batch


def _speech(seed, dur, fs):
    rng = np.random.RandomState(seed)
    t = np.arange(int(dur * fs)) / fs
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.7 * t + rng.rand() * 6)
    ph = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(np.sin(k * ph) / k for k in range(1, 10))
    env = np.clip(np.sin(2 * np.pi * 1.8 * t + rng.rand() * 6), 0, 1) ** 0.5
    x = x * env
    return (x / (np.abs(x).max() + 1e-9) * 0.3).astype(np.float32)


def _noisy(x, snr_db, seed=100):
    n = np.random.RandomState(seed).randn(len(x)).astype(np.float32)
    n *= np.sqrt(np.mean(x**2) / np.mean(n**2)) * 10 ** (-snr_db / 20)
    return x + n


@pytest.mark.parametrize("mode", ["wb", "nb"])
def test_matches_host_at_zero_delay(mode):
    fs = _MODES[mode].fs
    x = _speech(0, 2.0, fs)
    degs = [x.copy()] + [_noisy(x, snr) for snr in (30, 20, 10, 0)]
    dev = np.asarray(
        pesq_batch(np.stack([x] * len(degs)), np.stack(degs), mode=mode)
    )
    host = np.array(
        [
            pesq_native(x.astype(np.float64), d.astype(np.float64), fs, mode)
            for d in degs
        ]
    )
    np.testing.assert_allclose(dev, host, atol=2e-3)
    assert np.all(np.diff(dev) < 0)  # strictly decreasing with noise
    assert dev[0] > 4.4 and dev[-1] < 1.8


def test_alignment_absorbs_bulk_delay():
    fs = _MODES["wb"].fs
    x = _speech(3, 2.0, fs)
    deg = _noisy(x, 15.0)
    out = []
    for ms in (0, 12, 37):
        d = np.concatenate([np.zeros(int(ms * fs / 1000), np.float32), deg])
        out.append(float(pesq_batch(x[None], d[None, : len(x)], mode="wb")[0]))
    # without alignment a 37 ms shift would collapse the score toward 1;
    # with it, scores stay in a narrow band around the undelayed value
    assert all(abs(v - out[0]) < 0.2 for v in out[1:])
    assert min(out) > 1.6


def test_batch_is_per_item():
    fs = _MODES["wb"].fs
    a, b = _speech(1, 1.5, fs), _speech(2, 1.5, fs)
    refs = np.stack([a, b])
    degs = np.stack([_noisy(a, 5.0), b])
    dev = np.asarray(pesq_batch(refs, degs, mode="wb"))
    host0 = pesq_native(
        a.astype(np.float64), degs[0].astype(np.float64), fs, "wb"
    )
    host1 = pesq_native(b.astype(np.float64), b.astype(np.float64), fs, "wb")
    np.testing.assert_allclose(dev, [host0, host1], atol=2e-3)


def test_wrapper_matches_host_wrapper():
    sr = 44100
    clean = _speech(5, 1.5, sr)
    est = AudioSignal(
        np.stack([clean, _noisy(clean, 8.0)])[:, None, :].astype(np.float32), sr
    )
    ref = AudioSignal(np.stack([clean, clean])[:, None, :].astype(np.float32), sr)
    for mode in ("wb", "nb"):
        dev = np.asarray(quality.pesq_device(est, ref, mode=mode))
        host = np.asarray(quality.pesq(est, ref, mode=mode, backend="native"))
        np.testing.assert_allclose(dev, host, atol=2e-3)
    with pytest.raises(ValueError, match="mode"):
        quality.pesq_device(est, ref, mode="fb")


def test_too_short_raises():
    with pytest.raises(ValueError, match="too short"):
        pesq_batch(np.zeros((1, 512), np.float32), np.zeros((1, 512), np.float32))


def test_degenerate_silence_matches_host():
    """A silent degraded signal is the tie-break stress case: both paths
    must resolve the flat envelope correlation to lag 0 and agree, and
    the score must sit near the MOS floor (subtractive-loss channel)."""
    fs = _MODES["wb"].fs
    x = _speech(4, 2.0, fs)
    z = np.zeros_like(x)
    dev = float(pesq_batch(x[None], z[None], mode="wb")[0])
    host = pesq_native(x.astype(np.float64), z.astype(np.float64), fs, "wb")
    np.testing.assert_allclose(dev, host, atol=2e-3)
    assert dev < 1.5


def test_length_mismatch_trims_to_shorter():
    """Unequal-length pairs trim to the common length instead of dying
    inside jit with a broadcasting error; a few trailing samples must
    barely move the score."""
    fs = _MODES["wb"].fs
    x = _speech(6, 2.0, fs)
    deg = _noisy(x, 20.0)
    base = float(pesq_batch(x[None], deg[None], mode="wb")[0])
    longer = np.concatenate([deg, np.zeros(257, np.float32)])
    out = float(pesq_batch(x[None], longer[None], mode="wb")[0])
    assert abs(out - base) < 0.05


def test_no_aligned_overlap_is_nan():
    """When the estimated delay leaves no fully-valid frame, every
    disturbance term degenerates to zero and the raw score would sit at
    its 4.5 ceiling — a perfect MOS for a pair with no usable overlap.
    That case is undefined, not perfect: NaN (mirrors stoi's too-short
    guard)."""
    T = 16000
    rng = np.random.RandomState(0)
    click = (rng.randn(150) * 0.5).astype(np.float32)
    ref = np.zeros((1, T), np.float32)
    ref[0, :150] = click
    deg = np.zeros((1, T), np.float32)
    deg[0, T - 160 : T - 10] = click
    assert np.isnan(float(pesq_batch(ref, deg, mode="wb")[0]))
