"""Native P.862-architecture PESQ (metrics/_pesq.py).

No certified ITU oracle exists in this image (the ``pesq`` C extension is
not installable), so these tests pin the properties that define a usable
perceptual quality metric: the documented output range, strict
monotonicity along independent degradation ladders (additive noise,
clipping, quantization) on several distinct speech-like signals,
delay-invariance through the alignment stage, and the AudioSignal batch
wrapper semantics (reference quality.py:64-102)."""
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from audiotools_tpu.metrics._pesq import pesq_native


def _speech(seed, dur, fs):
    rng = np.random.RandomState(seed)
    t = np.arange(int(dur * fs)) / fs
    f0 = 100 + 40 * rng.rand() + 30 * np.sin(2 * np.pi * (0.5 + rng.rand()) * t)
    ph = 2 * np.pi * np.cumsum(f0) / fs
    x = sum(np.sin(k * ph) / k for k in range(1, 12))
    x = x + 0.3 * rng.randn(len(t)) * np.sin(2 * np.pi * (2 + rng.rand()) * t) ** 2
    env = np.clip(np.sin(2 * np.pi * (1.5 + rng.rand()) * t + rng.rand() * 6), 0, 1)
    x = x * np.sqrt(env)
    return (x / (np.abs(x).max() + 1e-9) * 0.3).astype(np.float64)


def _noisy(x, snr_db, seed=100):
    n = np.random.RandomState(seed).randn(len(x))
    n *= np.sqrt(np.mean(x**2) / np.mean(n**2)) * 10 ** (-snr_db / 20)
    return x + n


@pytest.mark.parametrize("mode,fs", [("nb", 8000), ("wb", 16000)])
def test_identical_scores_at_published_max(mode, fs):
    x = _speech(0, 2.0, fs)
    mos = pesq_native(x, x, fs, mode)
    # P.862.1 maps raw 4.5 to 4.549; the wb map is anchored at 4.64
    expected = 4.549 if mode == "nb" else 4.64
    assert abs(mos - expected) < 0.01


@pytest.mark.parametrize("mode,fs", [("nb", 8000), ("wb", 16000)])
@pytest.mark.parametrize("seed", [0, 7, 23])
def test_awgn_ladder_monotonic(mode, fs, seed):
    x = _speech(seed, 2.0, fs)
    scores = [pesq_native(x, _noisy(x, snr), fs, mode) for snr in (40, 25, 10)]
    ident = pesq_native(x, x, fs, mode)
    assert ident > scores[0] > scores[1] > scores[2]
    assert scores[2] < 2.5  # 10 dB SNR is clearly degraded
    for s in scores:
        assert 1.0 <= s <= 5.0


@pytest.mark.parametrize("mode,fs", [("nb", 8000), ("wb", 16000)])
def test_clip_and_quant_ladders_monotonic(mode, fs):
    x = _speech(3, 2.0, fs)
    peak = np.abs(x).max()
    clips = [
        pesq_native(x, np.clip(x, -c * peak, c * peak), fs, mode)
        for c in (0.5, 0.2, 0.05)
    ]
    assert clips[0] > clips[1] > clips[2]
    quants = [
        pesq_native(x, np.round(x * (1 << b)) / (1 << b), fs, mode)
        for b in (8, 6, 4)
    ]
    assert quants[0] > quants[1] > quants[2]


@pytest.mark.parametrize("mode,fs", [("nb", 8000), ("wb", 16000)])
def test_total_signal_loss_scores_low(mode, fs):
    """A silent or hum-only degraded signal is a total loss of the
    reference and must land near the MOS floor, not near the maximum
    (the subtractive-loss channel; sym/asym disturbances alone respond
    weakly to outright band-kill)."""
    x = _speech(0, 2.0, fs)
    t = np.arange(len(x)) / fs
    assert pesq_native(x, np.zeros_like(x), fs, mode) < 1.5
    hum = 0.1 * np.sin(2 * np.pi * 50.0 * t)
    assert pesq_native(x, hum, fs, mode) < 2.5
    # and the loss channel must not punish additive degradations:
    # identical still maps to the published maximum (pinned above) and
    # mild noise stays comfortably above the loss-dominated scores
    assert pesq_native(x, _noisy(x, 40.0), fs, mode) > 3.5


def test_flat_correlation_resolves_to_zero_lag():
    """With a constant degraded signal the envelope cross-correlation is
    flat; the tie must resolve to lag 0 (keeping the whole signal), not
    numpy-argmax's extreme negative lag (which trims ref to one window)."""
    from audiotools_tpu.metrics._pesq import _estimate_delay

    fs = 8000
    x = _speech(2, 2.0, fs)
    assert _estimate_delay(x, np.zeros_like(x), fs) == 0
    # a constant (non-zero) degraded signal may still move within the
    # +-2 ms fine window, but the coarse stage must not run away
    assert abs(_estimate_delay(x, np.full_like(x, 0.01), fs)) <= int(0.002 * fs)


def test_alignment_absorbs_delay():
    """A 50 ms bulk delay is a transport artifact, not a quality loss;
    the crude+fine alignment stage must recover it."""
    fs = 8000
    x = _speech(5, 2.0, fs)
    d = np.concatenate([np.zeros(int(0.05 * fs)), x])[: len(x)]
    assert pesq_native(x, d, fs, "nb") > 4.4


def test_argument_validation():
    x = _speech(0, 1.0, 8000)
    with pytest.raises(ValueError, match="mode"):
        pesq_native(x, x, 8000, "fb")
    # the wrapper validates mode up front for every backend (a bad mode
    # must raise ValueError, not KeyError from the native table lookup)
    from audiotools_tpu.metrics import quality

    sig = AudioSignal(x[None, None, :].astype(np.float32), 8000)
    with pytest.raises(ValueError, match="mode"):
        quality.pesq(sig, sig, mode="fb", backend="native")
    with pytest.raises(ValueError, match="fs"):
        pesq_native(x, x, 16000, "nb")
    with pytest.raises(ValueError, match="short"):
        pesq_native(x[:512], x[:512], 8000, "nb")


def test_audiosignal_wrapper_native_backend():
    """quality.pesq with backend='native' (and 'auto' in this image)
    scores per item; a noisy item lands below a clean one."""
    from audiotools_tpu.metrics import quality

    fs = 16000
    clean = _speech(1, 1.5, fs)
    batch = np.stack([clean, _noisy(clean, 10.0)])[:, None, :].astype(np.float32)
    est = AudioSignal(batch, fs)
    ref = AudioSignal(np.stack([clean, clean])[:, None, :].astype(np.float32), fs)

    out = np.asarray(quality.pesq(est, ref, mode="wb", backend="native"))
    assert out.shape == (2,)
    assert out[0] > 4.3  # clean vs clean
    assert out[1] < out[0] - 1.0

    # without the C extension, auto == native
    auto = np.asarray(quality.pesq(est, ref, mode="wb", backend="auto"))
    try:
        import pesq  # noqa: F401
    except ImportError:
        np.testing.assert_allclose(auto, out, atol=1e-9)

    # nb mode through the wrapper resamples to 8 kHz internally
    nb = np.asarray(quality.pesq(est, ref, mode="nb", backend="native"))
    assert nb[1] < nb[0]

    with pytest.raises(ValueError, match="backend"):
        quality.pesq(est, ref, backend="nope")
