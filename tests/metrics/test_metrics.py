"""Loss/metric tests (mirroring reference tests/metrics/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu import AudioSignal, metrics
from tests.fixtures import speech_like


def _pair(snr_db=20.0, dur=2.0):
    clean = AudioSignal(speech_like(0, dur)[None, None], 44100)
    noise = np.random.RandomState(1).randn(1, 1, clean.signal_length).astype(
        np.float32
    )
    scale = 10 ** (-snr_db / 20) * np.abs(clean.numpy()).std() / noise.std()
    noisy = AudioSignal(clean.numpy() + noise * scale, 44100)
    return noisy, clean


def test_l1_loss():
    x, y = _pair()
    loss = metrics.distance.L1Loss()
    v = float(loss(x, y))
    assert v > 0
    assert float(loss(y, y)) == 0.0
    # arbitrary attribute
    loss2 = metrics.distance.L1Loss(attribute="magnitude")
    assert float(loss2(x.clone(), y.clone())) > 0
    # raw arrays
    assert float(loss(x.audio_data, y.audio_data)) == v


def test_sisdr_loss_ordering():
    loss = metrics.distance.SISDRLoss()
    x20, y = _pair(20.0)
    x5, _ = _pair(5.0)
    v_clean = float(loss(y, y.clone()))
    v20 = float(loss(y, x20))
    v5 = float(loss(y, x5))
    # cleaner estimate -> lower (more negative) loss
    assert v_clean < v20 < v5


def test_sisdr_options():
    x, y = _pair()
    for scaling in [True, False]:
        for zero_mean in [True, False]:
            loss = metrics.distance.SISDRLoss(scaling=scaling, zero_mean=zero_mean)
            assert np.isfinite(float(loss(y, x)))
    loss = metrics.distance.SISDRLoss(clip_min=-10)
    assert float(loss(y, y.clone())) >= -10
    loss = metrics.distance.SISDRLoss(reduction="sum")
    batch = AudioSignal(
        np.stack([speech_like(i, 1.0) for i in range(3)])[:, None], 44100
    )
    assert np.isfinite(float(loss(batch, batch.clone() + 0.01)))
    loss_none = metrics.distance.SISDRLoss(reduction=None)
    out = loss_none(batch, batch.clone() + 0.01)
    assert out.shape[0] == 3


def test_multiscale_stft_loss():
    x, y = _pair()
    loss = metrics.spectral.MultiScaleSTFTLoss()
    v = float(loss(x.clone(), y.clone()))
    assert v > 0
    assert float(loss(y.clone(), y.clone())) == 0.0
    # closer signals -> smaller loss
    x2, _ = _pair(40.0)
    assert float(loss(x2.clone(), y.clone())) < v


def test_mel_loss():
    x, y = _pair()
    loss = metrics.spectral.MelSpectrogramLoss()
    v = float(loss(x.clone(), y.clone()))
    assert v > 0
    assert float(loss(y.clone(), y.clone())) == 0.0
    x2, _ = _pair(40.0)
    assert float(loss(x2.clone(), y.clone())) < v


def test_phase_loss():
    x, y = _pair()
    loss = metrics.spectral.PhaseLoss()
    v = float(loss(x.clone(), y.clone()))
    assert v > 0
    assert float(loss(y.clone(), y.clone())) == 0.0


def test_losses_differentiable():
    """Gradient flows through the loss stack (reference
    tests/core/test_grad.py analog for losses)."""
    x, y = _pair()

    def compute(audio):
        est = AudioSignal(audio, 44100)
        ref = y.clone()
        l = metrics.spectral.MelSpectrogramLoss()(est, ref)
        l += metrics.spectral.MultiScaleSTFTLoss()(est.clone(), ref.clone())
        l += metrics.distance.SISDRLoss()(ref.clone(), est.clone())
        return l

    g = jax.grad(compute)(x.audio_data)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_stoi_native():
    """Native STOI: clean vs clean ~ 1.0; noisier -> lower."""
    x20, y = _pair(20.0, dur=3.0)
    x0, _ = _pair(0.0, dur=3.0)
    s_clean = float(metrics.quality.stoi(y.clone(), y.clone())[0])
    s20 = float(metrics.quality.stoi(x20, y.clone())[0])
    s0 = float(metrics.quality.stoi(x0, y.clone())[0])
    assert s_clean > 0.99
    assert s_clean >= s20 >= s0
    assert s0 < 0.97


def test_estoi_invariants():
    """Extended STOI (eSTOI, Jensen & Taal 2016): the double row/column
    normalization plus the /N scaling makes identical signals score
    exactly 1 (the pre-fix band-only normalization happened to score 1
    on identity too, but diverged on any real pair — so also pin the
    noise ordering and that eSTOI penalizes modulated noise at least as
    hard as STOI at low SNR)."""
    x20, y = _pair(20.0, dur=3.0)
    x0, _ = _pair(0.0, dur=3.0)
    e_clean = float(
        metrics.quality.stoi(y.clone(), y.clone(), extended=True)[0]
    )
    e20 = float(metrics.quality.stoi(x20, y.clone(), extended=True)[0])
    e0 = float(metrics.quality.stoi(x0, y.clone(), extended=True)[0])
    assert abs(e_clean - 1.0) < 1e-5
    assert e_clean >= e20 >= e0
    assert e0 < 0.9


def test_pesq_visqol_gated():
    x, y = _pair()
    try:
        import pesq  # noqa
        has_pesq = True
    except ImportError:
        has_pesq = False
    if not has_pesq:
        # backend='itu' demands the C extension...
        with pytest.raises(RuntimeError):
            metrics.quality.pesq(x, y, backend="itu")
        # ...but the default backend falls back to the native P.862
        # implementation and returns an in-range score
        out = np.asarray(metrics.quality.pesq(x, y))
        assert out.shape == (x.batch_size,)
        assert np.all((out >= 1.0) & (out <= 5.0))
    try:
        import visqol  # noqa
        has_visqol = True
    except ImportError:
        has_visqol = False
    if not has_visqol:
        with pytest.raises(RuntimeError):
            metrics.quality.visqol(x, y, backend="google")
        # the default backend falls back to the in-package device NSIM
        out = np.asarray(metrics.quality.visqol(x, y))
        assert out.shape == (x.batch_size,)
        assert np.all((out >= 1.0) & (out <= 5.0))


def test_stoi_device_matches_host():
    """The jitted batched device STOI reproduces the host float64 loop
    to float32 precision across SNRs, including a pair quiet enough to
    trigger silent-frame removal, and the extended variant."""
    from audiotools_tpu.ops import stoi as ops_stoi

    items = []
    for seed, snr in ((0, 25.0), (1, 10.0), (2, 0.0)):
        clean = speech_like(seed, 2.0)
        noise = np.random.RandomState(100 + seed).randn(len(clean)).astype(
            np.float32
        )
        scale = 10 ** (-snr / 20) * np.abs(clean).std() / noise.std()
        items.append((clean + noise * scale, clean))
    # one item with long silent stretches: exercises frame removal
    gated = speech_like(3, 2.0).copy()
    gated[: len(gated) // 3] = 0.0
    gated[-len(gated) // 4 :] = 0.0
    items.append((gated, gated))

    est = AudioSignal(np.stack([e for e, _ in items])[:, None, :], 44100)
    ref = AudioSignal(np.stack([r for _, r in items])[:, None, :], 44100)

    for extended in (False, True):
        host = np.asarray(
            metrics.quality.stoi(est.clone(), ref.clone(), extended=extended)
        )
        dev = np.asarray(
            metrics.quality.stoi_device(
                est.clone(), ref.clone(), extended=extended
            )
        )
        assert dev.shape == (len(items),)
        np.testing.assert_allclose(dev, host, atol=5e-4, rtol=0)

    # too-short input: undefined, NaN on both paths
    short = AudioSignal(np.zeros((1, 1, 2000), dtype=np.float32), 10000)
    assert np.isnan(
        np.asarray(metrics.quality.stoi_device(short.clone(), short.clone()))
    ).all()


def test_stoi_batch_trims_length_mismatch():
    """Unequal-length pairs trim to the common length (as the pesq/nsim
    batch programs do) — without the trim, framing the longer reference
    against the shorter estimate clamp-gathers duplicated tail frames and
    returns a plausible but wrong score."""
    from audiotools_tpu.ops.stoi import stoi_batch

    rng = np.random.RandomState(7)
    ref = rng.randn(2, 40000).astype(np.float32)
    est = ref[:, :38000] + 0.01 * rng.randn(2, 38000).astype(np.float32)
    mismatched = np.asarray(stoi_batch(ref, est))
    trimmed = np.asarray(stoi_batch(ref[:, :38000], est))
    np.testing.assert_allclose(mismatched, trimmed, atol=1e-6)
