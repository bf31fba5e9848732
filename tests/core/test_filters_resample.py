"""Filter-bank and resampler tests (analytic/property style, mirroring
reference tests/core/test_dsp.py and julius's own invariants)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.signal import lfilter

from audiotools_tpu.ops import filters as FL
from audiotools_tpu.ops import resample as R


def test_lowpass_kills_stopband():
    """Sine at 2x the cutoff is strongly attenuated in the interior
    (reference tests/core/test_dsp.py:76-97)."""
    sr = 44100
    sig = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)[None, None]
    out = np.asarray(FL.low_pass(jnp.asarray(sig), 220.0, sr, zeros=51))
    w = 12000
    assert np.abs(out[..., w:-w]).max() < 1e-3


def test_lowpass_passes_passband():
    sr = 44100
    sig = np.sin(2 * np.pi * 220 * np.arange(sr) / sr).astype(np.float32)[None, None]
    out = np.asarray(FL.low_pass(jnp.asarray(sig), 4000.0, sr, zeros=51))
    assert np.abs(out - sig)[..., 500:-500].max() < 1e-4


def test_highpass_is_complement():
    sr = 44100
    x = np.random.RandomState(0).randn(2, 1, 16384).astype(np.float32)
    lp = np.asarray(FL.low_pass(jnp.asarray(x), 2000.0, sr))
    hp = np.asarray(FL.high_pass(jnp.asarray(x), 2000.0, sr))
    assert np.abs(lp + hp - x).max() < 1e-5


def test_per_item_cutoffs():
    """Each batch item gets its own filter (the reference loops per item,
    dsp.py:177-179; we vmap) — results must match per-item application."""
    sr = 44100
    x = np.random.RandomState(1).randn(3, 1, 8192).astype(np.float32)
    cutoffs = np.array([1000.0, 4000.0, 8000.0], dtype=np.float32)
    batched = np.asarray(FL.low_pass(jnp.asarray(x), jnp.asarray(cutoffs), sr))
    for i, c in enumerate(cutoffs):
        single = np.asarray(FL.low_pass(jnp.asarray(x[i : i + 1]), float(c), sr))
        assert np.abs(batched[i] - single[0]).max() < 1e-5


def test_split_bands_partition_of_unity():
    """Bands sum exactly to the input (reference
    tests/core/test_effects.py:184-201)."""
    x = np.random.RandomState(1).randn(2, 1, 8192).astype(np.float32)
    for n_bands in [1, 3, 6]:
        bands = np.asarray(FL.split_bands(jnp.asarray(x), 44100, n_bands))
        assert bands.shape == (2, 1, 8192, n_bands)
        assert np.abs(bands.sum(-1) - x).max() < 1e-5


def test_equalizer_zero_db_identity():
    x = np.random.RandomState(2).randn(2, 1, 8192).astype(np.float32)
    out = np.asarray(FL.equalizer(jnp.asarray(x), np.zeros((2, 6), np.float32), 44100))
    assert np.abs(out - x).max() < 1e-5


def test_equalizer_gain_scales_band():
    """-80 dB on every band silences the signal; 0 dB passes it."""
    x = np.random.RandomState(3).randn(1, 1, 8192).astype(np.float32)
    out = np.asarray(
        FL.equalizer(jnp.asarray(x), np.full((1, 6), -80.0, np.float32), 44100)
    )
    assert np.abs(out).max() < 1e-4


def test_biquad_matches_scipy():
    b = np.array([0.2, 0.3, 0.1])
    a = np.array([1.0, -0.5, 0.25])
    x = np.random.RandomState(4).randn(3, 4096).astype(np.float32)
    y = np.asarray(jax.jit(FL.biquad)(jnp.asarray(x), jnp.asarray(b), jnp.asarray(a)))
    y_ref = lfilter(b, a, x, axis=-1)
    assert np.abs(y - y_ref).max() < 1e-4


def test_fft_conv_matches_direct():
    x = np.random.RandomState(5).randn(2, 1, 1024).astype(np.float32)
    k = np.random.RandomState(6).randn(1, 33).astype(np.float32)
    out = np.asarray(FL.fft_conv1d(jnp.asarray(x), jnp.asarray(k)))
    ref = np.stack(
        [
            [np.correlate(x[i, 0], k[0], mode="valid")]
            for i in range(2)
        ]
    )
    assert np.abs(out[:, :, 0] - ref[:, 0][:, None]).max() < 1e-4


def test_preemphasis_matches_reference_kernel():
    import torch

    x = np.random.RandomState(7).randn(2, 1, 4096).astype(np.float32)
    out = np.asarray(FL.preemphasis(jnp.asarray(x), 0.85))
    k = torch.tensor([1.0, -0.85, 0.0]).view(1, 1, -1)
    ref = (
        torch.nn.functional.conv1d(torch.from_numpy(x).reshape(-1, 1, 4096), k, padding=1)
        .numpy()
        .reshape(2, 1, 4096)
    )
    assert np.abs(out - ref).max() < 1e-5


# ---------------------------------------------------------------------------
# resampling
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("old,new", [(44100, 16000), (44100, 22050), (16000, 44100), (22050, 44100)])
def test_resample_length(old, new):
    x = np.random.RandomState(8).randn(1, 1, old).astype(np.float32)
    y = R.resample(jnp.asarray(x), old, new)
    assert y.shape[-1] == int(old * new / old)


def test_resample_preserves_sine():
    old, new = 44100, 16000
    x = np.sin(2 * np.pi * 440 * np.arange(old) / old).astype(np.float32)[None, None]
    y = np.asarray(R.resample(jnp.asarray(x), old, new))
    ideal = np.sin(2 * np.pi * 440 * np.arange(y.shape[-1]) / new)
    assert np.abs(y[0, 0, 100:-100] - ideal[100:-100]).max() < 1e-3


def test_resample_preserves_dc():
    dc = np.ones((1, 1, 44100), np.float32)
    y = np.asarray(R.resample(jnp.asarray(dc), 44100, 16000))
    assert np.abs(y[..., 100:-100] - 1).max() < 1e-4


def test_resample_roundtrip():
    x = np.sin(2 * np.pi * 440 * np.arange(44100) / 44100).astype(np.float32)[None, None]
    y = R.resample(R.resample(jnp.asarray(x), 44100, 22050), 22050, 44100)
    y = np.asarray(y)
    assert np.abs(y[..., 200:-200] - x[..., : y.shape[-1]][..., 200:-200]).max() < 1e-3


def test_resample_antialiases():
    """Content above the target Nyquist must be removed."""
    old, new = 44100, 16000
    t = np.arange(old) / old
    x = np.sin(2 * np.pi * 10000 * t).astype(np.float32)[None, None]  # > 8k Nyquist
    y = np.asarray(R.resample(jnp.asarray(x), old, new))
    assert np.abs(y[..., 200:-200]).max() < 0.05


def test_identity_resample():
    x = np.random.RandomState(9).randn(1, 1, 1000).astype(np.float32)
    y = R.resample(jnp.asarray(x), 44100, 44100)
    assert y is not None and np.abs(np.asarray(y) - x).max() == 0


# ---------------------------------------------------------------------------
# overlap-save block convolution
# ---------------------------------------------------------------------------


def test_overlap_save_matches_fft_conv():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 1, 7001).astype(np.float32))
    k = jnp.asarray(rng.randn(4, 513).astype(np.float32))
    v0 = FL.fft_conv1d(x, k)
    v1 = FL.overlap_save_valid(x[..., None, :], k, 2048)
    assert np.abs(np.asarray(v0 - v1)).max() < 1e-4


def test_overlap_save_rejects_small_block():
    x = jnp.zeros((1, 256))
    k = jnp.zeros((129,))
    with pytest.raises(ValueError):
        FL.overlap_save_valid(x, k, 128)


def test_low_pass_block_matches_full():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(3, 2, 22050).astype(np.float32))
    cut = jnp.asarray([4000.0, 8000.0, 16000.0])
    y0 = FL.low_pass(x, cut, 44100)
    y1 = FL.low_pass(x, cut, 44100, block_size=2048)
    assert np.abs(np.asarray(y0 - y1)).max() < 1e-5


def test_split_bands_block_matches_full():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 1, 22050).astype(np.float32))
    b0 = FL.split_bands(x, 44100, 6)
    b1 = FL.split_bands(x, 44100, 6, block_size=16384)
    assert np.abs(np.asarray(b0 - b1)).max() < 1e-5
    assert np.abs(np.asarray(b1.sum(-1) - x)).max() < 1e-5


def test_low_pass_concrete_cutoff_tightens_support():
    """A tight static support gives identical output to a much wider one
    (the sinc taps outside the per-cutoff support are zero). The wide run
    uses traced cutoffs under jit so the concrete-cutoff tightening can't
    silently shrink its 400 Hz support."""
    import jax

    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 1, 8000).astype(np.float32))
    wide = jax.jit(
        lambda a, c: FL.low_pass(a, c, 44100, min_cutoff_hz=400.0)
    )(x, jnp.asarray([4000.0]))
    tight = FL.low_pass(x, jnp.asarray([4000.0]), 44100)  # concrete -> 4k support
    # 5e-6: same filter evaluated over different static supports; exact
    # bits shift with XLA reassociation (e.g. backend optimization level)
    assert np.abs(np.asarray(wide - tight)).max() < 5e-6


def test_iir_cascade_blocked_matches_sequential_f64():
    """Block state-space lifting == the sequential float64 ``lfilter``
    cascade on the BS.1770 K-weighting stages (the exact-meter path,
    reference loudness.py:102-126). Covers a T not divisible by the block
    (pad/crop) and a (B, C, T) batch shape."""
    from audiotools_tpu.ops.loudness import design_filters

    sr = 44100
    stages = [(b, a, g) for (b, a), g in design_filters(sr, "K-weighting")]
    rng = np.random.RandomState(8)
    x = rng.randn(2, 2, 10000).astype(np.float32)

    ref = x.astype(np.float64)
    for b, a, g in stages:
        ref = g * lfilter(b, a, ref, axis=-1)

    for blk in (128, 512, 1024):
        y = np.asarray(FL.iir_cascade_blocked(jnp.asarray(x), stages, block=blk))
        assert y.shape == x.shape
        # f32 state drift at the near-DC high-pass pole grows with T
        # (~2e-4 abs here at 10 k samples, ~2e-8 dB on gated energies)
        assert np.abs(y - ref).max() < 5e-4, blk


def test_iir_cascade_blocked_matches_biquad_cascade():
    """Blocked lifting agrees with the associative-scan ``biquad_cascade``
    on a generic (non-loudness) stage list, under jit."""
    stages = [
        (np.array([0.2, 0.3, 0.1]), np.array([1.0, -0.5, 0.25]), 1.3),
        (np.array([1.0, -1.2, 0.4]), np.array([1.0, -0.3, 0.02]), 0.7),
    ]
    rng = np.random.RandomState(9)
    x = rng.randn(3, 700).astype(np.float32)
    y0 = np.asarray(FL.biquad_cascade(jnp.asarray(x), stages))
    y1 = np.asarray(
        jax.jit(lambda a: FL.iir_cascade_blocked(a, stages, block=256))(
            jnp.asarray(x)
        )
    )
    assert np.abs(y0 - y1).max() < 2e-4


@pytest.mark.parametrize("old,new", [(55, 49), (49, 55), (2, 3), (1, 2)])
def test_resample_custom_vjp_matches_autodiff(old, new):
    """The device resample's custom adjoint (stride-1 residue-bank conv,
    ops/resample.py::_resample_device_diff) against XLA's autodiff of the
    same primal. Why it exists: XLA's automatic transpose of the strided
    polyphase conv measured 13.1 s at bench shapes on v5e — the entire
    cost of jax.grad(pitch_shift) (tests/hw/hw_pitch_grad_time.py)."""
    from audiotools_tpu.ops import resample as R

    T = 2003
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(2, T) * 0.3).astype(np.float32))
    f = R._resample_device_diff(old, new, 24, 0.945, T)

    kernels, width = R.resample_kernels(old, new, 24, 0.945)

    def primal(a):
        xp = jnp.pad(
            a[:, None, :], ((0, 0), (0, 0), (width, width + old)), mode="edge"
        )
        y = jax.lax.conv_general_dilated(
            xp, jnp.asarray(kernels)[:, None, :], (old,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGH,
        )
        y = jnp.swapaxes(y, -1, -2).reshape((a.shape[0], -1))
        return y[..., : int(T * new / old)]

    def make_loss(fn):
        def loss(a):
            out = fn(a)
            w = jnp.sin(jnp.arange(out.shape[-1]) * 0.13)
            return jnp.sum(out * w) + 0.1 * jnp.sum(out**2)

        return loss

    fe = float(
        jnp.abs(jax.jit(f)(x) - jax.jit(primal)(x)).max()
        / jnp.abs(jax.jit(primal)(x)).max()
    )
    gc = jax.jit(jax.grad(make_loss(f)))(x)
    ga = jax.jit(jax.grad(make_loss(primal)))(x)
    ge = float(jnp.abs(gc - ga).max() / (jnp.abs(ga).max() + 1e-12))
    assert fe < 3e-5, fe
    assert ge < 1e-4, ge
