"""Sequence-parallel (time-sharded) DSP tests on the 8-device mesh:
halo-exchange results must match single-device computation exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu.ops.fft import istft, stft
from audiotools_tpu.ops.filters import causal_fft_conv1d
from audiotools_tpu.ops.loudness import integrated_loudness
from audiotools_tpu.parallel import (
    make_mesh,
    sharded_fir_conv,
    sharded_frames,
    sharded_istft,
    sharded_loudness,
    sharded_stft,
)


def test_make_mesh():
    mesh = make_mesh()
    assert mesh.size == 8 and mesh.axis_names == ("dp",)
    mesh = make_mesh({"dp": 2, "sp": -1})
    assert mesh.shape["sp"] == 4


def test_sharded_fir_conv_matches_local():
    mesh = make_mesh({"sp": 8})
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1, 8 * 4096).astype(np.float32))
    h = jnp.asarray(np.random.RandomState(1).randn(501).astype(np.float32) * 0.05)

    y_ref = np.asarray(causal_fft_conv1d(x, h))
    y_sh = np.asarray(sharded_fir_conv(x, h, mesh))
    assert y_sh.shape == y_ref.shape
    assert np.abs(y_sh - y_ref).max() < 1e-4


def test_sharded_fir_conv_length_one_kernel():
    """K=1 is a pure gain: the halo path would slice block[..., -0:]
    (the whole shard) and emit a doubled-length output — regression for
    the degenerate-kernel guard."""
    mesh = make_mesh({"sp": 8})
    x = jnp.asarray(np.random.RandomState(2).randn(1, 1, 8 * 64).astype(np.float32))
    h = jnp.asarray(np.array([0.5], np.float32))
    y = np.asarray(sharded_fir_conv(x, h, mesh))
    assert y.shape == x.shape
    assert np.allclose(y, 0.5 * np.asarray(x))


def test_sharded_fir_conv_jits_with_sharded_input():
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = make_mesh({"sp": 8})
    x = jnp.asarray(np.random.RandomState(0).randn(1, 1, 8 * 2048).astype(np.float32))
    x = jax.device_put(x, NamedSharding(mesh, P(None, None, "sp")))
    h = jnp.asarray(np.random.RandomState(1).randn(65).astype(np.float32))
    with mesh:
        y = jax.jit(lambda a: sharded_fir_conv(a, h, mesh))(x)
    y_ref = np.asarray(causal_fft_conv1d(x, h))
    assert np.abs(np.asarray(y) - y_ref).max() < 1e-4


def test_sharded_frames_match_local():
    mesh = make_mesh({"sp": 8})
    B, T = 2, 8 * 2048
    frame_length, hop = 512, 128
    x = jnp.asarray(np.random.RandomState(2).randn(B, T).astype(np.float32))

    frames, n_valid = sharded_frames(x, frame_length, hop, mesh)
    frames = np.asarray(frames)
    # single-device reference framing: only complete windows
    n_ref = 1 + (T - frame_length) // hop
    assert n_valid == n_ref
    idx = np.arange(n_ref)[:, None] * hop + np.arange(frame_length)[None, :]
    ref = np.asarray(x)[:, idx]
    assert np.abs(frames[:, :n_valid] - ref).max() == 0
    # frames past the signal end are zeroed, not silently wrong
    assert np.abs(frames[:, n_valid:]).max() == 0


@pytest.mark.parametrize(
    "hop_div,method", [(4, "fft"), (2, "matmul")]  # cross product adds no path
)
def test_sharded_stft_matches_single_device(hop_div, method):
    mesh = make_mesh({"sp": 8})
    win = 512
    hop = win // hop_div
    B, T = 2, 8 * 4 * win
    x = jnp.asarray(np.random.RandomState(3).randn(B, T).astype(np.float32))

    spec_sh, n_valid = sharded_stft(x, win, hop, mesh, method=method)
    spec_ref = np.asarray(stft(x, win, hop, method=method))
    assert n_valid == spec_ref.shape[-1]
    got = np.asarray(spec_sh)[..., :n_valid]
    scale = np.abs(spec_ref).max()
    assert np.abs(got - spec_ref).max() / scale < 1e-5
    # surplus frames are zeroed
    assert np.abs(np.asarray(spec_sh)[..., n_valid:]).max() == 0


@pytest.mark.parametrize("hop_div", [2, 4])
def test_sharded_istft_roundtrip_matches_single_device(hop_div):
    """sharded_istft(sharded_stft(x)) must equal single-device
    istft(stft(x)) at 1e-5 — including the window-square normalization
    at the signal edges (SURVEY §5.7 long-signal story)."""
    mesh = make_mesh({"sp": 8})
    win = 512
    hop = win // hop_div
    B, T = 2, 8 * 4 * win
    x = jnp.asarray(np.random.RandomState(4).randn(B, T).astype(np.float32))

    spec_sh, n_valid = sharded_stft(x, win, hop, mesh)
    y_sh = np.asarray(
        sharded_istft(spec_sh, win, hop, mesh, n_valid=n_valid)
    )
    assert y_sh.shape == (B, T)

    spec_ref = stft(x, win, hop)
    y_ref = np.asarray(istft(spec_ref, win, hop, length=T))
    assert np.abs(y_sh - y_ref).max() < 1e-5
    # and the round trip reconstructs the signal itself
    assert np.abs(y_sh - np.asarray(x)).max() < 1e-4


def test_sharded_istft_consumes_single_device_stft():
    """Cross-check: a single-device spectrogram, zero-extended to the
    sharded frame grid, inverts to the same audio."""
    mesh = make_mesh({"sp": 8})
    win, hop = 512, 128
    B, T = 1, 8 * 4 * win
    x = jnp.asarray(np.random.RandomState(5).randn(B, T).astype(np.float32))

    spec_ref = stft(x, win, hop)
    n_valid = spec_ref.shape[-1]
    nf_pad = 8 * (T // 8 // hop + 1)
    spec_pad = jnp.pad(spec_ref, ((0, 0), (0, 0), (0, nf_pad - n_valid)))
    y = np.asarray(sharded_istft(spec_pad, win, hop, mesh, n_valid=n_valid))
    y_ref = np.asarray(istft(spec_ref, win, hop, length=T))
    assert np.abs(y - y_ref).max() < 1e-5


@pytest.mark.parametrize("nch", [1, 2])
def test_sharded_loudness_matches_meter(nch):
    """Full BS.1770 meter (absolute AND relative gates, K-weighting) on
    the 8-device mesh matches the single-device meter at 1e-5 LUFS."""
    mesh = make_mesh({"sp": 8})
    rate = 16000
    B, T = 2, 8 * 17600  # 8.8 s sharded over 8 devices
    rng = np.random.RandomState(6)
    x = rng.randn(B, nch, T).astype(np.float32) * 0.1
    # quiet stretch so both gates engage
    x[:, :, T // 3 : T // 2] *= 1e-4

    lufs_sh = np.asarray(sharded_loudness(jnp.asarray(x), rate, mesh))
    lufs_ref = np.asarray(
        integrated_loudness(jnp.swapaxes(jnp.asarray(x), -1, -2), rate)
    )
    assert lufs_sh.shape == (B,)
    assert np.abs(lufs_sh - lufs_ref).max() < 1e-5


def test_sharded_loudness_relative_gate_engages():
    """Construct a signal where skipping the relative gate changes the
    answer, so the test fails if the second psum pass is dropped."""
    mesh = make_mesh({"sp": 8})
    rate = 16000
    B, T = 1, 8 * 17600
    rng = np.random.RandomState(7)
    # loud head, long -40 dB-ish tail: tail passes the absolute gate but
    # falls below (mean - 10) so the relative gate must remove it
    x = np.concatenate(
        [
            rng.randn(B, 1, T // 4).astype(np.float32) * 0.5,
            rng.randn(B, 1, 3 * T // 4).astype(np.float32) * 0.003,
        ],
        axis=-1,
    )
    lufs_sh = float(np.asarray(sharded_loudness(jnp.asarray(x), rate, mesh))[0])
    lufs_ref = float(
        np.asarray(integrated_loudness(jnp.swapaxes(jnp.asarray(x), -1, -2), rate))[0]
    )
    assert abs(lufs_sh - lufs_ref) < 1e-5

    # absolute-only answer differs materially — proves the gate matters
    from audiotools_tpu.ops.loudness import CHANNEL_GAINS, apply_k_weighting

    filtered = np.asarray(apply_k_weighting(jnp.asarray(x), rate))
    kn, stride = int(0.4 * rate), int(0.1 * rate)
    nf = (T - kn) // stride + 1
    idx = np.arange(nf)[:, None] * stride + np.arange(kn)[None, :]
    z = (filtered[:, :, idx] ** 2).sum(-1) / (0.4 * rate)  # (B, C, nf)
    l = -0.691 + 10 * np.log10((CHANNEL_GAINS[:1, None] * z).sum(1))
    keep = l > -70.0
    z_abs = np.where(keep[:, None], z, 0).sum(-1) / keep.sum(-1)
    lufs_abs_only = float(-0.691 + 10 * np.log10(z_abs.sum(-1))[0])
    assert abs(lufs_abs_only - lufs_ref) > 0.5


@pytest.mark.parametrize("old_new", [(2, 3), (3, 2), (147, 160), (160, 147)])
def test_sharded_resample_matches_single_device(old_new):
    """sharded_resample == ops.resample.resample at 1e-6 across up/down
    rational ratios (147/160 is the 44.1k<->48k pair)."""
    from audiotools_tpu.ops.resample import resample
    from audiotools_tpu.parallel import sharded_resample

    old, new = old_new
    n_dev = 8
    # shard length must be a multiple of the reduced old rate
    T = n_dev * old * 40
    rng = np.random.RandomState(0)
    x = jnp.asarray((rng.randn(2, T) * 0.1).astype(np.float32))
    mesh = make_mesh({"sp": n_dev})

    want = np.asarray(resample(x, old, new))
    got = np.asarray(sharded_resample(x, old, new, mesh))
    assert got.shape == want.shape, (got.shape, want.shape)
    err = np.abs(got - want).max()
    assert err < 1e-6, (old, new, err)


def test_sharded_resample_shard_constraint():
    from audiotools_tpu.parallel import sharded_resample

    mesh = make_mesh({"sp": 8})
    x = jnp.zeros((1, 8 * 7))  # shard length 7 not divisible by old=2
    with pytest.raises(ValueError):
        sharded_resample(x, 2, 3, mesh)


def test_halo_overflow_rejected_not_silent():
    """Halos longer than one shard used to clamp silently (the slice
    block[..., -halo:] just shortens), returning wrong-length or
    wrong-valued arrays; both primitives must reject them loudly."""
    from audiotools_tpu.parallel import sharded_resample

    mesh = make_mesh({"sp": 8})
    # FIR kernel history (K-1 = 128) exceeds T_shard = 64
    x = jnp.zeros((1, 1, 8 * 64), jnp.float32)
    with pytest.raises(ValueError, match="fit in one shard"):
        sharded_fir_conv(x, jnp.zeros((129,), jnp.float32), mesh)
    # polyphase width (26 at 1->2) exceeds T_shard = 16
    y = jnp.zeros((1, 8 * 16), jnp.float32)
    with pytest.raises(ValueError, match="fit in one shard"):
        sharded_resample(y, 8000, 16000, mesh)


def test_sharded_stft_rejects_odd_window():
    """Odd windows reflect-pad win-1 samples, so the even-window frame
    count would report one garbage frame as valid — rejected up front."""
    mesh = make_mesh({"sp": 8})
    x = jnp.zeros((1, 8 * 1152), jnp.float32)
    with pytest.raises(AssertionError, match="even"):
        sharded_stft(x, 257, 128, mesh)
