"""Sequence-parallel (time-sharded) DSP tests on the 8-device mesh:
halo-exchange results must match single-device computation exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu.ops.filters import causal_fft_conv1d
from audiotools_tpu.parallel import (
    make_mesh,
    sharded_fir_conv,
    sharded_frames,
    sharded_loudness_blocks,
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

    frames = np.asarray(sharded_frames(x, frame_length, hop, mesh))
    # local reference framing (zero-padded tail like the sharded version)
    xp = np.pad(np.asarray(x), ((0, 0), (0, frame_length - hop)))
    n = T // hop
    idx = np.arange(n)[:, None] * hop + np.arange(frame_length)[None, :]
    ref = xp[:, idx]
    assert frames.shape == ref.shape
    assert np.abs(frames - ref).max() == 0


def test_sharded_loudness_blocks_close_to_meter():
    """Sharded block-power gating agrees with the single-device block
    computation (absolute gate only, matching its local analog)."""
    mesh = make_mesh({"sp": 8})
    rate = 16000
    B, T = 2, 8 * 16000 // 8 * 8  # 8 s sharded over 8 devices
    x = np.random.RandomState(3).randn(B, T).astype(np.float32) * 0.1

    lufs_sh = np.asarray(sharded_loudness_blocks(jnp.asarray(x), rate, mesh))

    # local reference: same block math on the full signal, per shard-local
    # block boundaries
    kernel = int(0.4 * rate)
    hop = kernel // 4
    T_shard = T // 8
    zs, cs = np.zeros(B), np.zeros(B)
    for s in range(8):
        seg = x[:, s * T_shard : (s + 1) * T_shard]
        nf = (seg.shape[-1] - kernel) // hop + 1
        idx = np.arange(nf)[:, None] * hop + np.arange(kernel)[None, :]
        z = (seg[:, idx] ** 2).sum(-1) / kernel
        l = -0.691 + 10 * np.log10(np.maximum(z, 1e-30))
        keep = l > -70
        zs += np.where(keep, z, 0).sum(-1)
        cs += keep.sum(-1)
    ref = -0.691 + 10 * np.log10(zs / np.maximum(cs, 1))
    assert np.abs(lufs_sh - ref).max() < 1e-3
