"""Time-axis (sequence-parallel) sharded DSP with halo exchange.

For signals too long for one chip's HBM, the time axis is sharded across
a mesh axis and filter overlap is satisfied with a *halo exchange*: each
device sends the tail of its shard to its right neighbor over ICI with
``jax.lax.ppermute`` inside ``shard_map`` — the audio analog of context
parallelism (SURVEY.md §5.7; no attention/ring tricks needed, filters
have finite support).

Primitives
----------
* ``sharded_fir_conv`` — causal FIR filtering of a time-sharded signal.
* ``sharded_frames`` — frame extraction where each shard's trailing
  window overlap comes from the neighbor (STFT/mel on sharded audio).
* ``sharded_loudness_blocks`` — BS.1770 block powers over sharded time,
  gated globally with ``psum``.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

__all__ = ["sharded_fir_conv", "sharded_frames", "sharded_loudness_blocks"]


def _halo_from_left(block: jnp.ndarray, halo: int, axis_name: str):
    """Receive the last ``halo`` samples of the LEFT neighbor's shard
    (zeros for the first shard). ``block``: (..., T_shard)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    tail = block[..., -halo:]
    # send my tail to my right neighbor (i -> i+1)
    perm = [(i, i + 1) for i in range(n - 1)]
    recv = jax.lax.ppermute(tail, axis_name, perm)
    recv = jnp.where(idx == 0, jnp.zeros_like(recv), recv)
    return recv


def sharded_fir_conv(
    x: jnp.ndarray, kernel, mesh: Mesh, axis_name: str = "sp"
) -> jnp.ndarray:
    """Causal FIR conv of ``(B, C, T)`` audio sharded along T over
    ``axis_name``. The kernel's history crosses shard boundaries via one
    ppermute halo exchange; each shard then runs an ordinary local conv.
    """
    kernel = jnp.asarray(kernel, dtype=jnp.float32)
    K = kernel.shape[-1]

    from ..ops.filters import causal_fft_conv1d

    def local(block, k):
        # block: (B, C, T_shard) local shard
        halo = _halo_from_left(block, K - 1, axis_name)
        ext = jnp.concatenate([halo, block], axis=-1)
        y = causal_fft_conv1d(ext, k)
        return y[..., K - 1 :]

    spec = P(None, None, axis_name)
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(spec, P()),
        out_specs=spec,
    )
    return fn(x, kernel)


def sharded_frames(
    x: jnp.ndarray,
    frame_length: int,
    hop_length: int,
    mesh: Mesh,
    axis_name: str = "sp",
) -> jnp.ndarray:
    """Frame a ``(B, T)`` signal sharded along T into
    ``(B, n_frames, frame_length)`` frames sharded along n_frames.

    Shard length must be a multiple of ``hop_length``; the trailing
    ``frame_length - hop_length`` samples of each shard's frames come
    from the right neighbor (halo exchange in the opposite direction).
    """
    T = x.shape[-1]
    n_dev = mesh.shape[axis_name]
    T_shard = T // n_dev
    assert T_shard % hop_length == 0, "shard length must divide into hops"
    overlap = frame_length - hop_length

    def local(block):
        # receive the HEAD of the right neighbor's shard (send left)
        n = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        head = block[..., :overlap]
        perm = [(i + 1, i) for i in range(n - 1)]
        recv = jax.lax.ppermute(head, axis_name, perm)
        recv = jnp.where(idx == n - 1, jnp.zeros_like(recv), recv)
        ext = jnp.concatenate([block, recv], axis=-1)

        nf = T_shard // hop_length
        idxm = (
            np.arange(nf, dtype=np.int32)[:, None] * hop_length
            + np.arange(frame_length, dtype=np.int32)[None, :]
        )
        return ext[..., idxm]  # (B_local, nf, frame_length)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name),),
        out_specs=P(None, axis_name, None),
    )
    return fn(x)


def sharded_loudness_blocks(
    x: jnp.ndarray,
    rate: int,
    mesh: Mesh,
    axis_name: str = "sp",
    block_size: float = 0.400,
):
    """Integrated (absolute-gated) loudness of ``(B, T)`` K-weighted audio
    sharded along T: per-shard block powers, global gating via psum.

    Returns (B,) LUFS. The relative-gate second pass follows the same
    psum pattern; this primitive demonstrates the collective layout for
    metering signals that never fit on one chip.
    """
    kernel = int(block_size * rate)
    hop = kernel // 4

    def local(block):
        nf = (block.shape[-1] - kernel) // hop + 1
        idxm = (
            np.arange(nf, dtype=np.int32)[:, None] * hop
            + np.arange(kernel, dtype=np.int32)[None, :]
        )
        z = (block[..., idxm] ** 2).sum(-1) / kernel  # (B, nf)
        l = -0.691 + 10 * jnp.log10(jnp.maximum(z, 1e-30))
        keep = l > -70.0
        s = jnp.sum(jnp.where(keep, z, 0.0), axis=-1)
        c = jnp.sum(keep, axis=-1)
        s = jax.lax.psum(s, axis_name)
        c = jax.lax.psum(c, axis_name)
        return (-0.691 + 10 * jnp.log10(s / jnp.maximum(c, 1)))[:, None]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(None, axis_name),),
        out_specs=P(None, axis_name),
    )
    # every shard returns the same value; take shard 0's copy
    out = fn(x)
    return out[:, 0]
