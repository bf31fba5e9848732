"""Polyphase windowed-sinc resampling.

Re-derivation of the julius ``resample_frac`` algorithm the reference uses
(`/root/reference/audiotools/core/audio_signal.py:716-736`): the signal is
reconstructed with a windowed sinc kernel whose cutoff is
``rolloff * min(old_sr, new_sr)`` and re-sampled on the new grid. After
reducing ``old_sr/new_sr`` by their gcd, output sample ``j`` lands at input
position ``j * old_sr / new_sr``, so the interpolation becomes ``new_sr``
polyphase FIR kernels applied with stride ``old_sr`` — one strided
``conv_general_dilated`` on TPU (no Python loops, fully batched, MXU/VPU
friendly).
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["resample_kernels", "resample", "polyphase_conv_diff"]


@functools.lru_cache(maxsize=None)
def resample_kernels(
    old_sr: int, new_sr: int, zeros: int = 24, rolloff: float = 0.945
):
    """Polyphase kernel bank ``(new_sr, width*2 + old_sr)`` (host-cached).

    ``old_sr``/``new_sr`` must already be reduced by their gcd. Each phase
    kernel is a Hann^2-windowed sinc at cutoff ``rolloff*min(old,new)``,
    normalized to unit sum so constants are preserved.
    """
    assert math.gcd(old_sr, new_sr) == 1
    sr = min(new_sr, old_sr) * rolloff
    width = math.ceil(zeros * old_sr / sr)
    idx = np.arange(-width, width + old_sr, dtype=np.float64)
    kernels = []
    for i in range(new_sr):
        t = (-i / new_sr + idx / old_sr) * sr
        t = np.clip(t, -zeros, zeros)
        t *= np.pi
        window = np.cos(t / zeros / 2) ** 2
        sinc = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
        kernel = sinc * window
        kernel /= kernel.sum()
        kernels.append(kernel)
    return np.stack(kernels).astype(np.float32), width


def _resample_host(
    audio: np.ndarray, old: int, new: int, kernels: np.ndarray, width: int
) -> np.ndarray:
    """Numpy evaluation of the same polyphase bank, for the host data
    path (dataloader workers must never touch the device — the tunneled
    TPU charges ~ms per eager dispatch). Identical math to the device
    conv up to f32 summation order (pinned <=2e-5 in tests)."""
    from .._hostprof import span

    with span("resample"):
        return _resample_host_impl(audio, old, new, kernels, width)


def _resample_host_impl(audio, old, new, kernels, width):
    T = audio.shape[-1]
    batch_shape = audio.shape[:-1]
    x = audio.reshape((-1, T)).astype(np.float32)
    x = np.pad(x, ((0, 0), (width, width + old)), mode="edge")
    W = kernels.shape[-1]
    n_blocks = (x.shape[-1] - W) // old + 1
    s0, s1 = x.strides
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(x.shape[0], n_blocks, W), strides=(s0, s1 * old, s1),
        writeable=False,
    )
    # (B, n_blocks, W) x (new, W) -> (B, n_blocks, new), interleaved
    y = np.einsum("btw,pw->btp", frames, kernels).reshape((x.shape[0], -1))
    out_len = int(T * new / old)
    return y[..., :out_len].reshape(batch_shape + (out_len,))


@functools.lru_cache(maxsize=None)
def _resample_bwd_bank(old: int, new: int, zeros: int, rolloff: float):
    """Tap-flipped residue slices of the polyphase bank for the adjoint
    conv: ``K2[r, i, d] = K[i, d*old + r]`` flipped along ``d``."""
    K, _width = resample_kernels(old, new, zeros, rolloff)
    W = K.shape[-1]
    D = -(-W // old)
    K2 = np.zeros((old, new, D), np.float32)
    for r in range(old):
        taps = K[:, r::old]
        K2[r, :, : taps.shape[-1]] = taps
    return np.ascontiguousarray(K2[:, :, ::-1]), D


@functools.lru_cache(maxsize=256)
def polyphase_conv_diff(
    old: int, new: int, zeros: int, rolloff: float, Tp: int, out_len: int
):
    """Differentiable strided polyphase conv on a PRE-PADDED ``(B, Tp)``
    input, returning ``(B, out_len)`` interleaved output.

    XLA's automatic transpose of the stride-``old`` conv (an
    input-dilated conv) is catastrophic on v5e — measured **13.1 s** for
    batch-64 x 5 s, ~850x the 15.6 ms forward and the entire cost of
    jax.grad(pitch_shift) (tests/hw/hw_pitch_grad_time.py). The custom
    VJP here evaluates the exact adjoint as another STRIDE-1
    multi-channel conv instead (measured 3.35 ms, ~4000x): with
    ``t = q*old + r``,

        x̄[q*old + r] = sum_d sum_i K[i, d*old + r] ȳ[(q-d)*new + i]

    i.e. de-interleave ȳ into ``new`` channels, correlate with the
    tap-flipped residue bank ``K2[r, i, d] = K[i, d*old + r]`` (``old``
    output channels, ``D = ceil(W/old)`` taps), and re-interleave over
    ``r``. Padding (replicate edges, halo exchange, ...) stays OUTSIDE
    this core so its own autodiff composes — both ``resample`` and the
    sequence-parallel ``sharded_resample`` ride this. Grad parity vs
    XLA's autodiff is pinned in tests/core/test_filters_resample.py.
    """
    kernels, _width = resample_kernels(old, new, zeros, rolloff)
    W = kernels.shape[-1]
    P = (Tp - W) // old + 1
    Q = -(-Tp // old)
    if not 0 < out_len <= P * new:
        raise ValueError(f"out_len {out_len} outside (0, {P * new}]")

    def primal(xp):  # (B, Tp) -> (B, out_len)
        # The default TPU conv precision is bf16: ~6e-3 relative error
        # through the polyphase bank, far above this op's 1e-4 parity
        # budget (caught by the vocoder-vs-cpu gate in tests/hw/hw_all.py).
        # HIGH (bf16x3) measures ~3e-5 at 2.3 ms vs HIGHEST's ~4e-7 at
        # 3.4 ms (b64 x 5 s, v5e) — HIGH clears the budget with margin.
        y = jax.lax.conv_general_dilated(
            xp[:, None, :],
            jnp.asarray(kernels)[:, None, :],
            window_strides=(old,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGH,
        )
        # interleave phases: out[p*new + i] = y[:, i, p]
        y = jnp.swapaxes(y, -1, -2).reshape((xp.shape[0], -1))
        return y[..., :out_len]

    @jax.custom_vjp
    def f(xp):
        return primal(xp)

    def fwd(xp):
        return primal(xp), None

    def bwd(_, gy):
        B = gy.shape[0]
        K2f, D = _resample_bwd_bank(old, new, zeros, rolloff)
        z = jnp.pad(gy, ((0, 0), (0, P * new - out_len)))
        z = jnp.swapaxes(z.reshape(B, P, new), -1, -2)  # (B, new, P)
        z = jnp.pad(z, ((0, 0), (0, 0), (D - 1, Q - P)))
        g = jax.lax.conv_general_dilated(
            z,
            jnp.asarray(K2f),
            window_strides=(1,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            precision=jax.lax.Precision.HIGH,
        )  # (B, old, Q)
        gx = jnp.swapaxes(g, -1, -2).reshape(B, Q * old)[..., :Tp]
        return (gx,)

    f.defvjp(fwd, bwd)
    return f


def _resample_device_diff(
    old: int, new: int, zeros: int, rolloff: float, T: int
):
    """Differentiable device resample for a fixed (old, new, T):
    replicate-edge pad (jnp.pad — its autodiff supplies the pad adjoint)
    around the custom-VJP :func:`polyphase_conv_diff` core."""
    _kernels, width = resample_kernels(old, new, zeros, rolloff)
    out_len = int(T * new / old)
    Tp = T + width + (width + old)
    core = polyphase_conv_diff(old, new, zeros, rolloff, Tp, out_len)

    def f(x):  # (B, T) -> (B, out_len)
        xp = jnp.pad(x, ((0, 0), (width, width + old)), mode="edge")
        return core(xp)

    return f


def resample(
    audio: jnp.ndarray,
    old_sr: int,
    new_sr: int,
    zeros: int = 24,
    rolloff: float = 0.945,
) -> jnp.ndarray:
    """Resample ``(..., T)`` audio from ``old_sr`` to ``new_sr``.

    Output length is ``int(T * new_sr / old_sr)`` (reference resample via
    julius, audio_signal.py:732). numpy input resolves on the host
    (same kernels, numpy einsum) and stays numpy. The device path
    carries a custom VJP (see ``_resample_device_diff``: XLA's automatic
    conv transpose measured 13.1 s at bench shapes; the explicit adjoint
    conv is milliseconds).
    """
    if old_sr == new_sr:
        return audio
    gcd = math.gcd(int(old_sr), int(new_sr))
    old, new = int(old_sr) // gcd, int(new_sr) // gcd
    kernels, width = resample_kernels(old, new, zeros, rolloff)
    if isinstance(audio, np.ndarray):
        return _resample_host(audio, old, new, kernels, width)

    T = audio.shape[-1]
    batch_shape = audio.shape[:-1]
    x = audio.reshape((-1, T)).astype(jnp.float32)
    out_len = int(T * new / old)
    y = _resample_device_diff(old, new, int(zeros), float(rolloff), T)(x)
    return y.reshape(batch_shape + (out_len,))
