"""Probe: transpose-free (B, frames, freq) internal layout for the
time_stretch pipeline and mel_spectrogram.

stft(method="matmul") produces (B, t, f) from its DFT matmul and then
swapaxes to the API's (B, f, t); istft's matmul immediately swaps back,
and mel contracts over f (layout-agnostic). Those two ~456 MB complex
transposes are pure HBM traffic. This probe times tf-layout variants of
time_stretch (stft -> PV -> istft all in (t, f)) and mel (transpose the
tiny (t, 80) output instead of the big spec).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_tf_layout.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time
from audiotools_tpu.ops.fft import (
    _dft_matrices,
    _idft_matrices,
    _frame,
    _overlap_add,
    get_window,
    mel_filters,
)

print("platform:", jax.devices()[0].platform, flush=True)

B, T, SR = 64, 220500, 44100
WIN, HOP = 2048, 512
rate = 2 ** (-2 / 12.0)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)

def ms(fn, arg, iters=5):
    return device_time(fn, arg, iters=iters) * 1e3


def stft_tf(a, prec=jax.lax.Precision.HIGH):
    """Windowed DFT, (B, n_frames, n_freq) complex — no final transpose."""
    length = a.shape[-1]
    xx = a.reshape(-1, length)
    cpad = WIN // 2
    xx = jnp.pad(xx, ((0, 0), (cpad, cpad)), mode="reflect")
    frames = _frame(xx, WIN, HOP)
    C, Sm = _dft_matrices("hann", WIN)
    re = jnp.dot(frames, jnp.asarray(C), precision=prec)
    im = jnp.dot(frames, jnp.asarray(Sm), precision=prec)
    return jax.lax.complex(re, im)


def istft_tf(spec_tf, out_T, prec=jax.lax.Precision.HIGH):
    """(B, nt, nf) -> audio, matching istft(method='matmul')."""
    nt = spec_tf.shape[-2]
    Ci, Si = _idft_matrices("hann", WIN)
    frames = jnp.dot(jnp.real(spec_tf), jnp.asarray(Ci), precision=prec) + jnp.dot(
        jnp.imag(spec_tf), jnp.asarray(Si), precision=prec
    )
    out_len = WIN + HOP * (nt - 1)
    y = _overlap_add(frames, HOP, out_len)
    wsq = get_window("hann", WIN).astype(np.float64) ** 2
    norm = np.zeros(out_len, dtype=np.float64)
    for i in range(nt):
        norm[i * HOP : i * HOP + WIN] += wsq
    y = y / jnp.asarray(np.where(norm > 1e-11, norm, 1.0).astype(np.float32))
    cpad = WIN // 2
    y = y[:, cpad : cpad + out_T]
    return y


def pv_tf(spec_tf, rate):
    """phase_vocoder on (B, nt, nf): time axis is -2."""
    Tn, F_bins = spec_tf.shape[-2], spec_tf.shape[-1]
    n_steps = int(np.ceil(Tn / rate))
    steps = np.arange(n_steps) * rate
    i0 = np.minimum(np.floor(steps).astype(np.int32), Tn - 1)
    i1 = np.minimum(i0 + 1, Tn - 1)
    frac = (steps - i0).astype(np.float32)[:, None]

    mag = jnp.abs(spec_tf)
    phase = jnp.angle(spec_tf)
    mag_t = (1.0 - frac) * mag[..., i0, :] + frac * mag[..., i1, :]
    phi_advance = (
        2.0 * np.pi * HOP * np.arange(F_bins, dtype=np.float32) / WIN
    )[None, :]
    dphase = phase[..., i1, :] - phase[..., i0, :] - phi_advance
    dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))
    step_advance = phi_advance + dphase
    acc = jnp.cumsum(step_advance, axis=-2)
    phase_out = phase[..., i0[:1], :] + jnp.concatenate(
        [jnp.zeros_like(acc[..., :1, :]), acc[..., :-1, :]], axis=-2
    )
    return mag_t * jnp.exp(1j * phase_out)


def time_stretch_tf(a, factor):
    out_len = int(round(a.shape[-1] / factor))
    spec = stft_tf(a)
    stretched = pv_tf(spec, factor)
    y = istft_tf(stretched, out_len)
    return y.reshape(a.shape[:-1] + (out_len,))


print(f"time_stretch current: {ms(lambda a: S.time_stretch(a, rate), x):.2f} ms", flush=True)
print(f"time_stretch tf-layout: {ms(lambda a: time_stretch_tf(a, rate), x):.2f} ms", flush=True)

ref = np.asarray(jax.jit(lambda a: S.time_stretch(a, rate)[:1])(x))
got = np.asarray(jax.jit(lambda a: time_stretch_tf(a, rate)[:1])(x))
print(f"tf-layout err: {np.abs(got - ref).max() / np.abs(ref).max():.2e}", flush=True)


def mel_tf(a, prec=jax.lax.Precision.HIGH):
    spec = stft_tf(a)
    mag = jnp.abs(spec)  # (B, nt, nf)
    basis = jnp.asarray(mel_filters(SR, WIN, 80, 0.0, None))  # (80, nf)
    mel = jnp.dot(mag, basis.T, precision=jax.lax.Precision.HIGHEST)
    return jnp.swapaxes(mel, -1, -2).reshape(a.shape[:-1] + (80, mag.shape[-2]))


print(f"mel current: {ms(lambda a: F.mel_spectrogram(a, SR, 80, method='matmul'), x):.2f} ms", flush=True)
print(f"mel tf-layout: {ms(mel_tf, x):.2f} ms", flush=True)
ref_m = np.asarray(jax.jit(lambda a: F.mel_spectrogram(a, SR, 80, method="matmul")[:1])(x))
got_m = np.asarray(jax.jit(lambda a: mel_tf(a)[:1])(x))
print(f"mel tf err: {np.abs(got_m - ref_m).max() / np.abs(ref_m).max():.2e}", flush=True)

print("DONE", flush=True)

# RESULT (v5e, 2026-08-17): time_stretch current 22.24 ms, tf-layout
# 27.19; mel 8.23 vs 8.34. NEGATIVE on TPU (despite a 1.5x win on CPU):
# XLA-TPU already folds the (f,t) transposes into the DFT matmul
# layouts, and the PV's gathers/cumsum along the sublane (-2) axis are
# slower than along the minor axis. Current layouts stay.
