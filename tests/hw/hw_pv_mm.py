"""Probe: phase-vocoder frame interpolation/differencing as MXU matmuls.

The PV gathers mag/phase at i0/i1 along the minor (frames) axis four
times; on TPU those static gathers + lerp arithmetic cost most of the
7.1 ms (hw_pitch_breakdown.py). The interpolation operator P (two
nonzeros per column) and the phase-difference operator D (+1/-1) are
tiny dense (431, 484) matrices — one MXU matmul each replaces all four
gathers. CPU-pinned exact vs the gather formulation (8.7e-08).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_pv_mm.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, T = 64, 220500
WIN, HOP = 2048, 512
rate = 2 ** (-2 / 12.0)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)
spec = jax.jit(lambda a: F.stft(a, WIN, HOP, "hann", method="matmul"))(x)

def ms(fn, arg, iters=5):
    return device_time(fn, arg, iters=iters) * 1e3

print(f"pv gather (current): {ms(lambda s: S.phase_vocoder(s, rate, HOP, WIN), spec):.2f} ms", flush=True)


def make_pv_mm(Tn, F_bins, rate, hop_length, window_length, prec_p, prec_d):
    n_steps = int(np.ceil(Tn / rate))
    steps = np.arange(n_steps) * rate
    i0 = np.minimum(np.floor(steps).astype(np.int64), Tn - 1)
    i1 = np.minimum(i0 + 1, Tn - 1)
    frac = (steps - i0).astype(np.float32)
    P = np.zeros((Tn, n_steps), np.float32)
    P[i0, np.arange(n_steps)] += 1.0 - frac
    P[i1, np.arange(n_steps)] += frac
    D = np.zeros((Tn, n_steps), np.float32)
    D[i1, np.arange(n_steps)] += 1.0
    D[i0, np.arange(n_steps)] += -1.0
    phi_advance = (
        2.0 * np.pi * hop_length * np.arange(F_bins, dtype=np.float32) / window_length
    )[:, None]

    def pv(stft_data):
        mag = jnp.abs(stft_data)
        phase = jnp.angle(stft_data)
        mag_t = jnp.einsum("...ft,ts->...fs", mag, jnp.asarray(P), precision=prec_p)
        dphase = (
            jnp.einsum("...ft,ts->...fs", phase, jnp.asarray(D), precision=prec_d)
            - phi_advance
        )
        dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))
        acc = jnp.cumsum(phi_advance + dphase, axis=-1)
        phase_out = phase[..., i0[:1]] + jnp.concatenate(
            [jnp.zeros_like(acc[..., :1]), acc[..., :-1]], axis=-1
        )
        return mag_t * jnp.exp(1j * phase_out)

    return pv


def pull_c(fn, arg):
    out = np.asarray(
        jax.jit(lambda a: jnp.stack([jnp.real(fn(a)), jnp.imag(fn(a))]))(arg)
    )
    return out[0] + 1j * out[1]


ref = pull_c(lambda s: S.phase_vocoder(s, rate, HOP, WIN)[:1], spec)

Tn, F_bins = spec.shape[-1], spec.shape[-2]
for pp, pd in (("high", "highest"), ("high", "high"), ("highest", "highest")):
    pv = make_pv_mm(Tn, F_bins, rate, HOP, WIN, pp, pd)
    t = ms(pv, spec)
    got = pull_c(lambda s: pv(s)[:1], spec)
    err = np.abs(got - ref).max() / np.abs(ref).max()
    print(f"pv matmul [P={pp},D={pd}]: {t:.2f} ms  rel_err={err:.2e}", flush=True)

print("DONE", flush=True)

# RESULT (v5e, 2026-08-16): gather formulation 7.10-7.43 ms; matmul
# interpolation [P=high,D=highest] 7.72 ms (bit-identical output),
# [highest,highest] 8.41. NEGATIVE: the static minor-axis gathers were
# NOT the bottleneck — the PV is dominated by abs/angle/exp
# transcendentals + cumsum + HBM traffic, which the matmuls don't touch.
# Also: D at HIGH (bf16x3) leaves 5.75e-02 error — per-step phase
# rounding random-walks across the ~480-frame cumsum exactly as the
# bf16-DFT rejection predicted. phase_vocoder stays gather-based.
