"""Isolate which sub-leg of jax.grad(pitch_shift) crashes the TPU worker.

Observed (2026-08-20, twice): timing jax.grad through the FULL
pitch-shift leg (resample + STFT + PV-angle + iSTFT) at b64 x 5 s
crashes the tunneled v5e worker ("TPU worker process crashed or
restarted") — a pure-XLA program, no Pallas. This probe runs the grad
of each sub-leg alone, then pairwise compositions, printing before each
so the crash log names the culprit.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tests/hw/hw_pitch_grad_crash.py

RESULT (v5e via axon tunnel, 2026-08-20): every leg PASSES, including
the full pitch_shift grad —
    resample 49/55          OK  max|g| 8.8e-01
    stft matmul             OK  max|g| 2.1e+03
    stft+istft(matmul_bf16) OK  max|g| 1.1e+00
    stft+PV(angle)          OK  max|g| 2.3e+03
    time_stretch(angle)     OK  max|g| 2.2e+02
    pitch_shift full        OK  max|g| 3.2e+02
So the worker crash was NOT the gradient program: it was the
device_time fori_loop TIMING WRAPPER around it (grad-of-pitch chained
10-20x inside one loop program). Training through pitch_shift is fine;
hw_pv_fused_grad.py times the pitch legs with device_time_queued
(no loop) instead.
"""
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import resample as R
from audiotools_tpu.ops import stretch as S

print("platform:", jax.devices()[0].platform, flush=True)

B, T, SR = 64, 220500, 44100
rng = np.random.RandomState(0)
audio = jnp.asarray((rng.randn(B, 1, T) * 0.1).astype(np.float32))
rate = 2.0 ** (-2.0 / 12.0)


def try_grad(name, fn, arg):
    print(f"START {name}", flush=True)
    g = jax.jit(jax.grad(lambda a: jnp.sum(fn(a) ** 2)))(arg)
    v = float(jnp.max(jnp.abs(g)))
    print(f"OK    {name}: max|g| = {v:.3e}", flush=True)


# individual legs at pitch-shift shapes
try_grad("resample 49/55", lambda a: R.resample(a, 55, 49), audio)

short = audio[..., : int(T * 49 / 55)]


def stft_leg(a):
    sp = F.stft(a[:, 0, :], 2048, 512, "hann", method="matmul")
    return jnp.abs(sp)


try_grad("stft matmul", stft_leg, short)


def stft_istft(a):
    sp = F.stft(a[:, 0, :], 2048, 512, "hann", method="matmul")
    return F.istft(
        sp, 2048, 512, "hann", length=a.shape[-1], method="matmul_bf16"
    )


try_grad("stft+istft(matmul_bf16)", stft_istft, short)


def pv_leg(a):
    sp = F.stft(a[:, 0, :], 2048, 512, "hann", method="matmul")
    out = S.phase_vocoder(sp, rate, 512, 2048, formulation="angle")
    return jnp.abs(out)


try_grad("stft+PV(angle)", pv_leg, short)


def ts_leg(a):
    return S.time_stretch(
        a, rate, 2048, 512, synthesis_method="matmul_bf16",
        pv_formulation="angle",
    )


try_grad("time_stretch(angle)", ts_leg, short)


def full_leg(a):
    return S.pitch_shift(
        a, 2.0, SR, synthesis_method="matmul_bf16", pv_formulation="angle"
    )


try_grad("pitch_shift full", full_leg, audio)
print("ALL DONE", flush=True)
