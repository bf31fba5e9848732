"""Probe: phase vocoder as a cumulative unit-rotation scan ("phasor")
vs the textbook angle evaluation — speed and accuracy at bench shapes.

Motivation: hw_pv_pallas.py found Mosaic has NO atan2 lowering, killing
the fused-kernel route. But the PV's synthesis phase only enters the
output through exp(i*phase), where wraps are invisible — so the whole
angle -> wrap -> cumsum -> cos/sin chain collapses to a cumprod of unit
cross-spectra: zero transcendentals, plain XLA, and a tree-ordered
associative_scan whose rounding grows with log-depth instead of
sqrt(n)-random-walking like the sequential f32 cumsum.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_pv_phasor.py

RESULT (v5e, 2026-08-19, same-process A/B):
  PV core  (B=64, F=1025, T=384):  angle 6.3 ms   phasor 12.9 ms
  pitch_shift b64 x 5 s full leg:  angle 20.8 ms  phasor 23.0 ms
  accuracy vs float64 oracle at 431 steps (CPU):
    angle (old f32 phi ramp)  5e-3   <- the linear-accumulation bug
    angle (exact int mod 2pi) 2e-5   <- fix adopted as default
    phasor                    5e-6
  Verdict: the transcendental-free phasor scan loses on HBM bytes (two
  scan planes vs one cumsum plane; the VPU transcendentals it removes
  were overlapped with memory anyway), so "angle" stays the default.
  The lasting win is the accuracy diagnosis: the phasor path's 1000x
  edge over the OLD angle path exposed phi_advance's f32 representation
  error accumulating linearly through the cumsum; the exact-mod
  reduction recovers 250x of it for free. "phasor" remains available
  via formulation=/pv_formulation= for accuracy-critical use.
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

HOP, WIN = 512, 2048
RATE = 2.0 ** (-2.0 / 12.0)  # bench: +2 semitone pitch shift
B, F_bins, T = 64, 1025, 384
SR = 44100

print("platform:", jax.devices()[0].platform, flush=True)

rng = np.random.RandomState(0)
planes = jnp.asarray(rng.randn(2, B, F_bins, T).astype(np.float32))


def pv(planes, formulation):
    spec = jax.lax.complex(planes[0], planes[1])
    out = S.phase_vocoder(spec, RATE, HOP, WIN, formulation=formulation)
    return jnp.real(out), jnp.imag(out)


for form in ("angle", "phasor"):
    t = device_time(lambda a, f=form: pv(a, f), planes, iters=10) * 1e3
    print(f"PV core [{form:6s}] (B=64, F=1025, T=384): {t:.3f} ms", flush=True)

# full bench leg, same-process A/B: pitch_shift b64 x 5 s, bf16
# synthesis iDFT, both PV formulations
audio = jnp.asarray(
    (rng.randn(B, 1, int(5.0 * SR)) * 0.1).astype(np.float32)
)

for form in ("angle", "phasor"):

    def shift(a, f=form):
        return S.pitch_shift(
            a, 2.0, SR, synthesis_method="matmul_bf16", pv_formulation=f
        )

    t = device_time(shift, audio, iters=5) * 1e3
    print(f"pitch_shift b64 x 5s [{form:6s}, bf16 synth]: {t:.3f} ms", flush=True)
print("DONE", flush=True)
