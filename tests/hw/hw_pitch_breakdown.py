"""Per-stage timing of pitch_shift on the real TPU.

pitch_shift = time_stretch (STFT -> phase_vocoder -> ISTFT) + polyphase
resample back to the original rate. This probe times each stage at the
headline-bench shapes (batch 64 x 5 s @ 44.1 kHz, +2 semitones) to find
where the ~25 ms goes.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_pitch_breakdown.py
"""
from fractions import Fraction

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import resample as R
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

SR, B, T = 44100, 64, 220500
WIN, HOP = 2048, 512
N_SEMI = 2.0
rate = 2.0 ** (-N_SEMI / 12.0)

print("platform:", jax.devices()[0].platform, flush=True)

x = jnp.asarray(np.random.RandomState(0).randn(B, 1, T).astype(np.float32) * 0.1)

def ms(fn, arg, iters=5):
    return device_time(fn, arg, iters=iters) * 1e3

print(f"pitch_shift total: {ms(lambda a: S.pitch_shift(a, N_SEMI, SR), x):.2f} ms", flush=True)
print(f"pitch_shift bf16-synth: {ms(lambda a: S.pitch_shift(a, 2.0, SR, synthesis_method='matmul_bf16'), x):.2f} ms", flush=True)
print(f"time_stretch total: {ms(lambda a: S.time_stretch(a, rate), x):.2f} ms", flush=True)

spec = F.stft(x, WIN, HOP, "hann", method="matmul")
print(f"stft matmul: {ms(lambda a: F.stft(a, WIN, HOP, 'hann', method='matmul'), x):.2f} ms", flush=True)
print(f"stft fft:    {ms(lambda a: F.stft(a, WIN, HOP, 'hann', method='fft'), x):.2f} ms", flush=True)

stretched = jax.jit(lambda s: S.phase_vocoder(s, rate, HOP, WIN))(spec)
print(f"phase_vocoder: {ms(lambda s: S.phase_vocoder(s, rate, HOP, WIN), spec):.2f} ms", flush=True)

out_len = int(round(T / rate))
print(f"istft matmul (n={stretched.shape[-1]} frames): "
      f"{ms(lambda s: F.istft(s, WIN, HOP, 'hann', length=out_len, method='matmul'), stretched):.2f} ms", flush=True)
print(f"istft fft: {ms(lambda s: F.istft(s, WIN, HOP, 'hann', length=out_len, method='fft'), stretched):.2f} ms", flush=True)

frac = Fraction(rate)
for cap in (60, 125, 250, 500, 1000, 5000):
    frac = Fraction(rate).limit_denominator(cap)
    if abs(float(frac) - rate) / rate < 2e-5:
        break
old_sr, new_sr = frac.denominator, frac.numerator
print(f"resample frac: {new_sr}/{old_sr}", flush=True)
y = jnp.zeros((B, 1, out_len), jnp.float32)
print(f"resample {old_sr}->{new_sr} on {out_len}: "
      f"{ms(lambda a: R.resample(a, old_sr, new_sr), y):.2f} ms", flush=True)

print("DONE", flush=True)

# NOTE (v5e, 2026-08-17): the bf16-synth line printed 6.74 ms at iters=5
# — a two-point-calibration artifact; a dedicated run at iters=10 with a
# correctness check gives 20.57 ms vs 23.84 full (consistent with the
# ~3 ms iDFT saving) and max abs diff 7.8e-04 on 0.39 scale. Prefer
# iters>=10 for sub-25 ms composites on the tunneled chip.
