"""Probe: where the istft's time goes (inverse-DFT matmul vs overlap-add
vs envelope division) at time_stretch shapes (484 frames, win 2048 hop 512).

istft(matmul) = 7.8 ms but the iDFT matmul alone should be ~2.3 ms —
if the OLA's grouped slice-adds dominate, they're the next kernel target.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_istft_parts.py

RESULT (v5e, 2026-08-19):
    iDFT matmul x2: 5.64 ms   <- dominates; 260 GFLOP at HIGHEST
                                 precision = ~46 TF/s, essentially the
                                 f32-matmul ceiling (the accuracy-safe
                                 bf16 route already exists as
                                 synthesis_method="matmul_bf16" and the
                                 bench chain uses it)
    overlap_add   : 2.61 ms
    env division  : 0.13 ms
    ola pad-sum   : 4.08 ms   NEGATIVE (r-shifted pad-and-sum streams
                               are 1.6x the grouped slice-add OLA; XLA's
                               existing lowering wins)
istft is at its measured floor: the matmul is roofline-bound and the
OLA alternative lost. FOLLOW-UP (hw_istft_fused.py): the sum of these
separately-timed stages (8.4 ms) OVER-ATTRIBUTES — the whole
istft(method="matmul_bf16") program compiles to 2.50 ms because XLA
fuses the OLA and envelope into the synthesis matmul and never
materializes the frame tensor; a hand-fused Pallas kernel exactly
matches it (2.55 ms) and is kept only for its peak-memory win.
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.ops.benchmark import device_time
from audiotools_tpu.ops.fft import _idft_matrices, _overlap_add, get_window

print("platform:", jax.devices()[0].platform, flush=True)

B, NT, WIN, HOP = 64, 484, 2048, 512
rng = np.random.RandomState(0)
spec_re = jnp.asarray(rng.randn(B, NT, WIN // 2 + 1).astype(np.float32))
spec_im = jnp.asarray(rng.randn(B, NT, WIN // 2 + 1).astype(np.float32))
frames = jnp.asarray(rng.randn(B, NT, WIN).astype(np.float32))

def ms(fn, arg, iters=5):
    return device_time(fn, arg, iters=iters) * 1e3

Ci, Si = _idft_matrices("hann", WIN)


def idft(re):
    return jnp.dot(re, jnp.asarray(Ci), precision=jax.lax.Precision.HIGH) + jnp.dot(
        spec_im, jnp.asarray(Si), precision=jax.lax.Precision.HIGH
    )


print(f"iDFT matmul x2: {ms(idft, spec_re):.2f} ms", flush=True)

out_len = WIN + HOP * (NT - 1)
print(f"overlap_add: {ms(lambda f: _overlap_add(f, HOP, out_len), frames):.2f} ms", flush=True)

wsq = get_window("hann", WIN).astype(np.float64) ** 2
norm = np.zeros(out_len, dtype=np.float64)
for i in range(NT):
    norm[i * HOP : i * HOP + WIN] += wsq
norm_j = np.where(norm > 1e-11, norm, 1.0).astype(np.float32)
y = jnp.asarray(rng.randn(B, out_len).astype(np.float32))
print(f"env division: {ms(lambda a: a / jnp.asarray(norm_j), y):.2f} ms", flush=True)


# OLA alternative: transposed reshape — scatter frames into a
# (B, nt, r, hop) tensor viewed as r diagonal streams, then sum r
# shifted copies laid out via pad (no .at[].add read-modify-write chain).
def ola_pad_sum(f):
    r = WIN // HOP
    nt = f.shape[1]
    parts = f.reshape(B, nt, r, HOP)
    total = jnp.zeros((B, out_len), f.dtype)
    for j in range(r):
        stream = parts[:, :, j, :].reshape(B, nt * HOP)
        stream = jnp.pad(stream, ((0, 0), (j * HOP, out_len - nt * HOP - j * HOP)))
        total = total + stream
    return total


ref = np.asarray(jax.jit(lambda f: _overlap_add(f, HOP, out_len)[:1])(frames))
got = np.asarray(jax.jit(lambda f: ola_pad_sum(f)[:1])(frames))
print(f"ola pad-sum err: {np.abs(got - ref).max():.2e}", flush=True)
print(f"ola pad-sum: {ms(ola_pad_sum, frames):.2f} ms", flush=True)

print("DONE", flush=True)
