"""Probe: is the C=64 DAC stage bandwidth-bound (bf16 halves it) or
op-count-bound; and does the sin^2 vs cos snake formulation matter.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_snake_enc.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.models.dac import Encoder
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, T, C = 16, 16896, 64
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)
xb = x.astype(jnp.bfloat16)

def ms(fn, arg, iters=5):
    return device_time(fn, arg, iters=iters) * 1e3

alpha = jnp.ones((1, 1, C))

print(f"snake sin^2 f32: {ms(lambda a: a + jnp.sin(alpha * a) ** 2 / (alpha + 1e-9), x):.3f} ms", flush=True)
print(f"snake cos f32:  {ms(lambda a: a + (0.5 - 0.5 * jnp.cos(2.0 * alpha * a)) / (alpha + 1e-9), x):.3f} ms", flush=True)
ab = alpha.astype(jnp.bfloat16)
print(f"snake sin^2 bf16: {ms(lambda a: a + jnp.sin(ab * a) ** 2 / (ab + jnp.bfloat16(1e-3)), xb):.3f} ms", flush=True)

audio = jnp.asarray(rng.randn(B, T, 1).astype(np.float32) * 0.1)
enc_f32 = Encoder()
p = jax.jit(enc_f32.init)(jax.random.PRNGKey(0), audio)
print(f"encoder f32: {ms(lambda a: enc_f32.apply(p, a), audio):.2f} ms", flush=True)

enc_bf16 = Encoder(dtype=jnp.bfloat16)
print(f"encoder dtype=bf16: {ms(lambda a: enc_bf16.apply(p, a), audio):.2f} ms", flush=True)

print("DONE", flush=True)

# RESULT (v5e, 2026-08-17): snake sin^2 f32 0.490 ms, bf16 0.525 (NOT
# bandwidth-bound), cos form 0.619 (worse). encoder f32 13.12 ms vs
# dtype=bf16 12.84 — no precision lever. Together with
# hw_dac_resunit.py (every sub-op additive, nothing anomalous) the
# C=64 stage is VPU-transcendental + per-op-overhead bound: ~7 snake
# passes/block at ~0.5 ms each. A fused Pallas res-unit would cut only
# the HBM passes (~1.5-2 ms/block fwd) while the sin cost stays — and
# the backward needs custom kernels to avoid giving it back. Recorded
# as the remaining (modest) lever; DAC train step stays at 68 ms
# (234 clips/s, 90x realtime) this round.
