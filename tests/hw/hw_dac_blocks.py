"""Per-stage timing of the DAC encoder/decoder on the real chip.

encoder fwd is 12.9 ms / decoder 12.6 at B=16 x 16896 (hw_dac_profile) —
~30 TFLOP/s aggregate, 7% of v5e bf16 peak. This probe times each block
at its true (T, C) to find which stage is off roofline and by how much.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_dac_blocks.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.models.dac import DecoderBlock, EncoderBlock
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, T0 = 16, 16896
rng = np.random.RandomState(0)


def gflop_encblock(dim, stride, T):
    c = dim // 2
    res = 3 * (T * c * c * 7 * 2 + T * c * c * 1 * 2)
    down = (T // stride) * c * dim * (2 * stride) * 2
    return (res + down) / 1e9


def gflop_decblock(dim, stride, T):
    up = (T * stride) * (2 * dim) * dim * (2 * stride) * 2
    res = 3 * ((T * stride) * dim * dim * 7 * 2 + (T * stride) * dim * dim * 2)
    return (up + res) / 1e9


# encoder stages: (dim, stride, T_in, C_in)
enc = [(128, 2, 16896, 64), (256, 4, 8448, 128), (512, 8, 2112, 256), (1024, 8, 264, 512)]
for dim, stride, T, C in enc:
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)
    blk = EncoderBlock(dim, stride)
    p = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    t = device_time(lambda a: blk.apply(p, a), x, iters=5)
    g = gflop_encblock(dim, stride, T) * B
    print(
        f"enc block dim={dim} s={stride} T={T}: {t*1e3:.2f} ms "
        f"({g/t/1e3:.1f} TFLOP/s for {g:.1f} GFLOP)",
        flush=True,
    )

# decoder stages: input (T, 2*dim) -> ConvTranspose(dim, stride) -> res units
dec = [(512, 8, 33), (256, 8, 264), (128, 4, 2112), (64, 2, 8448)]
for dim, stride, T in dec:
    x = jnp.asarray(rng.randn(B, T, 2 * dim).astype(np.float32) * 0.1)
    blk = DecoderBlock(dim, stride)
    p = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
    t = device_time(lambda a: blk.apply(p, a), x, iters=5)
    g = gflop_decblock(dim, stride, T) * B
    print(
        f"dec block dim={dim} s={stride} T_in={T}: {t*1e3:.2f} ms "
        f"({g/t/1e3:.1f} TFLOP/s for {g:.1f} GFLOP)",
        flush=True,
    )

print("DONE", flush=True)

# RESULT (v5e, 2026-08-17): enc blocks 7.46 / 3.14 / 2.09 / 0.88 ms
# (8.3 / 39.5 / 59.3 / 70.5 TFLOP/s); dec blocks 0.37 / 1.68 / 3.01 /
# 6.00 ms. The two C=64 @ T=16896 stages dominate and run at 8-12
# TFLOP/s — see hw_dac_resunit.py / hw_snake_enc.py for the diagnosis
# (VPU-bound snakes + unfused pass count, not conv shape).
