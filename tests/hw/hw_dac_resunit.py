"""Probe inside the slow C=64 DAC stage: snake / conv7 / conv1 / residual
add, alone and composed, at (B=16, T=16896, C=64).

hw_dac_blocks.py: the full EncoderBlock(128, s=2) takes 7.46 ms
(8.3 TFLOP/s) yet hw_conv_probe.py times the SAME k7 C=64 conv alone at
0.26 ms (60 TFLOP/s). Something about the composition (fusion breakage,
layout flips between VPU snake and MXU conv, the k=1 conv) destroys it.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_dac_resunit.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn
import jax.numpy as jnp

from audiotools_tpu.models.dac import ResidualUnit, Snake, snake
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, T, C = 16, 16896, 64
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)

def ms(fn, arg, iters=5):
    return device_time(fn, arg, iters=iters) * 1e3

alpha = jnp.ones((1, 1, C))
print(f"snake alone: {ms(lambda a: snake(a, alpha), x):.3f} ms", flush=True)

conv7 = nn.Conv(C, kernel_size=(7,), padding="SAME")
p7 = jax.jit(conv7.init)(jax.random.PRNGKey(0), x)
print(f"conv7 alone: {ms(lambda a: conv7.apply(p7, a), x):.3f} ms", flush=True)

conv7d3 = nn.Conv(C, kernel_size=(7,), kernel_dilation=(3,), padding="SAME")
p7d3 = jax.jit(conv7d3.init)(jax.random.PRNGKey(0), x)
print(f"conv7 d3 alone: {ms(lambda a: conv7d3.apply(p7d3, a), x):.3f} ms", flush=True)

conv7d9 = nn.Conv(C, kernel_size=(7,), kernel_dilation=(9,), padding="SAME")
p7d9 = jax.jit(conv7d9.init)(jax.random.PRNGKey(0), x)
print(f"conv7 d9 alone: {ms(lambda a: conv7d9.apply(p7d9, a), x):.3f} ms", flush=True)

conv1 = nn.Conv(C, kernel_size=(1,))
p1 = jax.jit(conv1.init)(jax.random.PRNGKey(0), x)
print(f"conv1 alone: {ms(lambda a: conv1.apply(p1, a), x):.3f} ms", flush=True)

print(f"snake+conv7: {ms(lambda a: conv7.apply(p7, snake(a, alpha)), x):.3f} ms", flush=True)

unit = ResidualUnit(C, 1)
pu = jax.jit(unit.init)(jax.random.PRNGKey(0), x)
print(f"ResidualUnit d1: {ms(lambda a: unit.apply(pu, a), x):.3f} ms", flush=True)

unit3 = ResidualUnit(C, 3)
pu3 = jax.jit(unit3.init)(jax.random.PRNGKey(0), x)
print(f"ResidualUnit d3: {ms(lambda a: unit3.apply(pu3, a), x):.3f} ms", flush=True)

unit9 = ResidualUnit(C, 9)
pu9 = jax.jit(unit9.init)(jax.random.PRNGKey(0), x)
print(f"ResidualUnit d9: {ms(lambda a: unit9.apply(pu9, a), x):.3f} ms", flush=True)


def three_units(a):
    a = unit.apply(pu, a)
    a = unit3.apply(pu3, a)
    a = unit9.apply(pu9, a)
    return a


print(f"3 units chained: {ms(three_units, x):.3f} ms", flush=True)

print("DONE", flush=True)
