"""Single-conv lowering probe: why is the DAC encoder 100x off roofline?

Times one conv1d at DAC-encoder shapes across channel widths and layouts.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_conv_probe.py
"""
import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
B, T = 16, 16896

for C in (64, 128, 256):
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)
    conv = nn.Conv(features=C, kernel_size=(7,), padding=3)
    p = jax.jit(conv.init)(jax.random.PRNGKey(0), x)
    t = device_time(lambda a: conv.apply(p, a), x, iters=5)
    gflop = 2 * B * T * C * C * 7 / 1e9
    print(f"conv1d k7 C={C} T={T}: {t*1e3:.2f} ms  ({gflop/t/1e3:.1f} TFLOP/s)", flush=True)

# snake activation cost at the widest layer
from audiotools_tpu.models.dac import snake

x = jnp.asarray(rng.randn(B, T, 64).astype(np.float32))
alpha = jnp.ones((64,))
t_s = device_time(lambda a: snake(a, alpha), x, iters=5)
print(f"snake (B,{T},64): {t_s*1e3:.2f} ms", flush=True)

# strided (downsampling) conv as used by EncoderBlock (stride 2, k=4)
x = jnp.asarray(rng.randn(B, T, 64).astype(np.float32) * 0.1)
sconv = nn.Conv(features=128, kernel_size=(4,), strides=(2,), padding=1)
p = jax.jit(sconv.init)(jax.random.PRNGKey(0), x)
t = device_time(lambda a: sconv.apply(p, a), x, iters=5)
print(f"strided conv 64->128 s2: {t*1e3:.2f} ms", flush=True)

# dilated conv (ResidualUnit uses dilations 1/3/9)
dconv = nn.Conv(features=64, kernel_size=(7,), kernel_dilation=(9,), padding=27)
p = jax.jit(dconv.init)(jax.random.PRNGKey(0), x)
t = device_time(lambda a: dconv.apply(p, a), x, iters=5)
print(f"dilated conv d9 C=64: {t*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
