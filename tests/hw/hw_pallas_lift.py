"""Validate lifted Pallas envelope (8192 taps) + exact-meter MXU timing.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_pallas_lift.py
"""
import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import filters as FL
from audiotools_tpu.ops import loudness as L
from audiotools_tpu.ops import pallas_kernels as PK
from audiotools_tpu.ops.benchmark import device_time

PK.MAX_TAPS = 10000
print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(64, 220500).astype(np.float32) * 0.1)

h = (rng.randn(8192) * np.exp(-np.arange(8192) / 1365)).astype(np.float32)
h /= np.abs(h).sum()
y_p = np.asarray(jax.jit(lambda a: PK.fir_conv_causal(a, h))(x))
y_r = np.asarray(jax.jit(lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h)))(x))
print(f"taps=8192: rel err {np.abs(y_p-y_r).max()/np.abs(y_r).max():.2e}", flush=True)
t = device_time(lambda a: PK.fir_conv_causal(a, h), x, iters=5)
t_f = device_time(lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h)), x, iters=5)
print(f"taps=8192: pallas {t*1e3:.2f} ms  fft {t_f*1e3:.2f} ms", flush=True)

# exact-kernel (3723-tap) loudness on the MXU
x3 = x[:, None, :]
ref = np.asarray(jax.jit(lambda a: L.loudness(a, 44100))(x3))
v = np.asarray(
    jax.jit(lambda a: L.loudness(a, 44100, use_fir=False, conv_method="pallas"))(x3)
)
t_ex = device_time(
    lambda a: L.loudness(a, 44100, use_fir=False, conv_method="pallas"), x3, iters=5
)
print(f"loudness exact+pallas: {t_ex*1e3:.2f} ms  dLUFS {np.abs(v-ref).max():.2e}", flush=True)
print("DONE", flush=True)
