"""Probe the fir_conv_causal hardware envelope: 2048 taps, then 3723.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_pallas_boundary.py
If 3723 faults the worker again, the 2048 verdict has already printed.
"""
import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import filters as FL
from audiotools_tpu.ops import pallas_kernels as PK
from audiotools_tpu.ops.pallas_kernels import fir_conv_causal

PK.MAX_TAPS = 10000  # bypass the envelope guard for this probe

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(64, 220500).astype(np.float32) * 0.1)

for taps in (2048, 3723):
    h = (rng.randn(taps) * np.exp(-np.arange(taps) / (taps / 6))).astype(np.float32)
    h /= np.abs(h).sum()
    try:
        y_p = np.asarray(jax.jit(lambda a: fir_conv_causal(a, h))(x))
        y_r = np.asarray(jax.jit(lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h)))(x))
        err = np.abs(y_p - y_r).max() / (np.abs(y_r).max() + 1e-9)
        print(f"taps={taps}: OK rel err {err:.2e}", flush=True)
    except Exception as e:
        print(f"taps={taps}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
print("DONE", flush=True)
