"""Device PESQ / NSIM throughput on the real chip vs the host loop.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_pesq_nsim.py

RESULT: recorded below after each hardware run.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import nsim as NS
from audiotools_tpu.ops import pesq as P
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, T, FS = 64, 32000, 16000
rng = np.random.RandomState(0)
t = np.arange(T) / FS
x = np.sin(2 * np.pi * (120 + 30 * np.sin(2 * np.pi * 0.7 * t)).cumsum() / FS)
x = (x * 0.3).astype(np.float32)
ref = np.broadcast_to(x, (B, T)).copy()
est = ref + 0.03 * rng.randn(B, T).astype(np.float32)
ref_d, est_d = jnp.asarray(ref), jnp.asarray(est)

ms = device_time(lambda a: P.pesq_batch(a, est_d), ref_d) * 1e3
rt = B * (T / FS) / (ms / 1e3)
print(f"pesq_batch b{B} x {T/FS:.0f}s wb: {ms:.2f} ms  ({rt:,.0f}x realtime)", flush=True)

ms_n = device_time(lambda a: NS.nsim_batch(a, est_d, mode="speech"), ref_d) * 1e3
rt_n = B * (T / FS) / (ms_n / 1e3)
print(f"nsim_batch b{B} x {T/FS:.0f}s speech: {ms_n:.2f} ms  ({rt_n:,.0f}x realtime)", flush=True)

# host loop comparison (float64 numpy, one item at a time)
from audiotools_tpu.metrics._pesq import pesq_native

t0 = time.perf_counter()
for i in range(B):
    pesq_native(ref[i].astype(np.float64), est[i].astype(np.float64), FS, "wb")
host_s = time.perf_counter() - t0
print(
    f"host pesq loop b{B}: {host_s:.2f} s -> device is {host_s / (ms / 1e3):,.0f}x",
    flush=True,
)
