"""Hardware pass 3b: loudness pallas-on-FIR + block-size sweeps.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_round3.py
"""
import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import filters as FL
from audiotools_tpu.ops import loudness as L
from audiotools_tpu.ops.benchmark import device_time

B, T = 64, 220500
SR = 44100

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
x3 = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)

# 1. loudness: pallas on the 1023-tap composed FIR (within envelope)
ref = np.asarray(jax.jit(lambda a: L.loudness(a, SR))(x3))
v = np.asarray(
    jax.jit(lambda a: L.loudness(a, SR, use_fir=True, conv_method="pallas"))(x3)
)
t = device_time(
    lambda a: L.loudness(a, SR, use_fir=True, conv_method="pallas"), x3, iters=10
)
print(f"loudness fir+pallas: {t*1e3:.2f} ms  dLUFS {np.abs(v-ref).max():.2e}", flush=True)

# 2. low_pass block-size sweep at 4k support
cut = jnp.asarray(rng.uniform(4000, 16000, B).astype(np.float32))
for bs in (1024, 2048, 4096, 8192):
    t = device_time(
        lambda a: FL.low_pass(a, cut, SR, min_cutoff_hz=4000.0, block_size=bs),
        x3, iters=10,
    )
    print(f"low_pass bs={bs}: {t*1e3:.2f} ms", flush=True)

# 3. split_bands block-size sweep (6 bands)
for bs in (8192, 16384, 32768, 65536):
    t = device_time(lambda a: FL.split_bands(a, SR, 6, block_size=bs), x3, iters=5)
    print(f"split_bands bs={bs}: {t*1e3:.2f} ms", flush=True)

# 4. equalizer end-to-end (uses split_bands)
db = jnp.asarray(rng.uniform(-6, 6, (B, 6)).astype(np.float32))
t_eq = device_time(lambda a: FL.equalizer(a, db, SR), x3, iters=5)
print(f"equalizer (full fft): {t_eq*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
