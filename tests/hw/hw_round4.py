"""Hardware pass 4: telescoped equalizer + matmul-vocoder pitch_shift.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_round4.py
"""
import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import filters as FL
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

B, T, SR = 64, 220500, 44100
print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
x3 = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)

# 1. equalizer: telescoped single-conv vs old band-split formulation
db = jnp.asarray(rng.uniform(-6, 6, (B, 6)).astype(np.float32))

def eq_old(a):
    bands = FL.split_bands(a, SR, 6)
    w = 10.0 ** db
    return jnp.sum(bands * w[:, None, None, :], axis=-1)

v_new = np.asarray(jax.jit(lambda a: FL.equalizer(a, db, SR))(x3))
v_old = np.asarray(jax.jit(eq_old)(x3))
err = np.abs(v_new - v_old).max() / (np.abs(v_old).max() + 1e-9)
t_new = device_time(lambda a: FL.equalizer(a, db, SR), x3, iters=10)
t_old = device_time(eq_old, x3, iters=5)
print(f"equalizer new: {t_new*1e3:.2f} ms  old: {t_old*1e3:.2f} ms  rel err {err:.1e}", flush=True)

# 2. pitch_shift: matmul vocoder + 200-denominator resample vs fft/1000
t_new = device_time(lambda a: S.pitch_shift(a, 2.0, SR), x3, iters=5)
t_fft = device_time(lambda a: S.pitch_shift(a, 2.0, SR, method="fft"), x3, iters=5)
print(f"pitch_shift matmul: {t_new*1e3:.2f} ms  fft: {t_fft*1e3:.2f} ms", flush=True)

t_ts = device_time(lambda a: S.time_stretch(a, 0.9), x3, iters=5)
print(f"time_stretch matmul: {t_ts*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
