"""Hardware pass 2: Pallas FIR precision, overlap-save timings, loudness.

Run: cd /root/repo && timeout 590 python tests/hw/hw_round2.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import filters as FL
from audiotools_tpu.ops import loudness as L
from audiotools_tpu.ops.benchmark import device_time
from audiotools_tpu.ops.pallas_kernels import fir_conv_causal

B, T = 64, 220500
SR = 44100

print("platform:", jax.devices()[0].platform, flush=True)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
x3 = x[:, None, :]  # (B, 1, T)

h = np.asarray(L._composed_fir(SR, "K-weighting", 512), np.float32)

# 1. Pallas FIR with HIGHEST precision
t0 = time.time()
y_p = np.asarray(jax.jit(lambda a: fir_conv_causal(a, h))(x))
print(f"pallas compile: {time.time()-t0:.0f}s", flush=True)
y_r = np.asarray(jax.jit(lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h)))(x))
err = np.abs(y_p - y_r).max() / (np.abs(y_r).max() + 1e-9)
print(f"pallas HIGHEST rel err: {err:.3e}", flush=True)
t_p = device_time(lambda a: fir_conv_causal(a, h), x, iters=10)
print(f"pallas HIGHEST: {t_p*1e3:.2f} ms", flush=True)

# 2. overlap-save causal conv (VPU blocks) for the same kernel
for bs in (4096, 8192, 16384):
    y_os = np.asarray(
        jax.jit(lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h), block_size=bs))(x)
    )
    e = np.abs(y_os - y_r).max() / (np.abs(y_r).max() + 1e-9)
    t_os = device_time(
        lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h), block_size=bs), x, iters=10
    )
    print(f"os-causal bs={bs}: {t_os*1e3:.2f} ms  err {e:.1e}", flush=True)

# 3. low_pass: tight support (concrete 4k cutoffs) full vs block
cut = jnp.asarray(rng.uniform(4000, 16000, B).astype(np.float32))
t_full = device_time(
    lambda a: FL.low_pass(a, cut, SR, min_cutoff_hz=4000.0), x3, iters=10
)
t_blk = device_time(
    lambda a: FL.low_pass(a, cut, SR, min_cutoff_hz=4000.0, block_size=2048),
    x3, iters=10,
)
t_wide = device_time(lambda a: FL.low_pass(a, cut, SR), x3, iters=3)
print(
    f"low_pass 4k-support full: {t_full*1e3:.2f} ms  block2048: {t_blk*1e3:.2f} ms"
    f"  40Hz-support full: {t_wide*1e3:.2f} ms",
    flush=True,
)

# 4. split_bands / equalizer: full vs block
t_sb_full = device_time(lambda a: FL.split_bands(a, SR, 6), x3, iters=5)
t_sb_blk = device_time(
    lambda a: FL.split_bands(a, SR, 6, block_size=32768), x3, iters=5
)
print(f"split_bands full: {t_sb_full*1e3:.2f} ms  block32768: {t_sb_blk*1e3:.2f} ms", flush=True)

# 5. loudness (fixed shape bug: (B, C, T))
t_loud = device_time(lambda a: L.loudness(a, SR), x3, iters=10)
print(f"loudness composed-FIR: {t_loud*1e3:.2f} ms", flush=True)
t_loud_f = device_time(lambda a: L.loudness(a, SR, use_fir=True), x3, iters=10)
print(f"loudness 512-FIR: {t_loud_f*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
