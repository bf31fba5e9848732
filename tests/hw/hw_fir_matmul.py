"""Hardware validation: Pallas fir_conv_causal + matmul STFT on real TPU.

Run with: timeout 590 python tests/hw/hw_fir_matmul.py
Prints accuracy + timing lines; not part of the CPU pytest suite.
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import filters as FL
from audiotools_tpu.ops import loudness as L
from audiotools_tpu.ops.benchmark import device_time
from audiotools_tpu.ops.pallas_kernels import fir_conv_causal

B, T = 64, 220500  # batch-64 x 5 s @ 44.1 kHz
SR = 44100

print("platform:", jax.devices()[0].platform, flush=True)

rng = np.random.RandomState(0)
x_np = rng.randn(B, T).astype(np.float32) * 0.1
x = jnp.asarray(x_np)

# --- 1. fir_conv_causal vs causal_fft_conv1d: accuracy ----------------------
h = L._composed_fir(SR, "K-weighting", 512)  # the loudness 512-tap FIR
h = np.asarray(h, np.float32)
print("fir taps:", h.shape, flush=True)

t0 = time.time()
y_pallas = np.asarray(jax.jit(lambda a: fir_conv_causal(a, h))(x))
print(f"pallas compile+run: {time.time()-t0:.1f}s", flush=True)
y_ref = np.asarray(jax.jit(lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h)))(x))
err = np.abs(y_pallas - y_ref).max() / (np.abs(y_ref).max() + 1e-9)
print(f"fir_conv_causal rel err vs fft path: {err:.3e}", flush=True)

# --- 2. timing: pallas vs fft conv ------------------------------------------
t_pallas = device_time(lambda a: fir_conv_causal(a, h), x, iters=10)
t_fft = device_time(lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h)), x, iters=10)
print(f"fir pallas: {t_pallas*1e3:.2f} ms   fft: {t_fft*1e3:.2f} ms", flush=True)

# --- 3. matmul STFT vs FFT STFT: accuracy + timing --------------------------
WIN, HOP = 2048, 512
s_fft = np.asarray(jax.jit(lambda a: jnp.abs(F.stft(a, WIN, HOP)))(x))
s_mm = np.asarray(
    jax.jit(lambda a: jnp.abs(F.stft(a, WIN, HOP, method="matmul")))(x)
)
err_s = np.abs(s_fft - s_mm).max() / (np.abs(s_fft).max() + 1e-9)
print(f"matmul stft rel err: {err_s:.3e}", flush=True)

t_sf = device_time(lambda a: jnp.abs(F.stft(a, WIN, HOP)), x, iters=10)
t_sm = device_time(
    lambda a: jnp.abs(F.stft(a, WIN, HOP, method="matmul")), x, iters=10
)
print(f"stft fft: {t_sf*1e3:.2f} ms   matmul: {t_sm*1e3:.2f} ms", flush=True)

# --- 4. mel_spectrogram both paths ------------------------------------------
m_fft = np.asarray(jax.jit(lambda a: F.mel_spectrogram(a, SR, 80))(x))
m_mm = np.asarray(
    jax.jit(lambda a: F.mel_spectrogram(a, SR, 80, method="matmul"))(x)
)
err_m = np.abs(m_fft - m_mm).max() / (np.abs(m_fft).max() + 1e-9)
print(f"matmul mel rel err: {err_m:.3e}", flush=True)
t_mf = device_time(lambda a: F.mel_spectrogram(a, SR, 80), x, iters=10)
t_mm = device_time(lambda a: F.mel_spectrogram(a, SR, 80, method="matmul"), x, iters=10)
print(f"mel fft: {t_mf*1e3:.2f} ms   matmul: {t_mm*1e3:.2f} ms", flush=True)

# --- 5. loudness with pallas FIR --------------------------------------------
t_loud = device_time(lambda a: L.loudness(a, SR), x, iters=10)
print(f"loudness (current): {t_loud*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
