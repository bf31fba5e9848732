"""Hardware pass 5: pitch_shift internals + bf16 DFT-matmul mel probe.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_round5.py
"""
import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import resample as R
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

B, T, SR = 64, 220500, 44100
WIN, HOP = 2048, 512
print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)

# pitch internals
rate = 2.0 ** (-2.0 / 12.0)
spec = jax.jit(lambda a: F.stft(a, WIN, HOP, method="matmul"))(x)
t_stft = device_time(lambda a: F.stft(a, WIN, HOP, method="matmul"), x, iters=5)
print(f"stft: {t_stft*1e3:.2f} ms", flush=True)

t_voc = device_time(
    lambda s: S.phase_vocoder(s, rate, HOP, WIN), spec, iters=5
)
print(f"vocoder: {t_voc*1e3:.2f} ms", flush=True)

stretched = jax.jit(lambda s: S.phase_vocoder(s, rate, HOP, WIN))(spec)
out_len = int(round(T / rate))
t_istft = device_time(
    lambda s: F.istft(s, WIN, HOP, length=out_len, method="matmul"),
    stretched, iters=5,
)
print(f"istft: {t_istft*1e3:.2f} ms", flush=True)

y = jax.jit(lambda s: F.istft(s, WIN, HOP, length=out_len, method="matmul"))(stretched)
from fractions import Fraction
fr = Fraction(rate).limit_denominator(200)
t_rs = device_time(lambda a: R.resample(a, fr.denominator, fr.numerator), y, iters=5)
print(f"resample {fr.numerator}/{fr.denominator}: {t_rs*1e3:.2f} ms", flush=True)

# bf16 single-pass mel probe
ref = np.asarray(jax.jit(lambda a: F.mel_spectrogram(a, SR, 80, method="matmul"))(x))


def mel_bf16(a):
    spec = F.stft(a, WIN, HOP, method="matmul_bf16") if False else None
    # inline: frames @ bf16 DFT mats, single pass
    from audiotools_tpu.ops.fft import _dft_matrices, _frame, mel_filters
    length = a.shape[-1]
    xx = a.reshape((-1, length))
    cpad = WIN // 2
    xx = jnp.pad(xx, ((0, 0), (cpad, cpad)), mode="reflect")
    frames = _frame(xx, WIN, HOP)
    C, Sm = _dft_matrices("hann", WIN)
    re = jnp.dot(frames, jnp.asarray(C))   # DEFAULT precision: 1-pass bf16
    im = jnp.dot(frames, jnp.asarray(Sm))
    mag = jnp.sqrt(re * re + im * im)
    basis = jnp.asarray(mel_filters(SR, WIN, 80))
    mel = jnp.einsum("btf,mf->bmt", mag, basis)
    return mel.reshape(a.shape[:-1] + mel.shape[1:])

v = np.asarray(jax.jit(mel_bf16)(x))
err = np.abs(v - ref).max() / (np.abs(ref).max() + 1e-9)
t_bf = device_time(mel_bf16, x, iters=5)
t_hi = device_time(lambda a: F.mel_spectrogram(a, SR, 80, method="matmul"), x, iters=5)
print(f"mel bf16 1-pass: {t_bf*1e3:.2f} ms  rel err {err:.1e}   (HIGH: {t_hi*1e3:.2f} ms)", flush=True)
print("DONE", flush=True)
