"""Probe: framed rfft (STFT core) as Cooley-Tukey MXU matmuls vs the
direct window-fused DFT matmul vs XLA's batched FFT.

Direct DFT matmul: 2048x2050 real MACs/frame (8.4 MFLOP). CT split via
pack-even-odd + two-stage complex FFT of 1024: ~0.26 M real MACs/frame —
32x fewer FLOPs, at the cost of small contraction dims. This probe finds
whether the FLOP cut survives MXU-utilization loss at the headline
shapes (batch 64 x 5 s, win 2048, hop 512 -> 64x435 frames).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_mxu_stft.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.ops.benchmark import device_time
from audiotools_tpu.ops.fft import _dft_matrices, get_window

print("platform:", jax.devices()[0].platform, flush=True)

B, NT, NFFT = 64, 435, 2048
rng = np.random.RandomState(0)
frames = jnp.asarray(rng.randn(B, NT, NFFT).astype(np.float32) * 0.1)
win = jnp.asarray(get_window("hann", NFFT))


def direct(fr):
    C, S = _dft_matrices("hann", NFFT)
    re = jnp.dot(fr, jnp.asarray(C), precision=jax.lax.Precision.HIGH)
    im = jnp.dot(fr, jnp.asarray(S), precision=jax.lax.Precision.HIGH)
    return jax.lax.complex(re, im)


t = device_time(direct, frames, iters=5)
print(f"direct DFT matmul [HIGH]: {t*1e3:.2f} ms", flush=True)

def pull_c(fn, arg):
    out = np.asarray(
        jax.jit(lambda a: jnp.stack([jnp.real(fn(a)), jnp.imag(fn(a))]))(arg)
    )
    return out[0] + 1j * out[1]

ref = pull_c(lambda fr: jnp.fft.rfft(fr * win, axis=-1)[:1], frames)

t = device_time(lambda fr: jnp.fft.rfft(fr * win, axis=-1), frames, iters=5)
print(f"xla rfft(2048) framed: {t*1e3:.2f} ms", flush=True)


def _dft_mat(n, sign):
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n).astype(np.complex64)


def _c(a):
    # the axon tunnel cannot device_put complex arrays (UNIMPLEMENTED);
    # assemble them on device from real planes
    return jax.lax.complex(jnp.asarray(a.real.copy()), jnp.asarray(a.imag.copy()))


def make_ct_rfft(N, N1, N2, precision):
    M = N // 2
    assert N1 * N2 == M
    W1_np = _dft_mat(N1, -1)
    W2_np = _dft_mat(N2, -1)
    tw_np = np.exp(
        -2j * np.pi * np.outer(np.arange(N1), np.arange(N2)) / M
    ).astype(np.complex64)
    w_unt_np = np.exp(-2j * np.pi * np.arange(M + 1) / N).astype(np.complex64)

    def rfft_ct(fr):
        W1, W2, tw, w_unt = _c(W1_np), _c(W2_np), _c(tw_np), _c(w_unt_np)
        xw = fr * win
        z = jax.lax.complex(xw[..., 0::2], xw[..., 1::2])  # (..., M)
        z = z.reshape(z.shape[:-1] + (N1, N2))
        z = jnp.einsum("...nt,nk->...kt", z, W1, precision=precision)
        z = z * tw
        z = jnp.einsum("...kt,ts->...ks", z, W2, precision=precision)
        Z = jnp.swapaxes(z, -1, -2).reshape(z.shape[:-2] + (M,))
        Zf = jnp.concatenate([Z, Z[..., :1]], axis=-1)
        Zr = jnp.conj(Zf[..., ::-1])
        E = 0.5 * (Zf + Zr)
        O = -0.5j * (Zf - Zr)
        return E + w_unt * O

    return rfft_ct


got = pull_c(lambda fr: direct(fr)[:1], frames)
print(f"direct err: {np.abs(got - ref).max() / np.abs(ref).max():.2e}", flush=True)

for (N1, N2) in ((32, 32), (64, 16), (128, 8)):
    for prec in ("highest", "default"):
        fn = make_ct_rfft(NFFT, N1, N2, prec)
        t = device_time(fn, frames, iters=5)
        got = pull_c(lambda fr: fn(fr)[:1], frames)
        err = np.abs(got - ref).max() / np.abs(ref).max()
        print(
            f"ct rfft {N1}x{N2} [{prec}]: {t*1e3:.2f} ms  rel_err={err:.2e}",
            flush=True,
        )

print("DONE", flush=True)

# RESULT (v5e, 2026-08-16): direct window-fused DFT matmul [HIGH] on
# pre-framed (64,435,2048) = 2.07 ms; xla framed rfft = 7.74 ms. CT
# split is a NET LOSS at frame size: 32x32 = 12.1 ms, 64x16 = 12.0,
# 128x8 = 9.7 [highest] (8.3 default) — the 32x FLOP cut is swamped by
# small-contraction MXU inefficiency + twiddle/layout shuffles. The
# direct matmul stays. Full stft(method='matmul') is 5.85 ms, so ~2.6 ms
# is framing/pad/transpose around the 2.07 ms matmul -> see
# hw_stft_conv.py for the fused conv lowering.
