"""Probe: large pow2 rfft/irfft as two-stage Cooley-Tukey MXU matmuls
vs XLA's native FFT, at the RIR-convolve shapes (batch 64, N=2^18).

XLA's TPU FFT is VPU/bandwidth-bound (rfft(2^19)x64 = 14 ms measured in
hw_fft_pack.py). The same transform as 512/256-point DFT matmuls is
~300 GFLOP f32 for the full conv — MXU territory. Tests DEFAULT vs
HIGHEST dot precision (DEFAULT on TPU multiplies in bf16).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_mxu_fft.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)


def _dft_mat(n, sign):
    k = np.arange(n)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / n).astype(np.complex64)


def _c(a):
    # axon cannot device_put complex arrays; assemble on device
    return jax.lax.complex(jnp.asarray(a.real.copy()), jnp.asarray(a.imag.copy()))


def make_fft_ct(N1, N2, sign, precision):
    W1_np = _dft_mat(N1, sign)
    W2_np = _dft_mat(N2, sign)
    tw_np = np.exp(
        sign * 2j * np.pi * np.outer(np.arange(N1), np.arange(N2)) / (N1 * N2)
    ).astype(np.complex64)

    def fft_ct(z):
        W1, W2, tw = _c(W1_np), _c(W2_np), _c(tw_np)
        z = z.reshape(z.shape[:-1] + (N1, N2))
        z = jnp.einsum("...nt,nk->...kt", z, W1, precision=precision)
        z = z * tw
        z = jnp.einsum("...kt,ts->...ks", z, W2, precision=precision)
        return jnp.swapaxes(z, -1, -2).reshape(z.shape[:-2] + (N1 * N2,))

    return fft_ct


def make_rfft(N, N1, N2, precision):
    M = N // 2
    fft_ct = make_fft_ct(N1, N2, -1, precision)
    w_np = np.exp(-2j * np.pi * np.arange(M + 1) / N).astype(np.complex64)

    def rfft_mm(x):
        w = _c(w_np)
        z = jax.lax.complex(x[..., 0::2], x[..., 1::2])
        Z = fft_ct(z)
        Zf = jnp.concatenate([Z, Z[..., :1]], axis=-1)
        Zr = jnp.conj(Zf[..., ::-1])
        E = 0.5 * (Zf + Zr)
        O = -0.5j * (Zf - Zr)
        return E + w * O

    return rfft_mm


def make_irfft(N, N1, N2, precision):
    M = N // 2
    ifft_ct = make_fft_ct(N1, N2, +1, precision)
    w_np = np.exp(2j * np.pi * np.arange(M + 1) / N).astype(np.complex64)

    def irfft_mm(X):
        w = _c(w_np)
        Xr = jnp.conj(X[..., ::-1])
        E = 0.5 * (X + Xr)
        O = 0.5 * w * (X - Xr)
        Z = (E + 1j * O)[..., :M]
        z = ifft_ct(Z) / M
        out = jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)
        return out.reshape(out.shape[:-2] + (N,))

    return irfft_mm


B, N = 64, 262144
N1, N2 = 512, 256
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, N).astype(np.float32))
h = jnp.asarray((rng.randn(B, N) * np.exp(-np.linspace(0, 8, N))).astype(np.float32))

t = device_time(lambda a: jnp.fft.rfft(a), x, iters=5)
print(f"xla rfft({N}) x{B}: {t*1e3:.2f} ms", flush=True)
t = device_time(
    lambda a: jnp.fft.irfft(jnp.fft.rfft(a) * jnp.fft.rfft(h), n=N), x, iters=5
)
print(f"xla conv({N}) x{B}: {t*1e3:.2f} ms", flush=True)
t = device_time(lambda X: jnp.fft.irfft(X, n=N), jax.jit(jnp.fft.rfft)(x), iters=5)
print(f"xla irfft({N}) x{B}: {t*1e3:.2f} ms", flush=True)

# pull only 2 rows through the tunnel for the correctness check; the
# axon tunnel cannot fetch complex arrays (UNIMPLEMENTED) so fetch
# real/imag stacked
def pull_c(fn, arg):
    out = np.asarray(
        jax.jit(lambda a: jnp.stack([jnp.real(fn(a)), jnp.imag(fn(a))]))(arg)
    )
    return out[0] + 1j * out[1]

ref_r = pull_c(lambda a: jnp.fft.rfft(a)[:2], x)
ref_c = np.asarray(
    jax.jit(lambda a: jnp.fft.irfft(jnp.fft.rfft(a) * jnp.fft.rfft(h), n=N)[:2])(x)
)

for prec in ("default", "highest"):
    rf = make_rfft(N, N1, N2, prec)
    irf = make_irfft(N, N1, N2, prec)
    t = device_time(rf, x, iters=5)
    got = pull_c(lambda a: rf(a)[:2], x)
    err = np.abs(got - ref_r).max() / np.abs(ref_r).max()
    print(f"mxu rfft [{prec}]: {t*1e3:.2f} ms  rel_err={err:.2e}", flush=True)

    conv = lambda a: irf(rf(a) * rf(h))
    t = device_time(conv, x, iters=5)
    got = np.asarray(jax.jit(lambda a: conv(a)[:2])(x))
    err = np.abs(got - ref_c).max() / np.abs(ref_c).max()
    print(f"mxu conv [{prec}]: {t*1e3:.2f} ms  rel_err={err:.2e}", flush=True)

print("DONE", flush=True)

# RESULT (v5e, 2026-08-16): xla rfft(2^18)x64 = 3.05 ms, irfft = 4.87 ms,
# full conv = 12.82 ms. MXU CT (512x256) rfft [highest] = 3.44 ms,
# conv = 12.52 ms (rel 7.7e-07); [default/bf16] conv = 10.08 ms at 7.3e-03.
# NEGATIVE: XLA's native TPU FFT already matches the MXU formulation at
# this size — RIR convolve stays on jnp.fft. (Contrast 2^19, where XLA
# rfft is 14 ms — the crossover is between 2^18 and 2^19; convolve's
# aliasing-corrected path already keeps transforms at 2^18.)
