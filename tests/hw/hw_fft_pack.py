"""Does pairing real signals into complex FFTs beat rfft on v5e?

A real pair (a, b) packs into z = a + ib: fft(z) yields both rffts via
hermitian split. If XLA's rfft doesn't already exploit realness, packing
halves FFT count for batched convolution.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_fft_pack.py
"""
import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
B, N = 64, 524288
x = jnp.asarray(rng.randn(B, N).astype(np.float32))

t_r = device_time(lambda a: jnp.fft.rfft(a), x, iters=5)
print(f"rfft({N}) x{B}: {t_r*1e3:.2f} ms", flush=True)


def packed(a):
    z = jax.lax.complex(a[0::2], a[1::2])
    Z = jnp.fft.fft(z)
    # hermitian split: A = (Z + conj(Z[-k]))/2, Bc = (Z - conj(Z[-k]))/(2i)
    Zr = jnp.conj(jnp.roll(Z[..., ::-1], 1, axis=-1))
    A = 0.5 * (Z + Zr)
    Bc = -0.5j * (Z - Zr)
    return A, Bc

t_p = device_time(packed, x, iters=5)
print(f"packed fft({N}) x{B//2} + split: {t_p*1e3:.2f} ms", flush=True)

# correctness
A, Bc = jax.jit(packed)(x)
ref = np.asarray(jnp.fft.fft(x.astype(jnp.complex64)))
err_a = np.abs(np.asarray(A) - ref[0::2]).max() / np.abs(ref).max()
err_b = np.abs(np.asarray(Bc) - ref[1::2]).max() / np.abs(ref).max()
print(f"pack split err: {err_a:.1e} {err_b:.1e}", flush=True)

# complex fft cost alone for reference
z = jnp.asarray((rng.randn(B // 2, N) + 1j * rng.randn(B // 2, N)).astype(np.complex64))
t_c = device_time(lambda a: jnp.fft.fft(a), z, iters=5)
print(f"complex fft({N}) x{B//2}: {t_c*1e3:.2f} ms", flush=True)
# and half-size
t_h = device_time(lambda a: jnp.fft.rfft(a), x[:, :N//2], iters=5)
print(f"rfft({N//2}) x{B}: {t_h*1e3:.2f} ms", flush=True)
print("DONE", flush=True)

# RESULT (v5e, 2026-08-16): rfft(524288)x64 = 13.98 ms; packed complex fft
# x32 + hermitian split = 18.84 ms. XLA's TPU rfft already exploits
# realness — packing is a net loss. RIR convolve stays on plain rfft.
