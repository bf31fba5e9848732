"""Hardware probe: RIR convolve — compact-IR overlap-save vs full pow2 FFT.

Case from bench.py's chain: batch-64 mono 5 s @ 44.1 kHz signal, 1 s IR
(reference profile makes RoomImpulseResponse the hot transform,
/root/reference/tests/profilers/profile_speed.py:52-79).
"""
import numpy as np
import jax
import jax.numpy as jnp

from audiotools_tpu.ops.benchmark import device_time
from audiotools_tpu.ops.filters import overlap_save_valid

B, C, L, K = 64, 1, 220500, 44100
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, C, L).astype(np.float32))
ir = jnp.asarray((rng.randn(B, C, K) * np.exp(-np.linspace(0, 8, K))).astype(np.float32))
shift = jnp.asarray(rng.randint(0, K, size=(B,)))


def full_fft(x):
    n = 1 << (2 * L - 1).bit_length()
    irp = jnp.pad(ir, ((0, 0), (0, 0), (0, L - K)))
    doubled = jnp.concatenate([irp, irp], axis=-1)
    rolled = jax.vmap(lambda d, s: jax.lax.dynamic_slice_in_dim(d, s, L, axis=-1))(doubled, shift)
    lin = jnp.fft.irfft(jnp.fft.rfft(rolled, n=n) * jnp.fft.rfft(x, n=n), n=n)
    y = lin[..., :L].at[..., : L - 1].add(lin[..., L : 2 * L - 1])
    return y


def make_os(nfft):
    def os_path(x):
        xp = jnp.pad(x, ((0, 0), (0, 0), (K - 1, K - 1)))
        lin = overlap_save_valid(xp, ir, nfft, correlate=False)[..., : L + K - 1]
        y = lin[..., :L].at[..., : K - 1].add(lin[..., L:])
        doubled = jnp.concatenate([y, y], axis=-1)
        return jax.vmap(lambda d, s: jax.lax.dynamic_slice_in_dim(d, s, L, axis=-1))(doubled, shift)
    return os_path


ref = full_fft(x)
t_full = device_time(full_fft, x, iters=5)
print(f"full pow2-{1 << (2*L-1).bit_length()} FFT: {t_full*1e3:8.2f} ms")
for nfft in (65536, 131072, 262144):
    f = make_os(nfft)
    got = f(x)
    # compare unrolled conv region (roll identical), tolerate fold fp noise
    err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    t = device_time(f, x, iters=5)
    print(f"overlap-save nfft={nfft:6d}: {t*1e3:8.2f} ms  rel_err={err:.2e}  speedup={t_full/t:.2f}x")

# RESULT (v5e, 2026-08-16): full pow2-524288 FFT path = 33.57 ms;
# overlap-save nfft=131072 = 31.21 ms (1.08x — FFT cost is points-bound,
# not log-bound); aliasing-corrected pow2-262144 circular conv with small
# tail fix-up (the shipped core/_effects.py::convolve path) = 15.95 ms
# = 2.1x, ~6e-7 rel err.
