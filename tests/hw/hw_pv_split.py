"""Split the phase vocoder's 7.6 ms into (a) the Pallas-fusable front
(abs/angle/gather/lerp/wrap -> mag_t, dev) and (b) the XLA-resident back
(cumsum + exp + multiply). A fused kernel can only attack (a); go/no-go
depends on (a)'s share.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_pv_split.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, T = 64, 220500
WIN, HOP = 2048, 512
rate = 2 ** (-2 / 12.0)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)
spec = jax.jit(lambda a: F.stft(a, WIN, HOP, "hann", method="matmul"))(x)

F_bins, Tn = spec.shape[-2], spec.shape[-1]
n_steps = int(np.ceil(Tn / rate))
steps = np.arange(n_steps) * rate
i0 = np.minimum(np.floor(steps).astype(np.int32), Tn - 1)
i1 = np.minimum(i0 + 1, Tn - 1)
frac = (steps - i0).astype(np.float32)
phi_advance = (
    2.0 * np.pi * HOP * np.arange(F_bins, dtype=np.float32) / WIN
)[:, None]


def front(sp):
    mag = jnp.abs(sp)
    phase = jnp.angle(sp)
    mag_t = (1.0 - frac) * mag[..., i0] + frac * mag[..., i1]
    dphase = phase[..., i1] - phase[..., i0] - phi_advance
    dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))
    sa = phi_advance + dphase
    sa = sa - 2.0 * np.pi * jnp.round(sa / (2.0 * np.pi))
    return mag_t, sa, phase[..., i0[:1]]


def ms(fn, arg, iters=10):
    return device_time(fn, arg, iters=iters) * 1e3


print(f"pv total: {ms(lambda sp: S.phase_vocoder(sp, rate, HOP, WIN), spec):.2f} ms", flush=True)
print(f"front (fusable): {ms(lambda sp: front(sp), spec):.2f} ms", flush=True)

mag_t, sa, p0 = jax.jit(front)(spec)
packed = jax.jit(lambda m, s: jnp.stack([m, s]))(mag_t, sa)


def back(pk):
    m, s = pk[0], pk[1]
    acc = jnp.cumsum(s, axis=-1)
    phase_out = jnp.concatenate(
        [jnp.zeros_like(acc[..., :1]), acc[..., :-1]], axis=-1
    )
    return m * jnp.exp(1j * phase_out)


print(f"back (cumsum+exp): {ms(back, packed):.2f} ms", flush=True)
print("DONE", flush=True)

# RESULT (v5e, 2026-08-17): pv total 7.16 ms; front (abs/angle/gathers/
# lerp/wrap — the Pallas-fusable half) 4.12 ms; back (cumsum + exp +
# multiply — stays in XLA either way) 4.71 ms standalone (~3.0 fused
# into the whole). A perfect front kernel (~1.5 ms bandwidth floor)
# would save only ~2 ms of the 66 ms chain step (~3%) — NOT worth the
# Mosaic complexity. PV stays pure XLA; recorded as a declined lever.
