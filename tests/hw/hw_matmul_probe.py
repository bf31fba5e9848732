"""Raw MXU matmul cost probe for the mel-path shapes.

Determines the fused-kernel headroom: if the bare (27584, 2048) @
(2048, 2050) HIGH-precision matmul costs ~most of mel's 14 ms, a fused
Pallas kernel can't beat XLA; if it's ~4 ms, fusion has ~10 ms headroom.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_matmul_probe.py
"""
import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
M, K, N = 64 * 431, 2048, 2050  # frames x n_fft x (cos|sin freqs)
A = jnp.asarray(rng.randn(M, K).astype(np.float32) * 0.1)
B = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.1)

for prec in ("DEFAULT", "HIGH", "HIGHEST"):
    p = getattr(jax.lax.Precision, prec)
    t = device_time(lambda a: jnp.dot(a, B, precision=p), A, iters=5)
    print(f"matmul {M}x{K}x{N} {prec}: {t*1e3:.2f} ms", flush=True)

# the frame-gather + transpose overhead: time stft pieces
from audiotools_tpu.ops.fft import _frame

x = jnp.asarray(rng.randn(64, 221184 + 2048).astype(np.float32))
t_fr = device_time(lambda a: _frame(a, 2048, 512), x, iters=5)
print(f"framing alone: {t_fr*1e3:.2f} ms", flush=True)

# abs of complex (spec-sized)
z = jnp.asarray(
    (rng.randn(64, 1025, 431) + 1j * rng.randn(64, 1025, 431)).astype(np.complex64)
)
t_abs = device_time(lambda a: jnp.abs(a), z, iters=5)
print(f"complex abs alone: {t_abs*1e3:.2f} ms", flush=True)
print("DONE", flush=True)
