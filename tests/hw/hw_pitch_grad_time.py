"""Which sub-leg of jax.grad(pitch_shift) costs 13 seconds?

hw_pv_fused_grad.py measured the FULL pitch-leg fwd+bwd at ~13.1 s per
step (reproducible, two sync variants) — ~850x the 15.6 ms forward —
while the PV-core fwd+bwd is 13-26 ms. This probe times each sub-leg's
gradient with the queued two-point method (the fori_loop wrapper
crashes the worker on these programs, hw_pitch_grad_crash.py).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tests/hw/hw_pitch_grad_time.py

RESULT (v5e via axon tunnel, 2026-08-20):
  before (XLA autodiff of the strided polyphase conv):
    resample 49/55              :  13106.62 ms   <-- the whole cost
    stft matmul (mag)           :     14.77 ms
    stft+istft(matmul_bf16)     :     18.55 ms
    stft+PV(angle) (mag)        :     24.97 ms
    time_stretch(angle)         :     39.12 ms
  after (custom VJP: the exact adjoint as a stride-1 residue-bank conv,
  ops/resample.py::_resample_device_diff):
    resample 49/55              :      3.35 ms   (3912x)
    stft matmul (mag)           :     13.21 ms
    stft+istft(matmul_bf16)     :     17.92 ms
    stft+PV(angle) (mag)        :     24.72 ms
    time_stretch(angle)         :     39.57 ms
XLA's automatic transpose of a stride-55 VALID conv is an input-dilated
conv that lowers catastrophically on v5e; expressing the same adjoint
as a dense stride-1 conv over the de-interleaved cotangent (old output
channels, ceil(W/old) taps) is ~4000x faster and matches autodiff to
7e-7 (tests/core/test_filters_resample.py).
"""
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import resample as R
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time_queued

print("platform:", jax.devices()[0].platform, flush=True)

B, T, SR = 64, 220500, 44100
rng = np.random.RandomState(0)
audio = jnp.asarray((rng.randn(B, 1, T) * 0.1).astype(np.float32))
rate = 2.0 ** (-2.0 / 12.0)
short = audio[..., : int(T * 49 / 55)]


def timed(name, fn, arg):
    g = jax.grad(lambda a: jnp.sum(fn(a) ** 2))
    t = device_time_queued(g, arg, iters=2)
    print(f"{name:28s}: {t*1e3:9.2f} ms", flush=True)


timed("resample 49/55", lambda a: R.resample(a, 55, 49), audio)
timed(
    "stft matmul (mag)",
    lambda a: jnp.abs(F.stft(a[:, 0, :], 2048, 512, "hann", method="matmul")),
    short,
)
timed(
    "stft+istft(matmul_bf16)",
    lambda a: F.istft(
        F.stft(a[:, 0, :], 2048, 512, "hann", method="matmul"),
        2048, 512, "hann", length=a.shape[-1], method="matmul_bf16",
    ),
    short,
)
timed(
    "stft+PV(angle) (mag)",
    lambda a: jnp.abs(
        S.phase_vocoder(
            F.stft(a[:, 0, :], 2048, 512, "hann", method="matmul"),
            rate, 512, 2048, formulation="angle",
        )
    ),
    short,
)
timed(
    "time_stretch(angle)",
    lambda a: S.time_stretch(
        a, rate, 2048, 512, synthesis_method="matmul_bf16",
        pv_formulation="angle",
    ),
    short,
)
print("DONE", flush=True)
