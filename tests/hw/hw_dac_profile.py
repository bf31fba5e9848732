"""DAC step breakdown on the real chip: encoder/quantizer/decoder/loss
forward costs, full step, and bf16-matmul (amp) variants.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_dac_profile.py
"""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from pathlib import Path
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audiotools_tpu.models import DAC
from audiotools_tpu.models.train import codec_loss, make_train_step
from audiotools_tpu.ops.benchmark import device_time

B, T, SR = 16, 16896, 44100
print("platform:", jax.devices()[0].platform, flush=True)

model = DAC()
audio = jnp.asarray(
    (np.random.RandomState(0).randn(B, 1, T) * 0.1).astype(np.float32)
)
params = jax.jit(model.init)(jax.random.PRNGKey(0), audio[:1])

# forward pieces
def enc(a):
    return model.apply(params, jnp.swapaxes(a, 1, 2), method=lambda m, x: m.encoder(x))

t_enc = device_time(enc, audio, iters=5)
print(f"encoder fwd: {t_enc*1e3:.2f} ms", flush=True)

z = jax.jit(enc)(audio)

t_q = device_time(
    lambda zz: model.apply(params, zz, method=lambda m, x: m.quantizer(x)[0]),
    z, iters=5,
)
print(f"quantizer fwd: {t_q*1e3:.2f} ms", flush=True)

zq = jax.jit(lambda zz: model.apply(params, zz, method=lambda m, x: m.quantizer(x)[0]))(z)
t_dec = device_time(
    lambda zz: model.apply(params, zz, method=lambda m, x: m.decoder(x)),
    zq, iters=5,
)
print(f"decoder fwd: {t_dec*1e3:.2f} ms", flush=True)

t_fwd = device_time(lambda a: codec_loss(model, params, a, SR)[0], audio, iters=5)
print(f"full fwd+loss: {t_fwd*1e3:.2f} ms", flush=True)

opt = optax.adamw(1e-4)
opt_state = opt.init(params)
step = make_train_step(model, opt, SR)

def timed_step(a):
    # return the FULL updated params + opt_state so XLA cannot dead-code-
    # eliminate any of the backward pass or optimizer update (returning
    # only the loss measured forward-only; a [..., :1] slice checksum let
    # XLA skip the elementwise update for the remaining columns)
    p2, o2, m = step(params, opt_state, a)
    return m["loss"], p2, o2

t_step = device_time(timed_step, audio, iters=5)
print(f"train step f32: {t_step*1e3:.2f} ms ({B/t_step:.0f} clips/s)", flush=True)

# bf16 matmul precision (Accelerator amp semantics)
with jax.default_matmul_precision("bfloat16"):
    t_amp = device_time(timed_step, audio, iters=5)
print(f"train step bf16-matmul: {t_amp*1e3:.2f} ms ({B/t_amp:.0f} clips/s)", flush=True)
print("DONE", flush=True)

# true mixed-precision model: bf16 activations/conv compute, f32 master
# params + VQ + loss (DAC(dtype=bf16), the Accelerator amp recipe)
model_bf16 = DAC(dtype=jnp.bfloat16)
step_bf16 = make_train_step(model_bf16, opt, SR)

def timed_step_bf16(a):
    p2, o2, m = step_bf16(params, opt_state, a)
    return m["loss"], p2, o2

t_amp2 = device_time(timed_step_bf16, audio, iters=5)
print(f"train step dtype=bf16: {t_amp2*1e3:.2f} ms ({B/t_amp2:.0f} clips/s)", flush=True)

t_fwd2 = device_time(
    lambda a: codec_loss(model_bf16, params, a, SR)[0], audio, iters=5
)
print(f"fwd+loss dtype=bf16: {t_fwd2*1e3:.2f} ms", flush=True)
print("DONE2", flush=True)

# RESULT (v5e, 2026-08-17): encoder fwd 12.9 ms, decoder 12.6, fwd+loss
# 26.3, train step f32 68.3 ms (234 clips/s = 90x realtime audio at
# B=16 x 0.38 s). default_matmul_precision("bfloat16") and the
# dtype=bf16 model change nothing / +9% (62.5 ms): TPU conv DEFAULT
# precision already multiplies in bf16, and the C=64/128 k=7 convs sit
# at ~30 TFLOP/s regardless — shape-bound MXU utilization, not
# precision-bound. A layout/fusion attack on XLA's conv lowering is the
# remaining lever here.
