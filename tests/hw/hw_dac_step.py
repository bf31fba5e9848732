"""Full-size DAC train-step timing on the real TPU chip.

DAC-paper-style workload: batch 16 x 0.38 s @ 44.1 kHz (16764 samples =
33 frames x 512-hop, padded to 16896). Measures fwd+bwd+optimizer as one
jitted step, plus the loss stack alone.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_dac_step.py
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
# jit the init: eager dispatch over the tunnel is ~10 s per op
params = jax.jit(model.init)(jax.random.PRNGKey(0), audio[:1])
n_params = sum(p.size for p in jax.tree_util.tree_leaves(params))
print(f"params: {n_params/1e6:.1f}M", flush=True)

opt = optax.adamw(1e-4)
opt_state = opt.init(params)
step = make_train_step(model, opt, SR)

import time
t0 = time.time()
p2, o2, metrics = step(params, opt_state, audio)
print(f"step compile+run: {time.time()-t0:.0f}s  loss={float(metrics['loss']):.3f}", flush=True)


def timed_step(a):
    # return the updated params too so XLA cannot dead-code-eliminate the
    # backward pass + optimizer update (device_time consumes all leaves)
    p2, _, m = step(params, opt_state, a)
    return m["loss"], p2

t_step = device_time(timed_step, audio, iters=5)
clips_ps = B / t_step
print(f"train step: {t_step*1e3:.1f} ms  ({clips_ps:.1f} clips/s, "
      f"{clips_ps * (T/SR):.1f}x realtime audio)", flush=True)

# loss stack alone (fwd only)
t_loss = device_time(
    lambda a: codec_loss(model, params, a, SR)[0], audio, iters=5
)
print(f"fwd+loss: {t_loss*1e3:.1f} ms", flush=True)
print("DONE", flush=True)
