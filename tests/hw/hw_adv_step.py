"""Full-size adversarial DAC train-step timing on the real TPU chip.

Same workload as hw_dac_step.py (batch 16 x 0.38 s @ 44.1 kHz) plus the
published discriminator ensemble (MPD periods 2/3/5/7/11 + MRD at
2048/1024/512): one jitted two-optimizer step (generator update with
LSGAN + feature matching, then the discriminator LSGAN update on the
step's reconstruction).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_adv_step.py
"""
import time
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audiotools_tpu.models import DAC, Discriminator
from audiotools_tpu.models.adversarial import make_adversarial_train_step
from audiotools_tpu.ops.benchmark import device_time_queued

B, T, SR = 16, 16896, 44100
print("platform:", jax.devices()[0].platform, flush=True)

gen = DAC()
disc = Discriminator()
audio = jnp.asarray(
    (np.random.RandomState(0).randn(B, 1, T) * 0.1).astype(np.float32)
)
g_params = jax.jit(gen.init)(jax.random.PRNGKey(0), audio[:1])
d_params = jax.jit(disc.init)(jax.random.PRNGKey(1), audio[:1])
for name, p in (("gen", g_params), ("disc", d_params)):
    n = sum(x.size for x in jax.tree_util.tree_leaves(p))
    print(f"{name} params: {n/1e6:.1f}M", flush=True)

g_opt = optax.adamw(1e-4)
d_opt = optax.adamw(1e-4)
g_state = g_opt.init(g_params)
d_state = d_opt.init(d_params)
step = make_adversarial_train_step(gen, disc, g_opt, d_opt, SR)

t0 = time.time()
out = step(g_params, d_params, g_state, d_state, audio)
m = out[4]
print(
    f"step compile+run: {time.time()-t0:.0f}s  loss={float(m['loss']):.3f} "
    f"d_loss={float(m['loss/discriminator']):.3f}",
    flush=True,
)


# the fori_loop-wrapped adversarial HLO exceeds the tunnel's
# remote-compile upload cap (HTTP 413), and closing over the param/opt
# trees inlines them as literals (also 413, hw_adv_upload.py) — time the
# raw single-step program with params as explicit jit args, synced on
# the loss scalar (the full output incl. both updated param trees is
# returned, so neither backward pass can be dead-code-eliminated)
t_step = device_time_queued(
    step,
    g_params,
    d_params,
    g_state,
    d_state,
    audio,
    iters=5,
    sync=lambda out: out[4]["loss"],
)
clips_ps = B / t_step
print(
    f"adversarial train step: {t_step*1e3:.1f} ms  ({clips_ps:.1f} clips/s, "
    f"{clips_ps * (T/SR):.1f}x realtime audio)",
    flush=True,
)
print("DONE", flush=True)
