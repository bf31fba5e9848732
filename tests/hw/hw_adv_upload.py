"""Probe: which adversarial-step program forms fit through the axon
remote-compile upload cap (HTTP 413 between ~20-25 MB serialized HLO).

bench.py's adversarial line died with 413 after the hybrid-formulation
commit; the single-step program closed over params/opt-states. Variants:

  closure  — jit(step(a)) closing over params/opt states (bench's form)
  args     — jit(step(params, d_params, states..., a)): consts as real
             parameters, but wrapped in an all-leaf scalar reduction
  raw      — jit(adv_step) itself, params as args, full output returned

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_adv_upload.py <variant>

RESULT (v5e via axon tunnel, 2026-08-19):
  closure — HTTP 413. Closed-over committed device arrays are inlined
            into the uploaded VHLO as dense literals; the ~70 MB of
            f32 param/opt trees blow the cap. (A tiny control probe
            closing over one 16.8 MB array still fit, so the cap — not
            a hard no-closures rule — is the limit.)
  args    — upload fits (terminal log: code_len=10.7 MB) but the
            chipless AOT compile helper was OOM-killed (SIGKILL) for
            this NEW program on this box — the extra ~1k reduction ops
            push the 418 s compile over the helper's memory headroom.
  raw     — compiles (418 s, now in .jax_cache) and runs. This is the
            form bench.py and hw_adv_step.py now time: raw step, params
            as explicit jit args, queued two-point, synced on the loss
            scalar (device_time_queued(..., sync=...)).
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import optax

from audiotools_tpu.models import DAC, Discriminator
from audiotools_tpu.models.adversarial import make_adversarial_train_step

SR = 44100
TB, TT = 16, 16896

variant = sys.argv[1] if len(sys.argv) > 1 else "raw"
print("platform:", jax.devices()[0].platform, "variant:", variant, flush=True)

audio = jnp.asarray(
    (np.random.RandomState(1).randn(TB, 1, TT) * 0.1).astype(np.float32)
)
gen = DAC(formulation="hybrid")
g_params = jax.jit(gen.init)(jax.random.PRNGKey(0), audio[:1])
g_opt = optax.adamw(1e-4)
g_state = g_opt.init(g_params)
disc = Discriminator()
d_params = jax.jit(disc.init)(jax.random.PRNGKey(1), audio[:1])
d_opt = optax.adamw(1e-4)
d_state = d_opt.init(d_params)
adv_step = make_adversarial_train_step(gen, disc, g_opt, d_opt, SR)

t0 = time.perf_counter()
if variant == "closure":

    @jax.jit
    def step(a):
        g2, d2, _, _, m = adv_step(g_params, d_params, g_state, d_state, a)
        leaves = jax.tree_util.tree_leaves((m["loss"], g2, d2))
        return sum(jnp.sum(jnp.real(l)).astype(jnp.float32) for l in leaves)

    out = float(step(audio))
elif variant == "args":

    @jax.jit
    def step(gp, dp, gs, ds, a):
        g2, d2, _, _, m = adv_step(gp, dp, gs, ds, a)
        leaves = jax.tree_util.tree_leaves((m["loss"], g2, d2))
        return sum(jnp.sum(jnp.real(l)).astype(jnp.float32) for l in leaves)

    out = float(step(g_params, d_params, g_state, d_state, audio))
elif variant == "raw":
    step = jax.jit(adv_step)
    res = step(g_params, d_params, g_state, d_state, audio)
    out = float(res[4]["loss"])
else:
    raise SystemExit(f"unknown variant {variant}")

print(f"OK {variant}: {out:.4f}  compile+run {time.perf_counter()-t0:.1f}s", flush=True)
