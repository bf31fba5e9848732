"""A/B the adversarial step with a bf16-compute discriminator ensemble.

The analytic accounting (docs/perf.md) puts the D ensemble at ~9 x
12.3 GMAC/item per step = ~61% of the adversarial step's FLOPs, all in
f32 today. Discriminator(dtype=bf16) keeps params f32 and casts compute
(mixed precision, the published DAC trains with AMP) — this probe
measures the step-time effect and checks the numerics: logit agreement
on the same inputs and loss-trajectory agreement over a few steps.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_adv_bf16.py

RESULT (v5e via axon tunnel, 2026-08-19): NEGATIVE for speed, fine for
numerics —
    f32 : 144.3 ms/step = 110.9 clips/s
    bf16: 144.6 ms/step = 110.7 clips/s
    losses agree to ~1e-4 rel; per-sub-D logit rel err 3.8e-3..7e-3.
Halving the D ensemble's matmul cost moves the step 0% => the
adversarial step is NOT MXU-flops-bound in the discriminators. The
analytic MFU (19.8%, docs/perf.md) therefore reflects a non-matmul
limiter (layout/VPU/fusion overhead in the folded MPD planes and the
band-split MRD stacks), not MXU saturation. See hw_adv_profile.py for
the component breakdown.
"""
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

audio = jnp.asarray(
    (np.random.RandomState(1).randn(B, 1, T) * 0.1).astype(np.float32)
)
gen = DAC(formulation="hybrid")
g_params = jax.jit(gen.init)(jax.random.PRNGKey(0), audio[:1])
g_opt = optax.adamw(1e-4)
d_opt = optax.adamw(1e-4)

for label, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
    disc = Discriminator(dtype=dtype)
    d_params = jax.jit(disc.init)(jax.random.PRNGKey(1), audio[:1])
    g_state = g_opt.init(g_params)
    d_state = d_opt.init(d_params)
    step = make_adversarial_train_step(gen, disc, g_opt, d_opt, SR)

    t = device_time_queued(
        step, g_params, d_params, g_state, d_state, audio,
        iters=5, sync=lambda out: out[4]["loss"],
    )
    out = jax.jit(step)(g_params, d_params, g_state, d_state, audio)
    m = jax.tree_util.tree_map(float, out[4])
    print(
        f"{label}: {t*1e3:.1f} ms/step = {B/t:.1f} clips/s | "
        f"loss {m['loss']:.4f} adv {m['loss/adv']:.4f} "
        f"feat {m['loss/feature']:.4f} d {m['loss/discriminator']:.4f}",
        flush=True,
    )

# logit agreement on identical params/inputs: init f32 discriminator and
# evaluate both precisions from the SAME param tree
disc32 = Discriminator()
disc16 = Discriminator(dtype=jnp.bfloat16)
d_params = jax.jit(disc32.init)(jax.random.PRNGKey(2), audio[:1])
outs32 = jax.jit(disc32.apply)(d_params, audio)
outs16 = jax.jit(disc16.apply)(d_params, audio)
errs = []
for o32, o16 in zip(outs32, outs16):
    a = np.asarray(o32[-1], dtype=np.float64)
    b = np.asarray(o16[-1], dtype=np.float64)
    errs.append(np.abs(a - b).max() / (np.abs(a).max() + 1e-12))
print("logit rel errs per sub-D:", [f"{e:.2e}" for e in errs], flush=True)
