"""Component breakdown of the adversarial step: where do 148 ms go?

hw_adv_bf16.py showed halving the discriminator matmul cost moves the
step 0%, so the limiter is not MXU flops. This probe times each piece
in isolation (fwd and fwd+bwd where cheap to close over) to find it:
G step alone, D(x) ensemble fwd, MPD-only fwd, MRD-only fwd, D fwd+bwd.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_adv_profile.py

RESULT (v5e via axon tunnel, 2026-08-19):
    gen recon step      :  76-79 ms   (queued method; bench two-point: 64)
    D ensemble fwd      :   9.1 ms    (MPD 2.6-3.6, MRD 6.9)
    D real+fake fwd+bwd :  46.0 ms    -> D backward ~27.5 ms = 3x fwd
    D paired fwd+bwd    :  49.5 ms    NEGATIVE (one concat'd call)
    adv step (paired)   : 174.8 ms    NEGATIVE vs 148.5 separate —
                          concat doubles peak activation memory through
                          the backward; separate calls restored.
Together with hw_adv_bf16.py (bf16 D: 0% speedup): the adversarial
step's D legs are bound by XLA's backward lowering of the stride-3
small-kernel weight-normed convs (memory/layout), not MXU flops, not
per-op dispatch count. Closing the remaining gap needs a custom
backward (Pallas wgrad for (5,1)-stride-3 convs) — recorded as the
open lever with its ceiling: D bwd is ~27 ms of the 148 ms step, and a
2x better wgrad would buy ~13 ms (-> ~119 clips/s).
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
from audiotools_tpu.models.train import make_train_step
from audiotools_tpu.ops.benchmark import device_time, device_time_queued

B, T, SR = 16, 16896, 44100
print("platform:", jax.devices()[0].platform, flush=True)

audio = jnp.asarray(
    (np.random.RandomState(1).randn(B, 1, T) * 0.1).astype(np.float32)
)

# --- generator reconstruction step alone (known ~64 ms) ---
gen = DAC(formulation="hybrid")
g_params = jax.jit(gen.init)(jax.random.PRNGKey(0), audio[:1])
g_opt = optax.adamw(1e-4)
g_state = g_opt.init(g_params)
dac_step = make_train_step(gen, g_opt, SR)
t = device_time_queued(
    dac_step, g_params, g_state, audio, iters=5, sync=lambda o: o[2]["loss"]
)
print(f"gen recon step      : {t*1e3:7.2f} ms", flush=True)

# --- discriminator ensemble forward / pieces ---
disc = Discriminator()
d_params = jax.jit(disc.init)(jax.random.PRNGKey(1), audio[:1])


def d_fwd(p, a):
    outs = disc.apply(p, a)
    return sum(jnp.sum(o[-1]) for o in outs)


t = device_time_queued(d_fwd, d_params, audio, iters=10, sync=lambda o: o)
print(f"D ensemble fwd      : {t*1e3:7.2f} ms", flush=True)

mpd_only = Discriminator(fft_sizes=())
p_mpd = jax.jit(mpd_only.init)(jax.random.PRNGKey(1), audio[:1])


def mpd_fwd(p, a):
    outs = mpd_only.apply(p, a)
    return sum(jnp.sum(o[-1]) for o in outs)


t = device_time_queued(mpd_fwd, p_mpd, audio, iters=10, sync=lambda o: o)
print(f"MPD (5 periods) fwd : {t*1e3:7.2f} ms", flush=True)

mrd_only = Discriminator(periods=())
p_mrd = jax.jit(mrd_only.init)(jax.random.PRNGKey(1), audio[:1])


def mrd_fwd(p, a):
    outs = mrd_only.apply(p, a)
    return sum(jnp.sum(o[-1]) for o in outs)


t = device_time_queued(mrd_fwd, p_mrd, audio, iters=10, sync=lambda o: o)
print(f"MRD (3 windows) fwd : {t*1e3:7.2f} ms", flush=True)


# --- D fwd+bwd (the D-update leg: D(real)+D(fake), grads wrt params) ---
def d_update(p, a, b):
    def loss(pp):
        real = disc.apply(pp, a)
        fake = disc.apply(pp, b)
        out = 0.0
        for r, f in zip(real, fake):
            out = out + jnp.mean((1.0 - r[-1]) ** 2) + jnp.mean(f[-1] ** 2)
        return out

    val, grads = jax.value_and_grad(loss)(p)
    return val, grads


fake = audio + 0.01
t = device_time_queued(
    d_update, d_params, audio, fake, iters=5, sync=lambda o: o[0]
)
print(f"D real+fake fwd+bwd : {t*1e3:7.2f} ms", flush=True)


# paired-call variant of the D update: concat(real, fake) through ONE
# ensemble call (models/adversarial.py::_apply_paired)
def d_update_paired(p, a, b):
    from audiotools_tpu.models.adversarial import _apply_paired

    def loss(pp):
        real, fake = _apply_paired(disc, pp, a, b)
        out = 0.0
        for r, f in zip(real, fake):
            out = out + jnp.mean((1.0 - r[-1]) ** 2) + jnp.mean(f[-1] ** 2)
        return out

    val, grads = jax.value_and_grad(loss)(p)
    return val, grads


t = device_time_queued(
    d_update_paired, d_params, audio, fake, iters=5, sync=lambda o: o[0]
)
print(f"D paired fwd+bwd    : {t*1e3:7.2f} ms", flush=True)

# full adversarial step as currently implemented in models/adversarial.py
from audiotools_tpu.models.adversarial import make_adversarial_train_step

d_opt = optax.adamw(1e-4)
d_state = d_opt.init(d_params)
adv_step = make_adversarial_train_step(gen, disc, g_opt, d_opt, SR)
t = device_time_queued(
    adv_step, g_params, d_params, g_state, d_state, audio,
    iters=5, sync=lambda o: o[4]["loss"],
)
print(f"adv step (current)  : {t*1e3:7.2f} ms = {B/t:.1f} clips/s", flush=True)
