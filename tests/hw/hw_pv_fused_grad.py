"""Hardware validation + timing of the fused PV's custom VJP.

The forward is pallas_kernels.phase_vocoder_fused; the backward
(stretch._fused_pv_diff) is one rotation_cumprod kernel pass (P
reconstruction) + a reversed cumsum + the jnp prep VJP. This probe
(a) checks the backward's numbers on real hardware against the
differentiable phasor formulation's autodiff, (b) times fwd+bwd for
both at bench shapes.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_pv_fused_grad.py

RESULT (v5e via axon tunnel, 2026-08-20):
  cut 1 (jax.vjp(prep) + rotation_cumprod re-scan + flip-cumsums):
    grad parity fused vs phasor (b2 spec, hardware): 8.7e-05 rel
    PV core fwd+bwd  angle        : 13.52 ms
    PV core fwd+bwd  phasor (XLA) : 38.48 ms
    PV core fwd+bwd  phasor_fused : 28.50 ms
  cut 2 (P emitted as a forward residual — no backward re-scan — plus
  one stacked lax.cumsum(reverse=True); hw_pv_bwd_parts.py motivated):
    grad parity fused vs phasor (b2 spec, hardware): 4.35e-05 rel
    PV core fwd+bwd  angle        : 13.56 ms
    PV core fwd+bwd  phasor (XLA) : 37.81 ms
    PV core fwd+bwd  phasor_fused : 26.11 ms
Conclusion (recorded, not projected): the fused path is now fully
differentiable with pinned-parity grads and beats the 2x-HBM phasor
fallback by 1.4x, but the ANGLE path's XLA autodiff keeps the fwd+bwd
crown (its whole backward fuses; the fused path's backward pays
relayouts + a prep re-derivation that two engineering cuts brought from
25.7 to 23.3 ms of backward-side work). Division of labor, measured:
``phasor_fused`` for forward/augmentation (2.77 vs 5.96 ms),
``angle`` (the API default) when optimizing through the vocoder.

Full pitch-leg fwd+bwd (queued two-point; the fori_loop harness
crashes the worker on these programs, hw_pitch_grad_crash.py):
    before: 13146.70 ms (angle) / 13156.00 ms (fused) — ~850x the
    15.6 ms forward, formulation-independent. Decomposition
    (hw_pitch_grad_time.py) pinned the ENTIRE cost on XLA's automatic
    transpose of the strided polyphase resample conv (13.1 s alone).
    after the resample custom VJP (ops/resample.py::polyphase_conv_diff,
    exact adjoint as a stride-1 residue-bank conv — 3.35 ms, ~4000x):
    pitch leg fwd+bwd angle        :   42.92 ms   (306x end-to-end)
    pitch leg fwd+bwd phasor_fused :   60.26 ms
Differentiable pitch shift is now trainable-through at ~2.7x the
forward's cost (angle formulation; 15.6 ms fwd -> 42.9 fwd+bwd).
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

from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, F_bins, T = 64, 1025, 384
rate = 2.0 ** (-2.0 / 12.0)
rng = np.random.RandomState(0)
re = jnp.asarray(rng.randn(B, F_bins, T).astype(np.float32))
im = jnp.asarray(rng.randn(B, F_bins, T).astype(np.float32))


def make_loss(formulation):
    def loss(r, i):
        out = S.phase_vocoder(
            jax.lax.complex(r, i), rate, 512, 2048, formulation=formulation
        )
        return jnp.sum(jnp.abs(out) ** 2) + 0.5 * jnp.sum(jnp.real(out))

    return loss


# hardware grad parity (b2): fused custom VJP vs phasor autodiff
gf = jax.jit(jax.grad(make_loss("phasor_fused"), argnums=(0, 1)))(
    re[:2], im[:2]
)
gp = jax.jit(jax.grad(make_loss("phasor"), argnums=(0, 1)))(re[:2], im[:2])
scale = max(float(jnp.abs(gp[0]).max()), float(jnp.abs(gp[1]).max()))
err = max(
    float(jnp.abs(gf[0] - gp[0]).max()), float(jnp.abs(gf[1] - gp[1]).max())
) / scale
print(f"grad parity fused vs phasor (hardware, b2): {err:.2e}", flush=True)
assert err < 1e-4

for form in ("angle", "phasor", "phasor_fused"):
    g = jax.grad(make_loss(form), argnums=(0, 1))

    def fwd_bwd(r):
        gr, gi = g(r, im)
        return gr + gi

    t = device_time(fwd_bwd, re, iters=5)
    print(f"PV core fwd+bwd {form:13s}: {t*1e3:7.2f} ms", flush=True)

# Full differentiable pitch-shift leg. The fori_loop-wrapped timing of
# this grad program crashes the tunneled TPU worker (the gradient
# itself is fine — every sub-leg and the full leg pass as single
# programs, tests/hw/hw_pitch_grad_crash.py), so it is timed with the
# queued two-point method instead (no loop wrapper).
from audiotools_tpu.ops.benchmark import device_time_queued

audio = jnp.asarray(rng.randn(B, 1, 220500).astype(np.float32) * 0.1)
for form in ("angle", "phasor_fused"):

    def leg_loss(a, _form=form):
        out = S.pitch_shift(
            a, 2.0, 44100, synthesis_method="matmul_bf16",
            pv_formulation=_form,
        )
        return jnp.sum(out**2)

    # default sync: the scalar reduction happens INSIDE the jitted step.
    # A custom eager-slice sync measured 13 s/iter — eager ops on the
    # tunneled device cost seconds and must never sit on the timed path.
    t = device_time_queued(jax.grad(leg_loss), audio, iters=5)
    print(f"pitch leg fwd+bwd {form:13s}: {t*1e3:7.2f} ms", flush=True)
print("DONE", flush=True)
