"""Decompose the fused-PV custom-VJP backward into its legs on v5e.

The first hardware cut of the backward (jax.vjp(prep) + flip-reverse
cumsums) measured 28.5 ms fwd+bwd vs the angle path's 13.5 — this probe
times each leg in isolation to target the fix:
  A  full fwd+bwd of the fused path (reference point)
  B  prep forward alone (gathers + normalization)
  C  prep fwd+bwd via jax.vjp (XLA scatter-add transpose of the gathers)
  D  rotation_cumprod kernel alone
  E  flip-cumsum-flip vs lax.cumsum(reverse=True) on one (B,F,n) plane
  F  scatter-add transpose: one-hot (n->T) MXU matmul vs XLA .at[].add

All companion tensors (imag plane, cotangents) are built IN-GRAPH from
the single timed argument — closed-over device arrays of this size
inline as literals and blow the tunnel's remote-compile upload cap
(HTTP 413, ops/benchmark.py docstring).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 2400 python tests/hw/hw_pv_bwd_parts.py

RESULT (v5e via axon tunnel, 2026-08-20, backward cut 1 as reference):
    A full fwd+bwd      :   23.37 ms  (iota cotangents; cut 1 backward)
    B prep fwd          :    2.31 ms
    C prep fwd+bwd vjp  :    4.97 ms  (XLA's static-index gather
                                       transpose is CHEAP — see F)
    D rotation_cumprod  :    7.48 ms  (prep+scan 9.97 - prep 2.50: the
                                       re-scan + (n,rows) relayouts were
                                       the backward's dominant leg)
    E flip-cumsum-flip  :    3.17 ms
    E lax reverse cumsum:    2.26 ms  (1.4x: kills the flip copies)
    F one-hot scatter mm:    0.61 ms
    F xla scatter-add   :    0.80 ms  (static indices lower fine; the
                                       CLAUDE.md scatter rule is about
                                       TRACED indices)
Actions taken from this data (stretch._fused_pv_diff cut 2): P emitted
as a forward residual (with_phasor=True) killing leg D, one stacked
lax.cumsum(reverse=True) replacing the two flip-cumsums. Measured
effect: fwd+bwd 28.50 -> 26.11 ms (hw_pv_fused_grad.py). The remaining
gap to the angle path's 13.56 is distributed across relayouts and the
prep re-derivation, with no single >5 ms leg left — further fusion
would need a one-kernel backward (projected ~13-14 ms, a tie with
angle at high implementation risk), recorded as NOT TAKEN.
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

from audiotools_tpu.ops import pallas_kernels as pk
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, F_bins, T = 64, 1025, 384
rate = 2.0 ** (-2.0 / 12.0)
i0, i1, frac = S._pv_indices(T, rate)
n = len(i0)
rng = np.random.RandomState(0)
zr = jnp.asarray(rng.randn(B, F_bins, T).astype(np.float32))
gr_host = jnp.asarray(rng.randn(B, F_bins, n).astype(np.float32))


def _zi(r):
    # deterministic in-graph companion for the imaginary plane
    return jnp.roll(r, 1, axis=-1) * 0.7


def _cots(r):
    # in-graph pseudo-cotangents (iota-based, no big literals)
    io = jax.lax.broadcasted_iota(jnp.float32, (B, F_bins, n), 2)
    return jnp.sin(io * 0.37), jnp.cos(io * 0.53)


def prep(r, i):
    return S._pv_phasor_prep(jax.lax.complex(r, i), i0, i1, frac)


# A: full fused fwd+bwd
f = S._fused_pv_diff(i0.tobytes(), i1.tobytes(), frac.tobytes(), False)


def full(r):
    gr, gi = _cots(r)

    def loss(rr):
        or_, oi = f(rr, _zi(rr))
        return jnp.sum(or_ * gr) + jnp.sum(oi * gi)

    return jax.grad(loss)(r)


print(f"A full fwd+bwd      : {device_time(full, zr, iters=5)*1e3:7.2f} ms", flush=True)


# B: prep forward alone
def prep_fwd(r):
    mag, ur, ui, cr, ci = prep(r, _zi(r))
    return mag + ur + ui


print(f"B prep fwd          : {device_time(prep_fwd, zr, iters=5)*1e3:7.2f} ms", flush=True)


# C: prep fwd+bwd via jax.vjp (the scatter-add transpose)
def prep_grad(r):
    gr, gi = _cots(r)

    def loss(rr):
        mag, ur, ui, cr, ci = prep(rr, _zi(rr))
        return (
            jnp.sum(mag * gr) + jnp.sum(ur * gi) + jnp.sum(ui * gr)
            + jnp.sum(cr) + jnp.sum(ci)
        )

    return jax.grad(loss)(r)


print(f"C prep fwd+bwd vjp  : {device_time(prep_grad, zr, iters=5)*1e3:7.2f} ms", flush=True)


# D: rotation scan kernel alone (unit-phasor inputs built in-graph)
def rot(r):
    mag, ur, ui, cr, ci = prep(r, _zi(r))
    pr, pi = pk.rotation_cumprod(ur, ui, cr, ci)
    return pr + pi - ur - ui  # subtract prep outputs to isolate deltas


def prep_only(r):
    mag, ur, ui, cr, ci = prep(r, _zi(r))
    return ur + ui


t_rot = device_time(rot, zr, iters=5)
t_prep_only = device_time(prep_only, zr, iters=5)
print(
    f"D rotation_cumprod  : {(t_rot - t_prep_only)*1e3:7.2f} ms "
    f"(prep+scan {t_rot*1e3:.2f} - prep {t_prep_only*1e3:.2f})",
    flush=True,
)


# E: reverse cumsum evaluations on one (B,F,n) plane
def csum_flip(x):
    return jnp.cumsum(x[..., ::-1], axis=-1)[..., ::-1]


def csum_lax(x):
    return jax.lax.cumsum(x, axis=2, reverse=True)


print(f"E flip-cumsum-flip  : {device_time(csum_flip, gr_host, iters=10)*1e3:7.2f} ms", flush=True)
print(f"E lax reverse cumsum: {device_time(csum_lax, gr_host, iters=10)*1e3:7.2f} ms", flush=True)

# F: scatter-add transpose as one-hot matmul (n -> T) vs XLA scatter
S0 = np.zeros((n, T), np.float32)
S0[np.arange(n), i0] = 1.0
S0d = jnp.asarray(S0)  # small (n x T): safe to close over


def onehot_scatter(c):
    return jnp.einsum("bfn,nt->bft", c, S0d)


print(f"F one-hot scatter mm: {device_time(onehot_scatter, gr_host, iters=10)*1e3:7.2f} ms", flush=True)


def xla_scatter(c):
    return jnp.zeros((B, F_bins, T), jnp.float32).at[..., i0].add(c)


print(f"F xla scatter-add   : {device_time(xla_scatter, gr_host, iters=10)*1e3:7.2f} ms", flush=True)
print("DONE", flush=True)
