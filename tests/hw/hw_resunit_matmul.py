"""Probe: reformulate the DAC ResidualUnit's convs as shifted matmuls.

hw_dac_resunit/hw_dac_blocks measured the C=64 encoder stage at 8-12
TFLOP/s while the same k7 conv alone hits 60 — the composition loses to
layout flips between VPU snakes and XLA's conv lowering. Hypothesis: a
conv expressed as 7 statically-shifted (T, 64) @ (64, 64) matmuls + the
k=1 conv as one matmul gives XLA a pure elementwise+dot graph it can
fuse end-to-end (snake into dot operands), with autodiff giving the
backward for free — no custom VJP, unlike a Pallas fused kernel.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_resunit_matmul.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn
import jax.numpy as jnp

from audiotools_tpu.models.dac import ResidualUnit, snake
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

B, T, C = 16, 16896, 64
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T, C).astype(np.float32) * 0.1)


def ms(fn, arg, iters=5):
    return device_time(fn, arg, iters=iters) * 1e3


units = {}
for d in (1, 3, 9):
    u = ResidualUnit(C, d)
    units[d] = (u, jax.jit(u.init)(jax.random.PRNGKey(d), x))


def chain_conv(a):
    for d in (1, 3, 9):
        u, p = units[d]
        a = u.apply(p, a)
    return a


# --- matmul formulation using the SAME parameters --------------------------


def conv7_mm(y, kernel, bias, dilation):
    # kernel (7, C_in, C_out), SAME padding at odd k: pad 3*dilation
    pad = 3 * dilation
    yp = jnp.pad(y, ((0, 0), (pad, pad), (0, 0)))
    acc = bias
    Tn = y.shape[1]
    for k in range(7):
        acc = acc + jnp.einsum(
            "btc,cf->btf", jax.lax.dynamic_slice_in_dim(yp, k * dilation, Tn, 1),
            kernel[k],
        )
    return acc


def unit_mm(a, p, dilation):
    pr = p["params"]
    a1 = pr["Snake_0"]["alpha"]
    a2 = pr["Snake_1"]["alpha"]
    y = snake(a, a1)
    y = conv7_mm(y, pr["Conv_0"]["kernel"], pr["Conv_0"]["bias"], dilation)
    y = snake(y, a2)
    y = jnp.einsum("btc,cf->btf", y, pr["Conv_1"]["kernel"][0]) + pr["Conv_1"]["bias"]
    return a + y


def chain_mm(a):
    for d in (1, 3, 9):
        _, p = units[d]
        a = unit_mm(a, p, d)
    return a


# numerics check
ref = np.asarray(jax.jit(chain_conv)(x))
got = np.asarray(jax.jit(chain_mm)(x))
err = np.abs(ref - got).max() / np.abs(ref).max()
print(f"matmul-vs-conv rel err: {err:.2e}", flush=True)

print(f"3 units conv fwd:   {ms(chain_conv, x):.3f} ms", flush=True)
print(f"3 units matmul fwd: {ms(chain_mm, x):.3f} ms", flush=True)


def grad_conv(a):
    g = jax.grad(lambda z: jnp.sum(chain_conv(z) ** 2))(a)
    return g


def grad_mm(a):
    g = jax.grad(lambda z: jnp.sum(chain_mm(z) ** 2))(a)
    return g


print(f"3 units conv fwd+bwd:   {ms(grad_conv, x):.3f} ms", flush=True)
print(f"3 units matmul fwd+bwd: {ms(grad_mm, x):.3f} ms", flush=True)

print("DONE", flush=True)

# RESULT (v5e, 2026-08-18): matmul-vs-conv rel err 1.44e-04. 3 units
# (C=64, T=16896) fwd: conv 5.90 ms / matmul 8.43 (conv wins forward);
# fwd+bwd: conv 12.82 / matmul 11.29 (matmul wins 12% under grad — the
# autodiff backward is plain matmul transposes, XLA's conv-transpose
# gradient is the expensive part). Full-step consequences in
# hw_resunit_step.py: forced everywhere it LOSES (wide stages), gated to
# C<=64 ("hybrid") it wins ~3%.
