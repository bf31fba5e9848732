"""Accurate on-device timing utilities.

Through remote/tunneled device transports, ``jax.block_until_ready`` and
small host fetches can measure dispatch or link latency instead of device
compute. ``device_time`` sidesteps both: it chains ``iters`` evaluations
of the op inside one jitted ``fori_loop`` (a data dependency forces serial
execution on device) and syncs once on a scalar, so per-iteration cost is
pure device time.
"""
import time

import jax
import jax.numpy as jnp

__all__ = ["device_time"]


def device_time(fn, arg, iters: int = 10, warmup: bool = True) -> float:
    """Average seconds per evaluation of ``fn(arg)`` on device.

    ``fn`` must accept and be perturbable by one array argument (the
    chaining adds ``1e-12 * sum(output)`` to it between iterations).
    """

    @jax.jit
    def loop(a):
        def body(i, carry):
            out = fn(carry)
            leaves = jax.tree_util.tree_leaves(out)
            bump = sum(jnp.sum(jnp.real(l)).astype(jnp.float32) for l in leaves)
            return carry + (1e-12 * bump).astype(carry.dtype)

        # sync on a REAL scalar: complex transfers are unimplemented over
        # tunneled device transports
        return jnp.real(jax.lax.fori_loop(0, iters, body, a)).sum()

    if warmup:
        float(loop(arg))
    t0 = time.perf_counter()
    float(loop(arg))
    t1 = time.perf_counter()
    return (t1 - t0) / iters
