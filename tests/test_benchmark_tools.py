"""Unit tests for the timing/profiling tooling (ops/benchmark.py,
ml/profiling.py) — they normally run only on hardware, but the
calibrated-loop math and profiler plumbing are backend-agnostic."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def test_device_time_two_point_calibration():
    """The two-point loop cancels fixed overhead: timing a cheap op
    returns a positive sub-millisecond per-iter figure, and the chained
    carry forces every iteration to actually run (a fori_loop of n
    no-ops would time ~0)."""
    from audiotools_tpu.ops.benchmark import device_time

    x = jnp.asarray(np.random.RandomState(0).randn(64, 512).astype(np.float32))
    t = device_time(lambda a: jnp.tanh(a) @ a.T, x, iters=20)
    assert 1e-9 <= t < 0.05


def test_device_time_consumes_pytree_outputs():
    """Multi-leaf outputs (the train-step usage: loss + updated params)
    all feed the carry perturbation, so none can be dead-code-eliminated."""
    from audiotools_tpu.ops.benchmark import device_time

    x = jnp.ones((32, 32))
    t = device_time(lambda a: (jnp.sum(a), a * 2.0, {"k": a + 1.0}), x, iters=10)
    assert t >= 1e-9


def test_profiling_trace_writes_artifacts(tmp_path):
    from audiotools_tpu.ml import profiling

    logdir = tmp_path / "prof"
    with profiling.trace(str(logdir)):
        jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128))).block_until_ready()
    produced = list(logdir.rglob("*"))
    assert produced, "jax.profiler wrote nothing"


def test_profiling_annotate_runs():
    from audiotools_tpu.ml import profiling

    with profiling.annotate("test-region"):
        out = float(jnp.sum(jnp.arange(16)))
    assert out == 120.0


def test_device_time_queued_matches_loop_method():
    """The queued two-point method (for programs whose looped HLO
    exceeds the tunnel's upload cap) must agree with the fori_loop
    method within noise on a compute-bound op."""
    from audiotools_tpu.ops.benchmark import device_time, device_time_queued

    x = jnp.asarray(
        np.random.RandomState(1).randn(256, 256).astype(np.float32)
    )

    def op(a):
        for _ in range(8):
            a = jnp.tanh(a @ a.T) * 0.1
        return a

    t_loop = device_time(op, x, iters=20)
    t_q = device_time_queued(op, x, iters=20)
    assert t_q > 0
    # generous envelope: queued includes ~us-scale dispatch per call
    assert t_q < t_loop * 5 + 5e-3
    assert t_loop < t_q * 5 + 5e-3


def test_device_time_stats_median_and_spread():
    from audiotools_tpu.ops.benchmark import device_time_stats

    st = device_time_stats(
        lambda a: jnp.sum(a**2, keepdims=True) + a, jnp.ones((64,)),
        iters=3, repeats=3,
    )
    assert st["min"] <= st["seconds"] <= st["max"]
    assert st["spread"] >= 0.0
    assert st["seconds"] >= 1e-9


def test_device_time_queued_default_and_custom_sync():
    from audiotools_tpu.ops.benchmark import device_time_queued

    # default sync: every leaf summed in-program
    t = device_time_queued(
        lambda a: (a * 2.0, {"x": a + 1.0}), jnp.ones((32,)), iters=2
    )
    assert t >= 1e-9
    # custom sync: extractor maps the output to the fenced scalar
    t2 = device_time_queued(
        lambda a: {"loss": jnp.sum(a), "aux": a},
        jnp.ones((32,)),
        iters=2,
        sync=lambda out: out["loss"],
    )
    assert t2 >= 1e-9


def test_perf_stage_roofline_row():
    from audiotools_tpu.ops import perf

    row = perf.stage_roofline(
        "toy", lambda a: jnp.sum(a * a) + a, jnp.ones((256,)), iters=2
    )
    assert row["stage"] == "toy"
    assert row["ms"] > 0
    # CPU backend exposes cost analysis: bytes/flops fields populate
    assert set(row) == {
        "stage", "ms", "gbytes", "hbm_frac", "gflops", "mfu_xla"
    }
