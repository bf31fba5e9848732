"""Profiling utilities (SURVEY.md §5.1).

The reference's observability is a wall-clock ``timer()`` decorator plus
manual profiler scripts (reference ml/decorators.py:91-115,
tests/profilers/). Here the same surface plus real device tracing:
``trace`` captures an XLA/TPU profile viewable in TensorBoard or Perfetto,
and ``annotate`` adds named regions to the trace.
"""
import contextlib

from .decorators import timer  # re-export: same decorator surface

__all__ = ["timer", "trace", "annotate"]


@contextlib.contextmanager
def trace(log_dir: str, host_tracer_level: int = 2):
    """Capture a jax.profiler trace of the enclosed block.

    >>> with profiling.trace("runs/exp/profile"):
    ...     step(params, batch)
    View with: tensorboard --logdir runs/exp/profile  (or Perfetto)
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (context manager / decorator)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
