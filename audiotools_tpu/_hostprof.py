"""Lightweight host-pipeline cost accounting.

The reference treats dataloader cost as a first-class profiled quantity
(`/root/reference/tests/profilers/profile_load.py:62-103`: file decode
backends and salient-excerpt cost are measured explicitly). This module
gives the TPU build the same visibility with near-zero overhead: hot
host-path functions (file decode, the salient-excerpt meter, resample,
transform instantiation, collate, device staging) wrap themselves in
:func:`span`, which is a no-op until :func:`enable` is called.

Accounting is *exclusive* (self-time): nested spans subtract their
duration from the enclosing span, so ``instantiate`` reports parameter
drawing only, not the nested background-noise decode it triggers — the
fractions sum to the true wall clock instead of double-counting.

Used by ``bench.py`` to commit a per-phase breakdown of
``pipeline_items_per_sec`` (decode / salient_meter / resample /
instantiate / collate / device_put) into ``BENCH_r*.json``.
"""
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

__all__ = ["enable", "disable", "reset", "totals", "span"]

_enabled = False
_lock = threading.Lock()
_totals: "defaultdict[str, float]" = defaultdict(float)
_local = threading.local()


def enable():
    """Start accumulating span timings (all threads)."""
    global _enabled
    _enabled = True


def disable():
    global _enabled
    _enabled = False


def reset():
    with _lock:
        _totals.clear()


def totals() -> dict:
    """Accumulated exclusive seconds per span name."""
    with _lock:
        return dict(_totals)


@contextmanager
def span(name: str):
    """Time a host-pipeline phase. No-op (one global read) when disabled."""
    if not _enabled:
        yield
        return
    stack = getattr(_local, "stack", None)
    if stack is None:
        stack = _local.stack = []
    entry = [time.perf_counter(), 0.0]  # start, accumulated child time
    stack.append(entry)
    try:
        yield
    finally:
        dt = time.perf_counter() - entry[0]
        stack.pop()
        if stack:
            stack[-1][1] += dt  # credit the parent with our full duration
        with _lock:
            _totals[name] += dt - entry[1]  # record exclusive self-time
