"""Training-loop decorators: Tracker, when, timer (mirror of
`/root/reference/audiotools/ml/decorators.py`).

The reference's cross-rank ``dist.all_reduce(AVG)`` of metrics
(decorators.py:325-337) has no place in SPMD jax — metrics come out of the
jitted step already globally reduced (or are reduced with
``multihost_utils`` when running multi-process); the Tracker just consumes
scalars.
"""
import math
import os
import time
from collections import defaultdict
from functools import wraps

import numpy as np
from rich import box
from rich.console import Console, Group
from rich.live import Live
from rich.markdown import Markdown
from rich.panel import Panel
from rich.progress import (
    BarColumn,
    Progress,
    SpinnerColumn,
    TimeElapsedColumn,
    TimeRemainingColumn,
)
from rich.rule import Rule
from rich.table import Table


def _to_scalar(v):
    """Convert jnp/np scalars to python floats; return None otherwise."""
    try:
        import jax.numpy as jnp

        if isinstance(v, (int, float)):
            return float(v)
        if isinstance(v, (np.ndarray, jnp.ndarray)) and np.size(v) == 1:
            return float(np.asarray(v).reshape(()))
    except Exception:
        pass
    return None


class Mean:
    """Streaming average over finite samples (behaves like reference
    decorators.py:30-46): non-finite updates are dropped, an empty
    accumulator reads 0."""

    __slots__ = ("total", "count")

    def __init__(self):
        self.total = 0.0
        self.count = 0

    def update(self, val):
        if not math.isfinite(val):
            return
        self.total += val
        self.count += 1

    def reset(self):
        self.total = 0.0
        self.count = 0

    def __call__(self):
        return self.total / self.count if self.count else 0.0


def when(condition):
    """Gate the decorated function on ``condition()`` (parity with
    reference decorators.py:53-88); when false, the call is a no-op
    returning None.

    >>> @when(lambda: step % 100 == 0 and rank == 0)
    >>> def checkpoint(): ...
    """

    def decorator(fn):
        @wraps(fn)
        def gated(*args, **kwargs):
            return fn(*args, **kwargs) if condition() else None

        return gated

    return decorator


def timer(prefix: str = "time"):
    """Stamp the decorated function's wall-clock duration into the dict
    it returns, keyed ``[prefix]/[fn_name]`` (parity with reference
    decorators.py:91-115)."""

    def decorator(fn):
        key = f"{prefix}/{fn.__name__}"

        @wraps(fn)
        def timed(*args, **kwargs):
            start = time.perf_counter()
            output = fn(*args, **kwargs)
            if not isinstance(output, dict):
                raise TypeError(
                    f"@timer() needs {fn.__name__} to return a dict, "
                    f"got {type(output).__name__}"
                )
            output[key] = time.perf_counter() - start
            return output

        return timed

    return decorator


class Tracker:
    """Training progress/metric tracker with rich live display, optional
    log file, and tensorboard scalars (reference decorators.py:118-440)."""

    def __init__(
        self, writer=None, log_file: str = None, rank: int = 0,
        console_width: int = 100, step: int = 0,
    ):
        self.writer = writer
        self.rank = rank
        self.step = step
        self.metrics = {}
        self.history = {}
        self.tasks = {}
        self.pbar = self._build_progress_bar()
        self.consoles = [Console(width=console_width)]
        self.live = Live(console=self.consoles[0], refresh_per_second=10)
        self._log_handle = None
        if log_file is not None:
            self._log_handle = open(log_file, "a")
            self.consoles.append(
                Console(width=console_width, file=self._log_handle)
            )

    @staticmethod
    def _build_progress_bar() -> Progress:
        columns = [
            SpinnerColumn(),
            "[progress.description]{task.description}",
            BarColumn(),
            "[progress.percentage]{task.percentage:>3.0f}%",
            "({task.completed} of {task.total})",
            TimeElapsedColumn(),
            TimeRemainingColumn(),
        ]
        return Progress(*columns)

    def close(self):
        """Flush and close the log-file console (idempotent). ``Tracker``
        is also a context manager: ``with Tracker(log_file=...) as t: ...``
        closes on exit."""
        if self._log_handle is not None and not self._log_handle.closed:
            self._log_handle.flush()
            self._log_handle.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def print(self, msg):
        """Print to the terminal and the log file, on rank 0 only."""
        if self.rank != 0:
            return
        for console in self.consoles:
            console.log(msg)
        if self._log_handle is not None and not self._log_handle.closed:
            self._log_handle.flush()

    def _metrics_table(self, label: str) -> Table:
        """Render one label's latest scalars and their running means."""
        table = Table(title=f"[b]{label}[/b]", expand=True, box=box.SIMPLE_HEAD)
        table.add_column("metric", style="bold cyan", ratio=2)
        table.add_column("last", justify="right", style="magenta")
        table.add_column("running mean", justify="right", style="green")
        scalars = self.metrics[label]
        for name, latest in scalars["value"].items():
            running = scalars["mean"][name]()
            table.add_row(name, f"{latest:10.6f}", f"{running:10.6f}")
        return table

    def _dashboard(self, heading=None):
        """All labels' tables stacked over the progress bars, framed."""
        tables = [task["table"] for task in self.tasks.values()]
        body = Panel(
            Group(*tables, self.pbar),
            padding=(0, 2),
            title="[b]audiotools_tpu",
            subtitle=f"step {self.step}",
            border_style="bright_black",
        )
        parts = [] if heading is None else [heading]
        return Group(*parts, body)

    def update(self, label, fn_name):
        """Advance ``label``'s bar and redraw the live dashboard."""
        if self.rank != 0:
            return
        self.pbar.advance(self.tasks[label]["pbar"])
        self.tasks[label]["table"] = self._metrics_table(label)
        heading = Rule(f"[italic]{fn_name}()", style="bright_black")
        self.live.update(self._dashboard(heading))

    def done(self, label: str, title: str):
        """Close out an epoch: log the summary, then zero the running means
        and rewind ``label``'s progress bar for the next pass."""
        if self.rank == 0:
            summary = Group(
                Markdown(f"# {title}"),
                *[task["table"] for task in self.tasks.values()],
                self.pbar,
            )
            self.print(summary)
            self.pbar.reset(self.tasks[label]["pbar"])

        for scalars in self.metrics.values():
            for mean in scalars["mean"].values():
                mean.reset()

    def track(
        self,
        label: str,
        length: int,
        completed: int = 0,
        multihost_average: bool = None,
    ):
        """Decorator collecting the scalar dict returned by the function
        into running means + progress display (reference
        decorators.py:283-352).

        ``multihost_average=True`` averages scalars across jax processes
        (the SPMD analog of the reference's DDP all_reduce); it defaults to
        on when more than one process is running.
        """
        import jax

        if multihost_average is None:
            multihost_average = jax.process_count() > 1

        self._register_task(label, length, completed)

        def decorator(fn):
            @wraps(fn)
            def decorated(*args, **kwargs):
                output = fn(*args, **kwargs)
                if not isinstance(output, dict):
                    self.update(label, fn.__name__)
                    return output

                scalars = {
                    k: s for k, s in
                    ((k, _to_scalar(v)) for k, v in output.items())
                    if s is not None
                }

                if multihost_average and scalars:  # pragma: no cover
                    from jax.experimental import multihost_utils

                    keys = sorted(scalars)
                    vals = np.array([scalars[k] for k in keys])
                    vals = multihost_utils.process_allgather(vals).mean(axis=0)
                    scalars = dict(zip(keys, vals.tolist()))

                for k, v in scalars.items():
                    output[k] = v
                    self.metrics[label]["value"][k] = v
                    self.metrics[label]["mean"][k].update(v)

                self.update(label, fn.__name__)
                return output

            return decorated

        return decorator

    def _register_task(self, label: str, length: int, completed: int):
        """Create the progress-bar row and metric accumulators for a
        tracked label."""
        bar_id = self.pbar.add_task(
            f"[white]Iteration ({label})", total=length, completed=completed
        )
        self.tasks[label] = {"pbar": bar_id, "table": Table()}
        self.metrics[label] = {
            "value": defaultdict(),
            "mean": defaultdict(Mean),
        }

    def _publish(self, label: str, value_type: str):
        """Resolve ``label``'s current scalars (running means collapse to
        their value) and fan them out to tensorboard and the history."""
        if self.rank != 0:
            return
        snapshot = {
            name: (entry() if isinstance(entry, Mean) else entry)
            for name, entry in self.metrics[label][value_type].items()
        }
        if self.writer is not None:
            for name, val in snapshot.items():
                self.writer.add_scalar(f"{name}/{label}", val, self.step)
        series = self.history.get(label)
        if series is None:
            return
        for name, val in snapshot.items():
            series[name].append(val)
        series["step"].append(self.step)

    def log(self, label: str, value_type: str = "value", history: bool = True):
        """Decorator publishing ``label``'s tracked metrics (tensorboard +
        history) each time the function returns (parity surface with
        reference decorators.py:354-393)."""
        if value_type not in ("mean", "value"):
            raise ValueError(f"value_type must be 'mean' or 'value', got {value_type!r}")
        if history:
            self.history.setdefault(label, defaultdict(list))

        def decorator(fn):
            @wraps(fn)
            def logged(*args, **kwargs):
                output = fn(*args, **kwargs)
                self._publish(label, value_type)
                return output

            return logged

        return decorator

    def is_best(self, label, key):
        """Whether ``key``'s latest logged value is its minimum so far
        (parity with reference decorators.py:395-411)."""
        series = self.history[label][key]
        return series[-1] <= min(series)

    def state_dict(self):
        """Checkpointable state (parity with reference decorators.py:413-422)."""
        return {"history": self.history, "step": self.step}

    def load_state_dict(self, state_dict):
        """Restore from ``state_dict``; returns self for chaining (parity
        with reference decorators.py:424-440)."""
        self.history = state_dict["history"]
        self.step = state_dict["step"]
        return self
