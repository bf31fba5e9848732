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


# module-level factory (a lambda default would make history unpicklable)
def default_list():
    return []


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
    """Running mean of finite values (reference decorators.py:30-46)."""

    def __init__(self):
        self.reset()

    def __call__(self):
        mean = self.total / max(self.count, 1)
        return mean

    def reset(self):
        self.count = 0
        self.total = 0

    def update(self, val):
        if math.isfinite(val):
            self.count += 1
            self.total += val


def when(condition):
    """Run the decorated function only when ``condition()`` is true
    (reference decorators.py:53-88).

    >>> @when(lambda: step % 100 == 0 and rank == 0)
    >>> def checkpoint(): ...
    """

    def decorator(fn):
        @wraps(fn)
        def decorated(*args, **kwargs):
            if condition():
                return fn(*args, **kwargs)

        return decorated

    return decorator


def timer(prefix: str = "time"):
    """Add wall-clock time of the decorated function to its output dict
    under ``[prefix]/[fn_name]`` (reference decorators.py:91-115)."""

    def decorator(fn):
        @wraps(fn)
        def decorated(*args, **kwargs):
            s = time.perf_counter()
            output = fn(*args, **kwargs)
            assert isinstance(output, dict)
            e = time.perf_counter()
            output[f"{prefix}/{fn.__name__}"] = e - s
            return output

        return decorated

    return decorator


class Tracker:
    """Training progress/metric tracker with rich live display, optional
    log file, and tensorboard scalars (reference decorators.py:118-440)."""

    def __init__(
        self,
        writer=None,
        log_file: str = None,
        rank: int = 0,
        console_width: int = 100,
        step: int = 0,
    ):
        self.metrics = {}
        self.history = {}
        self.writer = writer
        self.rank = rank
        self.step = step

        self.tasks = {}
        self.pbar = Progress(
            SpinnerColumn(),
            "[progress.description]{task.description}",
            BarColumn(),
            "[progress.percentage]{task.percentage:>3.0f}%",
            "({task.completed} of {task.total})",
            TimeElapsedColumn(),
            TimeRemainingColumn(),
        )
        self.consoles = [Console(width=console_width)]
        self.live = Live(console=self.consoles[0], refresh_per_second=10)
        if log_file is not None:
            self.consoles.append(Console(width=console_width, file=open(log_file, "a")))

    def print(self, msg):
        """Print to the terminal and the log file, on rank 0 only."""
        if self.rank != 0:
            return
        for console in self.consoles:
            console.log(msg)

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

        self.tasks[label] = {
            "pbar": self.pbar.add_task(
                f"[white]Iteration ({label})", total=length, completed=completed
            ),
            "table": Table(),
        }
        self.metrics[label] = {
            "value": defaultdict(),
            "mean": defaultdict(lambda: Mean()),
        }

        def decorator(fn):
            @wraps(fn)
            def decorated(*args, **kwargs):
                output = fn(*args, **kwargs)
                if not isinstance(output, dict):
                    self.update(label, fn.__name__)
                    return output

                scalars = {}
                for k, v in output.items():
                    s = _to_scalar(v)
                    if s is not None:
                        scalars[k] = s

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

    def log(self, label: str, value_type: str = "value", history: bool = True):
        """Decorator writing tracked metrics to tensorboard + history
        after the function runs (reference decorators.py:354-393)."""
        assert value_type in ["mean", "value"]
        if history:
            if label not in self.history:
                self.history[label] = defaultdict(default_list)

        def decorator(fn):
            @wraps(fn)
            def decorated(*args, **kwargs):
                output = fn(*args, **kwargs)
                if self.rank == 0:
                    nonlocal value_type, label
                    metrics = self.metrics[label][value_type]
                    for k, v in metrics.items():
                        v = v() if isinstance(v, Mean) else v
                        if self.writer is not None:
                            self.writer.add_scalar(f"{k}/{label}", v, self.step)
                        if label in self.history:
                            self.history[label][k].append(v)

                    if label in self.history:
                        self.history[label]["step"].append(self.step)

                return output

            return decorated

        return decorator

    def is_best(self, label, key):
        """Whether the latest value of ``key`` is the minimum so far
        (reference decorators.py:395-411)."""
        return self.history[label][key][-1] == min(self.history[label][key])

    def state_dict(self):
        """Checkpointable state (reference decorators.py:413-422)."""
        return {"history": self.history, "step": self.step}

    def load_state_dict(self, state_dict):
        """Restore from ``state_dict`` (reference decorators.py:424-440)."""
        self.history = state_dict["history"]
        self.step = state_dict["step"]
        return self
