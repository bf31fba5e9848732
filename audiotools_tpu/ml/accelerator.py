"""SPMD accelerator: the TPU-native replacement for the reference's
DDP/DataParallel ``Accelerator`` (`/root/reference/audiotools/ml/accelerator.py`).

Instead of process-per-GPU NCCL (reference accelerator.py:42-48), training
runs as a single SPMD program over a ``jax.sharding.Mesh``: batches are
sharded along the data axis, parameters are replicated (or sharded by
user-provided rules), and XLA inserts the gradient ``psum`` over ICI/DCN
automatically when a jitted step consumes sharded inputs and replicated
parameters. Multi-host launch uses ``jax.distributed`` + per-process data
sharding (``prepare_dataloader``).

Mixed precision: TPUs train in bfloat16 without loss scaling, so
``autocast``/``backward``/``step``/``update`` keep the reference API shape
while ``amp=True`` simply casts compute inputs to bf16
(``cast_for_compute``).
"""
import contextlib
import typing

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.datasets import ResumableDistributedSampler, ResumableSequentialSampler
from ..data.loader import DataLoader


class Accelerator:
    """Prepares models, batches and dataloaders for SPMD execution over a
    device mesh.

    Parameters
    ----------
    amp : bool, optional
        Enable bfloat16 compute casting, by default False.
    mesh : jax.sharding.Mesh, optional
        An existing mesh to use. Defaults to a 1-D data-parallel mesh over
        all local devices (the TPU analog of the reference's DP/DDP-only
        world, SURVEY.md §2).
    data_axis : str, optional
        Mesh axis to shard batches along, by default "dp".
    """

    def __init__(self, amp: bool = False, mesh: Mesh = None, data_axis: str = "dp"):
        if mesh is None:
            devices = np.array(jax.devices())
            mesh = Mesh(devices, (data_axis,))
        self.mesh = mesh
        self.data_axis = data_axis
        self.amp = amp

        self.world_size = mesh.size
        self.local_rank = jax.process_index()
        self.num_processes = jax.process_count()

        self.replicated = NamedSharding(mesh, P())
        self.data_sharded = NamedSharding(mesh, P(data_axis))

        class DummyScaler:
            """bf16 on TPU needs no loss scaling; kept for API parity
            (reference accelerator.py:53-69)."""

            def step(self, optimizer_step, *args, **kwargs):
                return optimizer_step(*args, **kwargs)

            def scale(self, loss):
                return loss

            def unscale_(self, optimizer):
                return optimizer

            def update(self):
                pass

        self.scaler = DummyScaler()

    def __enter__(self):
        self._mesh_ctx = self.mesh
        self._mesh_ctx.__enter__()
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self._mesh_ctx.__exit__(exc_type, exc_value, traceback)

    # ------------------------------------------------------------------
    # placement
    # ------------------------------------------------------------------

    def prepare_model(self, params, rules: dict = None):
        """Place a parameter pytree on the mesh.

        By default parameters are replicated across the data axis (the
        SPMD analog of DDP's per-rank weight copies, reference
        accelerator.py:83-105). ``rules`` may map pytree path substrings
        to ``PartitionSpec``s for model-parallel layouts.
        """
        if rules is None:
            return jax.device_put(params, self.replicated)

        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        treedef = jax.tree_util.tree_structure(params)
        leaves = []
        for path, leaf in flat:
            name = jax.tree_util.keystr(path)
            spec = P()
            for pattern, s in rules.items():
                if pattern in name:
                    spec = s
                    break
            leaves.append(jax.device_put(leaf, NamedSharding(self.mesh, spec)))
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def prepare_batch(self, batch, device=None):
        """Shard a host batch along the data axis and move to device
        (the host->HBM boundary; replaces reference util.prepare_batch's
        ``.to(device)``)."""
        from ..core.util import prepare_batch as _prepare

        return _prepare(batch, device=device or self.data_sharded)

    def shard(self, tree):
        """Constrain a pytree's leading axis onto the data axis."""
        return jax.lax.with_sharding_constraint(
            tree, self.data_sharded
        )

    def jit_step(self, fn, donate_argnums=(), **jit_kwargs):
        """Jit a training step under this accelerator's mesh."""
        return jax.jit(fn, donate_argnums=donate_argnums, **jit_kwargs)

    # ------------------------------------------------------------------
    # mixed precision (API parity with reference accelerator.py:107-138)
    # ------------------------------------------------------------------

    def autocast(self, *args, **kwargs):
        """Context manager for mixed precision. On TPU this sets the
        default matmul precision; cast inputs with ``cast_for_compute``."""
        if self.amp:
            return jax.default_matmul_precision("bfloat16")
        return contextlib.nullcontext()

    def cast_for_compute(self, tree):
        """Cast floating leaves to bfloat16 when amp is enabled."""
        if not self.amp:
            return tree

        def cast(x):
            if isinstance(x, jnp.ndarray) and jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(jnp.bfloat16)
            return x

        return jax.tree_util.tree_map(cast, tree)

    def backward(self, loss):
        """No-op gradient hook for API parity: in JAX, gradients come from
        ``jax.grad`` inside the jitted step."""
        return self.scaler.scale(loss)

    def step(self, optimizer_step, *args, **kwargs):
        """Run an optimizer step (callable) through the scaler."""
        return self.scaler.step(optimizer_step, *args, **kwargs)

    def update(self):
        self.scaler.update()

    # ------------------------------------------------------------------
    # data
    # ------------------------------------------------------------------

    def prepare_dataloader(
        self, dataset: typing.Iterable, start_idx: int = None, **kwargs
    ):
        """Build a DataLoader with per-process sharded, resumable sampling
        (reference accelerator.py:140-174). Batch size and workers are
        divided by the process count (per-host batch = global / hosts).
        Loader kwargs pass through — notably ``to_device=True`` with
        ``device=<NamedSharding>`` and ``wire_dtype="int16"`` stage each
        batch onto the mesh from the producer thread (half the wire
        bytes; dequantize in-step with ``signal.dequantize_wire()``)."""
        if self.num_processes > 1:
            sampler = ResumableDistributedSampler(
                dataset,
                start_idx,
                num_replicas=self.num_processes,
                rank=self.local_rank,
            )
            if "num_workers" in kwargs:
                kwargs["num_workers"] = max(
                    kwargs["num_workers"] // self.num_processes, 1
                )
            if "batch_size" in kwargs:
                kwargs["batch_size"] = max(
                    kwargs["batch_size"] // self.num_processes, 1
                )
        else:
            sampler = ResumableSequentialSampler(dataset, start_idx)

        return DataLoader(dataset, sampler=sampler, **kwargs)

    @staticmethod
    def unwrap(model):
        """No wrapping happens under SPMD; returns the model
        (reference accelerator.py:944-952)."""
        return model
