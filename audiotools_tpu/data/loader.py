"""Prefetching data loader.

The reference rides torch's ``DataLoader`` (process workers). Here the
loader is a thread-pool pipeline: worker threads call
``dataset[idx]`` (host-side decode + parameter instantiation, pure
numpy/libc work — the host path never touches the device), batches are
collated with the AudioSignal-aware ``util.collate``, and the optional
device stage (``to_device=True``) quantizes + ``jax.device_put``s each
batch *inside the producer pipeline*, so host decode of batch N+1 and
the HBM transfer of batch N overlap the consumer's device compute — the
torch-free, jax-idiomatic input pipeline. ``AudioDataset`` also remains
compatible with ``torch.utils.data.DataLoader`` if preferred.

Wire format
-----------
``wire_dtype="int16"`` stages AudioSignal audio across the host->device
link as int16 (half the bytes of f32 — the transfer is the dominant
per-batch device cost on thin links). Quantization is symmetric
``round(x * 32768)`` clipped to the int16 range (error <= 1.5e-5, well
under the 1e-4 augmentation parity budget); the consumer converts back
*inside its jitted step* via :meth:`AudioSignal.dequantize_wire`, so
dequantization costs no extra program dispatch.
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

from .._hostprof import span
from ..core import util


def _wire_quantize(batch, wire_dtype):
    """Quantize every AudioSignal's audio leaf in a collated batch."""
    from ..core.signal import AudioSignal

    flat = util.flatten(batch) if isinstance(batch, dict) else None
    values = flat.values() if flat is not None else [batch]
    for v in values:
        if isinstance(v, AudioSignal):
            v.quantize_wire(wire_dtype)
    return batch


class DataLoader:
    """Batched, prefetching loader over a map-style dataset.

    Parameters
    ----------
    dataset : AudioDataset
        Must define ``__getitem__``/``__len__``; items are dicts.
    batch_size : int
    num_workers : int
        Worker threads decoding items concurrently (0 = synchronous).
    sampler : iterable, optional
        Index sampler (e.g. ``ResumableDistributedSampler``); defaults to
        sequential.
    collate_fn : callable, optional
        Defaults to ``dataset.collate`` / ``util.collate``.
    drop_last : bool
        Drop the trailing incomplete batch.
    prefetch_batches : int
        Number of collated batches to keep ready ahead of the consumer.
    to_device : bool
        Stage each batch onto the accelerator inside the producer
        pipeline (``jax.device_put``), overlapping transfer with the
        consumer's compute. Requires ``num_workers > 0``.
    device : optional
        Target device or ``jax.sharding`` placement for ``to_device``
        (default: jax's default device).
    wire_dtype : str, optional
        ``"int16"`` stages audio as int16 (see module docstring); the
        consumer dequantizes in-jit with ``signal.dequantize_wire()``.
    """

    def __init__(
        self,
        dataset,
        batch_size: int = 1,
        num_workers: int = 0,
        sampler=None,
        collate_fn=None,
        drop_last: bool = False,
        prefetch_batches: int = 2,
        to_device: bool = False,
        device=None,
        wire_dtype: str = None,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.sampler = sampler
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
        self.to_device = to_device
        self.device = device
        if wire_dtype not in (None, "int16"):
            raise ValueError(f"unsupported wire_dtype {wire_dtype!r}")
        self.wire_dtype = wire_dtype
        if collate_fn is None:
            collate_fn = getattr(dataset, "collate", util.collate)
        self.collate_fn = collate_fn

    def _index_batches(self):
        indices = iter(self.sampler) if self.sampler is not None else iter(
            range(len(self.dataset))
        )
        batch = []
        for idx in indices:
            batch.append(idx)
            if len(batch) == self.batch_size:
                yield batch
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler) if self.sampler is not None else len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _stage(self, batch):
        """Optional device staging: quantize to the wire dtype and start
        the host->HBM transfer now (device_put is async), so it overlaps
        the consumer's compute on the previous batch."""
        if not self.to_device:
            return batch
        import jax

        if self.wire_dtype is not None:
            batch = _wire_quantize(batch, self.wire_dtype)
        device = self.device if self.device is not None else jax.devices()[0]
        with span("device_put"):
            # prepare_batch puts only array/AudioSignal leaves — batches
            # also carry string metadata (``source``/``path``) that
            # device_put would reject.
            return util.prepare_batch(batch, device)

    def __iter__(self):
        if self.num_workers <= 0:
            for idx_batch in self._index_batches():
                yield self._stage(
                    self.collate_fn([self.dataset[i] for i in idx_batch])
                )
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()
        _SENTINEL = object()

        # With device staging, the host->HBM transfer runs on its own
        # pipeline stage: if the producer called _stage inline, decode
        # would stall for the whole transfer (measured: ZERO overlap on
        # the tunneled link) — a dedicated stager thread lets batch
        # N+1's decode run while batch N crosses the wire.
        mid_q = (
            queue.Queue(maxsize=1) if self.to_device else out_q
        )

        def produce():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for idx_batch in self._index_batches():
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, idx_batch))
                        batch = self.collate_fn(items)
                        mid_q.put(
                            batch if self.to_device else self._stage(batch)
                        )
            except BaseException as e:  # surface worker errors to consumer
                mid_q.put(e)
                return
            mid_q.put(_SENTINEL)

        def stage():
            while True:
                item = mid_q.get()
                if item is _SENTINEL or isinstance(item, BaseException):
                    out_q.put(item)
                    return
                if stop.is_set():
                    return
                out_q.put(self._stage(item))

        threading.Thread(target=produce, daemon=True).start()
        if self.to_device:
            threading.Thread(target=stage, daemon=True).start()
        try:
            while True:
                item = out_q.get()
                if item is _SENTINEL:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            # drain so the producer/stager can exit
            for q in ({mid_q, out_q}):
                while not q.empty():
                    try:
                        q.get_nowait()
                    except queue.Empty:
                        break
