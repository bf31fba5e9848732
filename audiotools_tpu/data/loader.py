"""Prefetching data loader.

The reference rides torch's ``DataLoader`` (process workers). Here the
loader is a thread-pool pipeline: worker threads call
``dataset[idx]`` (host-side decode + parameter instantiation, mostly
numpy/libc work), batches are collated with the AudioSignal-aware
``util.collate``, and an optional device-prefetch stage overlaps
host->HBM transfer with compute — the torch-free, jax-idiomatic input
pipeline. ``AudioDataset`` also remains compatible with
``torch.utils.data.DataLoader`` if preferred.
"""
import queue
import threading
from concurrent.futures import ThreadPoolExecutor

from ..core import util


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
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.sampler = sampler
        self.drop_last = drop_last
        self.prefetch_batches = prefetch_batches
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

    def __iter__(self):
        if self.num_workers <= 0:
            for idx_batch in self._index_batches():
                yield self.collate_fn([self.dataset[i] for i in idx_batch])
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()
        _SENTINEL = object()

        def produce():
            try:
                with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
                    for idx_batch in self._index_batches():
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, idx_batch))
                        out_q.put(self.collate_fn(items))
            except BaseException as e:  # surface worker errors to consumer
                out_q.put(e)
                return
            out_q.put(_SENTINEL)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
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
            # drain so the producer can exit
            while not out_q.empty():
                out_q.get_nowait()
