"""Datasets and loaders (mirror of
`/root/reference/audiotools/data/datasets.py`), torch-free.

Design point preserved from the reference (transforms.py:41-44): random
parameter *instantiation* happens on host (numpy RandomState seeded by the
item index, datasets.py:399-400), while DSP *execution* is batched on the
accelerator. Samplers are plain index iterables compatible with both the
native prefetching DataLoader (``data/loader.py``) and torch's DataLoader.
"""
from pathlib import Path
from typing import Callable, Dict, List, Union

import numpy as np

from ..core import AudioSignal
from ..core import util


class AudioLoader:
    """Loads audio endlessly from folders or CSV manifests
    (reference datasets.py:15-135).

    Parameters
    ----------
    sources : List[str], optional
        Folders or CSVs with paths to audio files.
    weights : List[float], optional
        Sampling weight per source.
    transform : Callable, optional
        Transform instantiated alongside each sample.
    relative_path : str, optional
        Root that source paths are relative to.
    ext : List[str]
        Extensions (or file names) to find audio by.
    shuffle : bool
        Shuffle files for the without-replacement (global_idx) mode.
    shuffle_state : int
        Seed for that shuffle.
    """

    def __init__(
        self, sources: List[str] = None, weights: List[float] = None,
        transform: Callable = None, relative_path: str = None,
        ext: List[str] = util.AUDIO_EXTENSIONS, shuffle: bool = True,
        shuffle_state: int = 0,
    ):
        self.sources = sources
        self.weights = weights
        self.transform = transform
        self.audio_lists = util.read_sources(
            sources, relative_path=relative_path, ext=ext
        )
        # flat (source, item) index space for without-replacement mode
        self.audio_indices = [
            (src_idx, item_idx)
            for src_idx, entries in enumerate(self.audio_lists)
            for item_idx in range(len(entries))
        ]
        if shuffle:
            util.random_state(shuffle_state).shuffle(self.audio_indices)

    def _select(self, state, source_idx, item_idx, global_idx):
        """Resolve one CSV/folder entry via one of three addressing modes:
        explicit ``(source_idx, item_idx)``, without-replacement
        ``global_idx`` into the shuffled flat index, or weighted random."""
        if source_idx is not None and item_idx is not None:
            # Explicit coordinates (aligned multitrack). Out-of-range
            # coordinates resolve to silence rather than raising, so a
            # shorter stem list just contributes an empty track.
            try:
                entry = self.audio_lists[source_idx][item_idx]
            except Exception:
                entry = {"path": "none"}
            return entry, source_idx, item_idx
        if global_idx is not None:
            flat = self.audio_indices[global_idx % len(self.audio_indices)]
            source_idx, item_idx = flat
            return self.audio_lists[source_idx][item_idx], source_idx, item_idx
        return util.choose_from_list_of_lists(
            state, self.audio_lists, p=self.weights
        )

    def _read(self, path, state, sample_rate, duration, num_channels,
              loudness_cutoff, offset):
        """Decode ``duration`` seconds from ``path`` (salient excerpt when no
        offset is pinned), conformed to the loader's rate/channels/length.
        ``path == "none"`` yields silence of the requested shape."""
        if path == "none":
            signal = AudioSignal.zeros(duration, sample_rate, num_channels)
        elif offset is None:
            signal = AudioSignal.salient_excerpt(
                path,
                duration=duration,
                state=state,
                loudness_cutoff=loudness_cutoff,
            )
        else:
            signal = AudioSignal(path, offset=offset, duration=duration)

        if num_channels == 1:
            signal = signal.to_mono()
        signal = signal.resample(sample_rate)
        if signal.duration < duration:
            signal = signal.zero_pad_to(int(duration * sample_rate))
        return signal

    def __call__(
        self, state, sample_rate: int, duration: float,
        loudness_cutoff: float = -40, num_channels: int = 1,
        offset: float = None, source_idx: int = None,
        item_idx: int = None, global_idx: int = None,
    ):
        entry, source_idx, item_idx = self._select(
            state, source_idx, item_idx, global_idx
        )
        signal = self._read(
            entry["path"], state, sample_rate, duration, num_channels,
            loudness_cutoff, offset,
        )
        # CSV columns (e.g. a precomputed ``loudness``) ride along on the
        # signal so transforms like GlobalVolumeNorm can use them.
        signal.metadata.update(entry)

        item = {
            "signal": signal,
            "source_idx": source_idx,
            "item_idx": item_idx,
            "source": str(self.sources[source_idx]),
            "path": str(entry["path"]),
        }
        if self.transform is not None:
            item["transform_args"] = self.transform.instantiate(state, signal=signal)
        return item


def default_matcher(x, y):
    return Path(x).parent == Path(y).parent


def align_lists(lists, matcher: Callable = default_matcher):
    """Pad multitrack file lists (in place) so index ``i`` refers to the
    same recording in every list (behavior of reference datasets.py:142-150).

    The longest list acts as the anchor. Walking it position by position,
    any other list whose entry at that position does not ``matcher``-match
    the anchor's gets a silence placeholder spliced in (or appended, once
    it has run out of entries).
    """
    anchor = max(lists, key=len)
    silence = lambda: {"path": "none"}
    for pos, anchor_entry in enumerate(anchor):
        for tracks in lists:
            if pos >= len(tracks):
                tracks.append(silence())
            elif not matcher(tracks[pos]["path"], anchor_entry["path"]):
                tracks.insert(pos, silence())
    return lists


class AudioDataset:
    """Map-style dataset over one or more AudioLoaders
    (reference datasets.py:153-475). ``__getitem__(idx)`` seeds
    ``RandomState(idx)`` so items are fully reproducible."""

    def __init__(
        self,
        loaders: Union[AudioLoader, List[AudioLoader], Dict[str, AudioLoader]],
        sample_rate: int, n_examples: int = 1000, duration: float = 0.5,
        offset: float = None, loudness_cutoff: float = -40,
        num_channels: int = 1, transform: Callable = None,
        aligned: bool = False, shuffle_loaders: bool = False,
        matcher: Callable = default_matcher, without_replacement: bool = True,
    ):
        # Normalise every accepted loader spec to an ordered name->loader map.
        if isinstance(loaders, AudioLoader):
            loaders = {0: loaders}
        elif isinstance(loaders, list):
            loaders = dict(enumerate(loaders))
        self.loaders = loaders

        self.sample_rate = sample_rate
        self.length = n_examples
        self.duration = duration
        self.offset = offset
        self.loudness_cutoff = loudness_cutoff
        self.num_channels = num_channels
        self.transform = transform
        self.aligned = aligned
        self.shuffle_loaders = shuffle_loaders
        self.without_replacement = without_replacement

        if aligned:
            # Splice silence placeholders into every loader's file lists so
            # equal indices point at the same multitrack recording. Mutates
            # the loaders' audio_lists directly.
            all_loaders = list(loaders.values())
            n_sources = len(all_loaders[0].audio_lists)
            for src in range(n_sources):
                align_lists([l.audio_lists[src] for l in all_loaders], matcher)

    def __getitem__(self, idx):
        # RandomState(idx) is the determinism root: the same index always
        # reproduces the same excerpt choices and transform parameters.
        state = util.random_state(idx)

        draw_order = list(self.loaders.keys())
        if self.shuffle_loaders:
            state.shuffle(draw_order)

        shared = dict(
            state=state,
            sample_rate=self.sample_rate,
            duration=self.duration,
            loudness_cutoff=self.loudness_cutoff,
            num_channels=self.num_channels,
            global_idx=idx if self.without_replacement else None,
        )

        per_loader = {}
        primary = None  # the first-drawn loader anchors aligned mode
        for name in draw_order:
            kwargs = dict(shared)
            if self.aligned and primary is not None:
                # Follow the primary draw: same file coordinates, same
                # start offset within the file.
                kwargs["offset"] = primary["signal"].metadata["offset"]
                kwargs["source_idx"] = primary["source_idx"]
                kwargs["item_idx"] = primary["item_idx"]
            per_loader[name] = self.loaders[name](**kwargs)
            if primary is None:
                primary = per_loader[name]

        # Present loaders in declaration order regardless of draw order.
        item = {name: per_loader[name] for name in self.loaders}
        item["idx"] = idx
        if self.transform is not None:
            first = next(iter(self.loaders))
            item["transform_args"] = self.transform.instantiate(
                state=state, signal=item[first]["signal"]
            )
        if len(self.loaders) == 1:
            only = item.pop(next(iter(self.loaders)))
            item.update(only)
        return item

    def __len__(self):
        return self.length

    # AudioSignal-aware collation (reference datasets.py:457-475)
    collate = staticmethod(util.collate)


class ConcatDataset(AudioDataset):
    """Interleaved concatenation: index ``i`` round-robins across the
    children (reference datasets.py:478-487)."""

    def __init__(self, datasets: list):
        self.datasets = datasets

    def __len__(self):
        return sum(len(child) for child in self.datasets)

    def __getitem__(self, idx):
        which, inner = idx % len(self.datasets), idx // len(self.datasets)
        return self.datasets[which][inner]


class ResumableSequentialSampler:
    """Sequential index sampler resumable from ``start_idx``
    (reference datasets.py:505-517)."""

    def __init__(self, dataset, start_idx: int = None, **kwargs):
        self.dataset = dataset
        self.start_idx = start_idx if start_idx is not None else 0

    def __len__(self):
        return len(self.dataset)

    def __iter__(self):
        for i in range(len(self.dataset)):
            if i >= self.start_idx:
                yield i
        self.start_idx = 0  # reset for the next epoch


class ResumableDistributedSampler:
    """Sharded sampler resumable from a global ``start_idx``
    (reference datasets.py:490-503). Each replica (jax process) yields its
    interleaved slice of the index space; optional per-epoch shuffling
    matches torch's DistributedSampler contract."""

    def __init__(
        self,
        dataset,
        start_idx: int = None,
        num_replicas: int = None,
        rank: int = None,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        **kwargs,
    ):
        import jax

        self.dataset = dataset
        self.num_replicas = (
            num_replicas if num_replicas is not None else jax.process_count()
        )
        self.rank = rank if rank is not None else jax.process_index()
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0
        self.start_idx = (
            start_idx // self.num_replicas if start_idx is not None else 0
        )
        if self.drop_last:
            self.num_samples = len(dataset) // self.num_replicas
        else:
            self.num_samples = -(-len(dataset) // self.num_replicas)
        self.total_size = self.num_samples * self.num_replicas

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self):
        return self.num_samples

    def __iter__(self):
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            indices = rng.permutation(n).tolist()
        else:
            indices = list(range(n))
        if not self.drop_last:
            # pad to make evenly divisible
            pad = self.total_size - len(indices)
            if pad > 0:
                indices += indices[:pad]
        else:
            indices = indices[: self.total_size]
        indices = indices[self.rank : self.total_size : self.num_replicas]

        for i, idx in enumerate(indices):
            if i >= self.start_idx:
                yield idx
        self.start_idx = 0  # reset for the next epoch
