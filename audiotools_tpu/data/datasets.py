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
        self,
        sources: List[str] = None,
        weights: List[float] = None,
        transform: Callable = None,
        relative_path: str = None,
        ext: List[str] = util.AUDIO_EXTENSIONS,
        shuffle: bool = True,
        shuffle_state: int = 0,
    ):
        self.audio_lists = util.read_sources(
            sources, relative_path=relative_path, ext=ext
        )

        self.audio_indices = [
            (src_idx, item_idx)
            for src_idx, src in enumerate(self.audio_lists)
            for item_idx in range(len(src))
        ]
        if shuffle:
            state = util.random_state(shuffle_state)
            state.shuffle(self.audio_indices)

        self.sources = sources
        self.weights = weights
        self.transform = transform

    def __call__(
        self,
        state,
        sample_rate: int,
        duration: float,
        loudness_cutoff: float = -40,
        num_channels: int = 1,
        offset: float = None,
        source_idx: int = None,
        item_idx: int = None,
        global_idx: int = None,
    ):
        if source_idx is not None and item_idx is not None:
            try:
                audio_info = self.audio_lists[source_idx][item_idx]
            except Exception:
                audio_info = {"path": "none"}
        elif global_idx is not None:
            source_idx, item_idx = self.audio_indices[
                global_idx % len(self.audio_indices)
            ]
            audio_info = self.audio_lists[source_idx][item_idx]
        else:
            audio_info, source_idx, item_idx = util.choose_from_list_of_lists(
                state, self.audio_lists, p=self.weights
            )

        path = audio_info["path"]
        signal = AudioSignal.zeros(duration, sample_rate, num_channels)

        if path != "none":
            if offset is None:
                signal = AudioSignal.salient_excerpt(
                    path,
                    duration=duration,
                    state=state,
                    loudness_cutoff=loudness_cutoff,
                )
            else:
                signal = AudioSignal(
                    path,
                    offset=offset,
                    duration=duration,
                )

        if num_channels == 1:
            signal = signal.to_mono()
        signal = signal.resample(sample_rate)

        if signal.duration < duration:
            signal = signal.zero_pad_to(int(duration * sample_rate))

        for k, v in audio_info.items():
            signal.metadata[k] = v

        item = {
            "signal": signal,
            "source_idx": source_idx,
            "item_idx": item_idx,
            "source": str(self.sources[source_idx]),
            "path": str(path),
        }
        if self.transform is not None:
            item["transform_args"] = self.transform.instantiate(state, signal=signal)
        return item


def default_matcher(x, y):
    return Path(x).parent == Path(y).parent


def align_lists(lists, matcher: Callable = default_matcher):
    """Align multitrack file lists in place (reference datasets.py:142-150)."""
    longest_list = lists[np.argmax([len(l) for l in lists])]
    for i, x in enumerate(longest_list):
        for l in lists:
            if i >= len(l):
                l.append({"path": "none"})
            elif not matcher(l[i]["path"], x["path"]):
                l.insert(i, {"path": "none"})
    return lists


class AudioDataset:
    """Map-style dataset over one or more AudioLoaders
    (reference datasets.py:153-475). ``__getitem__(idx)`` seeds
    ``RandomState(idx)`` so items are fully reproducible."""

    def __init__(
        self,
        loaders: Union[AudioLoader, List[AudioLoader], Dict[str, AudioLoader]],
        sample_rate: int,
        n_examples: int = 1000,
        duration: float = 0.5,
        offset: float = None,
        loudness_cutoff: float = -40,
        num_channels: int = 1,
        transform: Callable = None,
        aligned: bool = False,
        shuffle_loaders: bool = False,
        matcher: Callable = default_matcher,
        without_replacement: bool = True,
    ):
        if isinstance(loaders, list):
            loaders = {i: l for i, l in enumerate(loaders)}
        elif isinstance(loaders, AudioLoader):
            loaders = {0: loaders}

        self.loaders = loaders
        self.loudness_cutoff = loudness_cutoff
        self.num_channels = num_channels

        self.length = n_examples
        self.transform = transform
        self.sample_rate = sample_rate
        self.duration = duration
        self.offset = offset
        self.aligned = aligned
        self.shuffle_loaders = shuffle_loaders
        self.without_replacement = without_replacement

        if aligned:
            loaders_list = list(loaders.values())
            for i in range(len(loaders_list[0].audio_lists)):
                input_lists = [l.audio_lists[i] for l in loaders_list]
                # Alignment happens in-place
                align_lists(input_lists, matcher)

    def __getitem__(self, idx):
        state = util.random_state(idx)
        offset = None if self.offset is None else self.offset
        item = {}

        keys = list(self.loaders.keys())
        if self.shuffle_loaders:
            state.shuffle(keys)

        loader_kwargs = {
            "state": state,
            "sample_rate": self.sample_rate,
            "duration": self.duration,
            "loudness_cutoff": self.loudness_cutoff,
            "num_channels": self.num_channels,
            "global_idx": idx if self.without_replacement else None,
        }

        # Draw item from first loader
        loader = self.loaders[keys[0]]
        item[keys[0]] = loader(**loader_kwargs)

        for key in keys[1:]:
            loader = self.loaders[key]
            if self.aligned:
                # Match the first loader's choice of offset/source/item.
                offset = item[keys[0]]["signal"].metadata["offset"]
                loader_kwargs.update(
                    {
                        "offset": offset,
                        "source_idx": item[keys[0]]["source_idx"],
                        "item_idx": item[keys[0]]["item_idx"],
                    }
                )
            item[key] = loader(**loader_kwargs)

        # Sort dictionary back into original order
        keys = list(self.loaders.keys())
        item = {k: item[k] for k in keys}

        item["idx"] = idx
        if self.transform is not None:
            item["transform_args"] = self.transform.instantiate(
                state=state, signal=item[keys[0]]["signal"]
            )

        # Single-loader items are popped up to the main dict.
        if len(keys) == 1:
            item.update(item.pop(keys[0]))

        return item

    def __len__(self):
        return self.length

    @staticmethod
    def collate(list_of_dicts: Union[list, dict], n_splits: int = None):
        """AudioSignal-aware collation (reference datasets.py:457-475)."""
        return util.collate(list_of_dicts, n_splits=n_splits)


class ConcatDataset(AudioDataset):
    """Interleaved concatenation (reference datasets.py:478-487)."""

    def __init__(self, datasets: list):
        self.datasets = datasets

    def __len__(self):
        return sum([len(d) for d in self.datasets])

    def __getitem__(self, idx):
        dataset = self.datasets[idx % len(self.datasets)]
        return dataset[idx // len(self.datasets)]


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
