"""Dataset / loader / sampler tests (mirroring reference
tests/data/test_datasets.py)."""
import numpy as np
import pytest

import audiotools_tpu.core.util

from audiotools_tpu import AudioSignal
from audiotools_tpu.data import transforms as tfm
from audiotools_tpu.data.datasets import (
    AudioDataset,
    AudioLoader,
    ConcatDataset,
    ResumableDistributedSampler,
    ResumableSequentialSampler,
    align_lists,
)
from audiotools_tpu.data.loader import DataLoader


def test_audio_loader_random(audio_dir):
    loader = AudioLoader(sources=[str(audio_dir / "spk.csv")])
    state = np.random.RandomState(0)
    item = loader(state, 44100, 0.5, num_channels=1)
    assert item["signal"].shape == (1, 1, 22050)
    assert item["source_idx"] == 0
    assert "path" in item


def test_audio_loader_folder_source(audio_dir):
    loader = AudioLoader(sources=[str(audio_dir / "spk")])
    state = np.random.RandomState(0)
    item = loader(state, 16000, 0.5)
    assert item["signal"].sample_rate == 16000
    assert item["signal"].shape == (1, 1, 8000)


def test_audio_loader_explicit_indexing(audio_dir):
    loader = AudioLoader(sources=[str(audio_dir / "spk.csv")])
    state = np.random.RandomState(0)
    item = loader(state, 44100, 0.5, source_idx=0, item_idx=1, offset=0.5)
    assert item["item_idx"] == 1
    # out of range -> zeros signal
    item = loader(state, 44100, 0.5, source_idx=0, item_idx=99)
    assert np.abs(item["signal"].numpy()).max() == 0


def test_audio_loader_global_idx(audio_dir):
    loader = AudioLoader(sources=[str(audio_dir / "spk.csv")], shuffle=False)
    state = np.random.RandomState(0)
    n = len(loader.audio_indices)
    seen = [loader(state, 44100, 0.25, global_idx=i)["path"] for i in range(n)]
    assert len(set(seen)) == n  # without replacement over one pass


def test_audio_loader_empty_csv(audio_dir):
    loader = AudioLoader(sources=[str(audio_dir / "empty.csv")])
    assert loader.audio_lists == [[]]


def test_loader_metadata_merge(audio_dir, tmp_path):
    import csv

    # CSV with loudness column
    rows = []
    with open(audio_dir / "spk.csv") as f:
        for r in csv.DictReader(f):
            r["loudness"] = "-20.5"
            rows.append(r)
    p = tmp_path / "spk_loud.csv"
    with open(p, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path", "loudness"])
        w.writeheader()
        for r in rows:
            w.writerow(r)
    loader = AudioLoader(sources=[str(p)])
    item = loader(np.random.RandomState(0), 44100, 0.5)
    assert item["signal"].metadata["loudness"] == "-20.5"


def test_dataset_reproducible(audio_dir):
    ds = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=8,
        duration=0.5,
    )
    a = ds[3]
    b = ds[3]
    assert np.allclose(a["signal"].numpy(), b["signal"].numpy())
    assert a["idx"] == 3
    assert len(ds) == 8


def test_dataset_with_transform(audio_dir):
    ds = AudioDataset(
        AudioLoader(
            sources=[str(audio_dir / "spk.csv")],
            transform=tfm.Equalizer(),
        ),
        sample_rate=44100,
        n_examples=4,
        duration=0.5,
        transform=tfm.VolumeNorm(),
    )
    item = ds[0]
    assert "transform_args" in item
    # single-loader items are popped up, so the loader's transform_args
    # shadow the dataset's (reference behavior, datasets.py:446-451)
    assert "Equalizer" in item["transform_args"]

    # with no loader transform, the dataset's args survive
    ds2 = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=4,
        duration=0.5,
        transform=tfm.VolumeNorm(),
    )
    assert "VolumeNorm" in ds2[0]["transform_args"]


def test_dataset_collate_and_dataloader(audio_dir):
    ds = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=10,
        duration=0.5,
        transform=tfm.VolumeNorm(),
    )
    dl = DataLoader(ds, batch_size=4, num_workers=2)
    batches = list(dl)
    assert len(batches) == 3
    batch = batches[0]
    assert batch["signal"].batch_size == 4
    # prob=1.0 masks collate to the static AlwaysTrue sentinel (the jit
    # fast path); prob<1 masks stack to a (B,) bool array
    from audiotools_tpu.core.util import AlwaysTrue

    assert isinstance(
        batch["transform_args"]["VolumeNorm"]["mask"], AlwaysTrue
    )
    # transform applies on the batch
    out = ds.transform(batch["signal"].clone(), **batch["transform_args"])
    assert np.allclose(np.asarray(out.loudness()), -24, atol=0.5)


def test_dataset_collate_n_splits(audio_dir):
    ds = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=8,
        duration=0.25,
    )
    items = [ds[i] for i in range(8)]
    sub_batches = ds.collate(items, n_splits=2)
    assert len(sub_batches) == 2
    assert sub_batches[0]["signal"].batch_size == 4


def test_multi_loader_dict(audio_dir):
    loaders = {
        "a": AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        "b": AudioLoader(sources=[str(audio_dir / "nz.csv")]),
    }
    ds = AudioDataset(loaders, sample_rate=44100, n_examples=4, duration=0.5)
    item = ds[0]
    assert "a" in item and "b" in item
    assert item["a"]["signal"].shape == item["b"]["signal"].shape


def test_aligned_multitrack(audio_dir, tmp_path):
    """Aligned loaders propagate offset/source/item of the first loader
    (reference tests/data/test_datasets.py:79-110)."""
    from audiotools_tpu.core.util import generate_chord_dataset, chdir

    with chdir(tmp_path):
        out = generate_chord_dataset(
            max_voices=3, num_items=3, duration=0.5, output_dir="chords"
        )
        voices = sorted(out.glob("voice_*.csv"))
        loaders = {
            p.stem: AudioLoader(sources=[str(p)]) for p in voices
        }
        ds = AudioDataset(
            loaders, sample_rate=44100, n_examples=4, duration=0.25, aligned=True
        )
        item = ds[0]
        keys = list(loaders.keys())
        src = item[keys[0]]["source_idx"]
        itm = item[keys[0]]["item_idx"]
        for k in keys[1:]:
            assert item[k]["source_idx"] == src
            assert item[k]["item_idx"] == itm


def test_align_lists():
    lists = [
        [{"path": "a/0.wav"}, {"path": "b/1.wav"}],
        [{"path": "a/0.wav"}, {"path": "c/1.wav"}, {"path": "b/1.wav"}],
    ]
    aligned = align_lists([l[:] for l in lists])
    lens = {len(l) for l in aligned}
    assert len(lens) == 1


def test_shuffle_loaders(audio_dir):
    loaders = [
        AudioLoader(sources=[str(audio_dir / "spk.csv")]) for _ in range(3)
    ]
    ds = AudioDataset(
        loaders, sample_rate=44100, n_examples=4, duration=0.25, shuffle_loaders=True
    )
    item = ds[0]
    assert set(k for k in item if isinstance(k, int)) == {0, 1, 2}


def test_concat_dataset(audio_dir):
    ds1 = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=4,
        duration=0.25,
    )
    ds2 = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "nz.csv")]),
        sample_rate=44100,
        n_examples=4,
        duration=0.25,
    )
    cat = ConcatDataset([ds1, ds2])
    assert len(cat) == 8
    item0 = cat[0]  # from ds1
    item1 = cat[1]  # from ds2
    assert item0["path"] != item1["path"]


def test_resumable_sequential_sampler():
    class FakeDS:
        def __len__(self):
            return 10

    s = ResumableSequentialSampler(FakeDS(), start_idx=4)
    assert list(s) == list(range(4, 10))
    # next epoch starts from 0
    assert list(s) == list(range(10))


def test_resumable_distributed_sampler():
    class FakeDS:
        def __len__(self):
            return 10

    shards = []
    for rank in range(2):
        s = ResumableDistributedSampler(FakeDS(), num_replicas=2, rank=rank)
        shards.append(list(s))
    assert sorted(shards[0] + shards[1]) == sorted(list(range(10)))
    assert set(shards[0]).isdisjoint(set(shards[1]))

    # resume: start_idx skips already-seen global items
    s = ResumableDistributedSampler(FakeDS(), start_idx=4, num_replicas=2, rank=0)
    assert len(list(s)) == 5 - 2
    assert list(s)  # second epoch full again


def test_dataloader_drop_last_and_sampler(audio_dir):
    ds = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=10,
        duration=0.25,
    )
    sampler = ResumableSequentialSampler(ds, start_idx=2)
    dl = DataLoader(ds, batch_size=4, sampler=sampler, drop_last=True)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0]["idx"].tolist() == [2, 3, 4, 5]


def test_dataloader_propagates_worker_errors():
    class Boom:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            raise RuntimeError("boom")

        collate = staticmethod(lambda items: items)

    dl = DataLoader(Boom(), batch_size=2, num_workers=2)
    with pytest.raises(RuntimeError, match="boom"):
        list(dl)


def test_torch_dataloader_compat(audio_dir):
    """AudioDataset remains usable with torch's DataLoader."""
    import torch.utils.data

    ds = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=4,
        duration=0.25,
    )
    dl = torch.utils.data.DataLoader(
        ds, batch_size=2, num_workers=0, collate_fn=ds.collate
    )
    batch = next(iter(dl))
    assert batch["signal"].batch_size == 2


def test_loader_out_of_range_resolves_to_silence(audio_dir):
    """Reference test_loader_out_of_range (tests/data/test_datasets.py:
    149-169): explicit (source_idx, item_idx) beyond the list must yield
    the silent 'none' item, not raise — a short stem list in aligned
    multitrack mode just contributes an empty track."""
    loader = AudioLoader(sources=[str(audio_dir / "spk.csv")])
    item = loader(
        audiotools_tpu.core.util.random_state(0),
        44100,
        duration=0.25,
        source_idx=0,
        item_idx=10_000,
    )
    assert item["path"] == "none"
    assert np.allclose(item["signal"].numpy(), 0.0)
