"""SPMD augmentation: the full transform chain runs data-parallel over a
device mesh and matches single-device execution bit-for-bit.

This is the TPU-native equivalent of the reference's DDP claim ("the same
GPU transform code runs under DistributedDataParallel") — here the whole
jitted chain is sharded over the batch axis with jax.sharding and XLA
inserts any collectives.
"""
import tempfile
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from audiotools_tpu.data import transforms as tfm
from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
from audiotools_tpu.data.loader import DataLoader
from audiotools_tpu.parallel import make_mesh
from tests.fixtures import build_fixture_tree


@pytest.fixture(scope="module")
def chain_batch():
    root = Path(tempfile.mkdtemp())
    build_fixture_tree(root)
    transform = tfm.Compose(
        tfm.RoomImpulseResponse(sources=[str(root / "ir.csv")]),
        tfm.BackgroundNoise(sources=[str(root / "nz.csv")]),
        tfm.Equalizer(),
        tfm.VolumeNorm(),
    )
    ds = AudioDataset(
        AudioLoader(sources=[str(root / "spk.csv")]),
        sample_rate=22050,
        n_examples=8,
        duration=1.0,
        transform=transform,
    )
    batch = next(iter(DataLoader(ds, batch_size=8, num_workers=0)))
    return ds, batch


def test_sharded_chain_matches_single_device(chain_batch):
    ds, batch = chain_batch
    sig, kw = batch["signal"], batch["transform_args"]

    def run(audio, kwargs):
        s = sig.clone()
        s.audio_data = audio
        return ds.transform(s, **kwargs).audio_data

    ref = np.asarray(jax.jit(run)(sig.audio_data, kw))

    mesh = make_mesh({"dp": 8})
    batch_sharding = NamedSharding(mesh, P("dp"))

    def shard_leaf(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == 8:
            return jax.device_put(x, batch_sharding)
        return x

    audio_s = jax.device_put(sig.audio_data, batch_sharding)
    kw_s = jax.tree_util.tree_map(shard_leaf, kw)

    out = jax.jit(run)(audio_s, kw_s)
    # output stays sharded over the batch axis
    assert any(
        "dp" in str(s.spec) or s.is_fully_replicated is False
        for s in [out.sharding]
    )
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def test_sharded_feature_stack_matches(chain_batch):
    from audiotools_tpu.ops import fft as F
    from audiotools_tpu.ops import loudness as L

    _, batch = chain_batch
    audio = batch["signal"].audio_data

    def feats(a):
        return F.mel_spectrogram(a, 22050, 40), L.loudness(a, 22050)

    mel_ref, lufs_ref = jax.jit(feats)(audio)

    mesh = make_mesh({"dp": 8})
    a_s = jax.device_put(audio, NamedSharding(mesh, P("dp")))
    mel_s, lufs_s = jax.jit(feats)(a_s)

    assert np.allclose(np.asarray(mel_s), np.asarray(mel_ref), atol=1e-4)
    assert np.allclose(np.asarray(lufs_s), np.asarray(lufs_ref), atol=1e-4)
