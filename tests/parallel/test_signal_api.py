"""AudioSignal-level sequence-parallel surface (VERDICT r2 #7): the
``mesh=`` kwargs on loudness/stft/istft/resample and the
``shard_signal`` placement helper must reproduce single-device numerics
on the 8-device mesh (tutorial: docs/tutorials/long_signals.md)."""
import jax
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from audiotools_tpu.parallel import make_mesh, shard_signal

SR = 44100
T = 8 * 44100  # 8 s, divides the 8-way time shard


def _speechy(seed=0, t=T):
    rng = np.random.RandomState(seed)
    n = np.arange(t) / SR
    x = (
        0.3 * np.sin(2 * np.pi * 220 * n) * (0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * n))
        + 0.05 * rng.randn(t)
    ).astype(np.float32)
    return x


@pytest.fixture(scope="module")
def mesh():
    return make_mesh({"sp": 8})


def test_shard_signal_places_time_axis(mesh):
    sig = AudioSignal(_speechy()[None, None], SR)
    lufs_before = np.asarray(sig.loudness())  # populate the cache
    shard_signal(sig, mesh)
    spec = sig.audio_data.sharding.spec
    assert tuple(spec) == (None, None, "sp")
    # samples unchanged -> cache kept
    assert np.array_equal(np.asarray(sig._loudness), lufs_before)

    odd = AudioSignal(np.zeros((1, 1, 8 * 100 + 3), np.float32), SR)
    with pytest.raises(ValueError, match="divide"):
        shard_signal(odd, mesh)


def test_loudness_mesh_matches_single_device(mesh):
    x = np.stack([_speechy(0), _speechy(1)])[:, None]
    ref = np.asarray(AudioSignal(x, SR).loudness())

    sig = shard_signal(AudioSignal(x, SR), mesh)
    got = np.asarray(sig.loudness(mesh=mesh))
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 1e-3
    # cached like the single-device path
    assert sig._loudness is not None


def test_stft_istft_mesh_round_trip_matches(mesh):
    # per-shard length must divide the hop: 44032 = 86 * 512
    t = 8 * 44032
    x = _speechy(2, t)[None, None]
    win, hop = 2048, 512

    ref_sig = AudioSignal(x, SR)
    ref_spec = np.asarray(
        ref_sig.stft(win, hop, "hann", match_stride=False)
    )

    sig = shard_signal(AudioSignal(x, SR), mesh)
    spec = sig.stft(win, hop, "hann", match_stride=False, mesh=mesh)
    n_valid = sig._stft_valid_frames
    assert n_valid == ref_spec.shape[-1]
    got = np.asarray(spec)[..., :n_valid]
    assert np.abs(np.abs(got) - np.abs(ref_spec)).max() < 1e-3

    # inverse: back to the original samples, still sharded
    sig.istft(win, hop, "hann", match_stride=False, length=t, mesh=mesh)
    err = np.abs(np.asarray(sig.audio_data) - x).max()
    assert err < 1e-4
    assert tuple(sig.audio_data.sharding.spec)[-1] == "sp"

    with pytest.raises(ValueError, match="match_stride"):
        sig.stft(win, hop, "hann", match_stride=True, mesh=mesh)


def test_resample_mesh_matches_single_device(mesh):
    x = _speechy(3)[None, None]
    ref = AudioSignal(x, SR).resample(22050)
    sig = shard_signal(AudioSignal(x, SR), mesh).resample(22050, mesh=mesh)
    assert sig.sample_rate == 22050
    assert sig.audio_data.shape == ref.audio_data.shape
    assert (
        np.abs(np.asarray(sig.audio_data) - np.asarray(ref.audio_data)).max()
        < 1e-4
    )
