"""AudioSignal container tests (mirroring reference
tests/core/test_audio_signal.py's coverage)."""
import tempfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu import AudioSignal, STFTParams


def _rand_signal(seed=0, shape=(1, 1, 44100), sr=44100, scale=0.1):
    return AudioSignal(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale, sr
    )


def test_construction_shapes():
    # 1-D -> (1, 1, T)
    sig = AudioSignal(np.zeros(44100, np.float32), 44100)
    assert sig.shape == (1, 1, 44100)
    # 2-D -> (1, C, T)
    sig = AudioSignal(np.zeros((2, 44100), np.float32), 44100)
    assert sig.shape == (1, 2, 44100)
    assert sig.batch_size == 1 and sig.num_channels == 2
    assert sig.signal_duration == 1.0
    with pytest.raises(ValueError):
        AudioSignal(12345)
    with pytest.raises(AssertionError):
        AudioSignal(np.zeros(10, np.float32))  # no sample rate


def test_file_io_roundtrip(tmp_path):
    sig = _rand_signal()
    path = tmp_path / "x.wav"
    sig.write(path, subtype="FLOAT")
    sig2 = AudioSignal(path)
    assert sig2.sample_rate == 44100
    assert np.abs(sig2.numpy() - sig.numpy()).max() == 0
    assert sig2.path_to_file == path
    assert sig2.path_to_input_file == path


def test_offset_duration_read(tmp_path):
    x = (np.random.RandomState(0).randn(44100) * 0.1).astype(np.float32)
    AudioSignal(x, 44100).write(tmp_path / "x.wav", subtype="FLOAT")
    sig = AudioSignal(tmp_path / "x.wav", offset=0.25, duration=0.5)
    assert sig.signal_length == 22050
    assert np.abs(sig.numpy()[0, 0] - x[11025 : 11025 + 22050]).max() == 0


def test_excerpt_and_salient(tmp_path):
    x = (np.random.RandomState(0).randn(44100 * 4) * 0.1).astype(np.float32)
    AudioSignal(x, 44100).write(tmp_path / "x.wav", subtype="FLOAT")
    ex = AudioSignal.excerpt(tmp_path / "x.wav", duration=1.0, state=0)
    assert ex.signal_length == 44100
    assert 0 <= ex.metadata["offset"] <= 3.0
    sal = AudioSignal.salient_excerpt(
        tmp_path / "x.wav", loudness_cutoff=-50, duration=1.0, state=0
    )
    assert sal.signal_length == 44100
    assert float(sal.loudness()[0]) > -50


def test_zeros_and_wave():
    z = AudioSignal.zeros(1.0, 16000, num_channels=2, batch_size=3)
    assert z.shape == (3, 2, 16000)
    for shape in ["sine", "square", "sawtooth", "triangle"]:
        w = AudioSignal.wave(440, 0.5, 44100, shape=shape)
        assert w.shape == (1, 1, 22050)
    with pytest.raises(ValueError):
        AudioSignal.wave(440, 0.5, 44100, shape="nope")


def test_batch():
    signals = [_rand_signal(i, (1, 1, 44100 + 100 * i)) for i in range(4)]
    with pytest.raises(RuntimeError):
        AudioSignal.batch(signals)
    batched = AudioSignal.batch([s.clone() for s in signals], pad_signals=True)
    assert batched.shape == (4, 1, 44400)
    batched = AudioSignal.batch([s.clone() for s in signals], truncate_signals=True)
    assert batched.shape == (4, 1, 44100)
    # mismatched sample rates
    s2 = _rand_signal(9, (1, 1, 22050), sr=22050)
    with pytest.raises(RuntimeError):
        AudioSignal.batch([signals[0].clone(), s2.clone()])
    rs = AudioSignal.batch(
        [signals[0].clone(), s2.clone()], resample=True, pad_signals=True
    )
    assert rs.sample_rate == 44100


def test_pad_trim_truncate():
    sig = _rand_signal()
    sig.zero_pad(10, 20)
    assert sig.signal_length == 44130
    sig.trim(10, 20)
    assert sig.signal_length == 44100
    sig.zero_pad_to(50000)
    assert sig.signal_length == 50000
    sig.truncate_samples(44100)
    assert sig.signal_length == 44100
    sig.zero_pad_to(50000, "before")
    assert sig.signal_length == 50000


def test_to_mono_and_resample():
    sig = _rand_signal(0, (1, 2, 44100))
    mono = sig.clone().to_mono()
    assert mono.num_channels == 1
    rs = sig.clone().resample(16000)
    assert rs.sample_rate == 16000
    assert rs.signal_length == 16000


def test_arithmetic():
    a = _rand_signal(1)
    b = _rand_signal(2)
    c = a + b
    assert np.allclose(c.numpy(), a.numpy() + b.numpy())
    c = a - b
    assert np.allclose(c.numpy(), a.numpy() - b.numpy())
    c = a * 0.5
    assert np.allclose(c.numpy(), a.numpy() * 0.5)
    c = 0.5 * a
    assert np.allclose(c.numpy(), a.numpy() * 0.5)
    c = a + 1.0
    a2 = a.clone()
    a2 += b
    assert np.allclose(a2.numpy(), a.numpy() + b.numpy())
    a2 = a.clone()
    a2 -= b
    a2 = a.clone()
    a2 *= 2.0


def test_equality():
    a = _rand_signal(1)
    assert a == a.clone()
    assert a != _rand_signal(2)


def test_indexing():
    sig = _rand_signal(0, (4, 2, 8000), sr=8000)
    sig.stft()
    sig.loudness()
    item = sig[2]
    assert item.batch_size == 1
    assert np.allclose(item.numpy()[0], sig.numpy()[2])
    assert item.stft_data is not None and item._loudness is not None
    sub = sig[[0, 1]]
    assert sub.batch_size == 2
    mask = np.array([True, False, True, False])
    m = sig[mask]
    assert m.batch_size == 2

    other = _rand_signal(5, (1, 2, 8000), sr=8000)
    sig[1] = other
    assert np.allclose(sig.numpy()[1], other.numpy()[0])


def test_clone_copy_detach_hash():
    sig = _rand_signal()
    sig.stft()
    sig.loudness()
    c = sig.clone()
    assert c == sig
    assert c.metadata == sig.metadata
    d = sig.deepcopy()
    assert d == sig
    s = sig.copy()
    assert s == sig
    sig.detach()
    h = sig.hash()
    assert isinstance(h, str) and len(h) == 64
    assert h == sig.clone().hash()


def test_stft_params_defaults():
    sig = _rand_signal()
    assert sig.stft_params.window_length == 2048
    assert sig.stft_params.hop_length == 512
    assert sig.stft_params.window_type == "hann"
    sig = _rand_signal(0, (1, 1, 16000), sr=16000)
    assert sig.stft_params.window_length == 512
    sig.stft_params = STFTParams(window_length=256)
    assert sig.stft_params.window_length == 256
    assert sig.stft_params.hop_length == 512 // 4 * 1  # inferred default hop = 128


def test_stft_istft_signal_api():
    sig = _rand_signal()
    with pytest.raises(RuntimeError):
        sig.istft()
    stft_data = sig.stft()
    assert sig.stft_data is stft_data
    recon = sig.clone()
    recon.stft()
    recon.istft()
    assert np.abs(recon.numpy() - sig.numpy()).max() < 1e-5


def test_magnitude_phase_setters():
    sig = _rand_signal()
    mag, phase = sig.magnitude, sig.phase
    recon = mag * np.exp(1j * phase)
    assert np.allclose(recon, sig.stft_data, atol=1e-5)
    sig.magnitude = mag
    sig.phase = phase
    assert np.allclose(sig.stft_data, recon, atol=1e-4)


def test_log_magnitude_top_db():
    sig = _rand_signal()
    lm = np.asarray(sig.log_magnitude(top_db=40.0))
    assert lm.max() - lm.min() <= 40.0 + 1e-3


def test_mel_and_mfcc_shapes():
    sig = _rand_signal()
    mel = sig.mel_spectrogram(80)
    assert mel.shape[:3] == (1, 1, 80)
    mfcc = sig.mfcc(n_mfcc=20, n_mels=64)
    assert mfcc.shape[:3] == (1, 1, 20)


def test_markdown_str_rich():
    sig = _rand_signal()
    assert "| Key | Value" in sig.markdown()
    assert "sample_rate" in str(sig)
    table = sig.__rich__()
    assert table is not None


def test_pytree_jit_vmap_grad():
    sig = _rand_signal()

    @jax.jit
    def vol(s):
        return s.clone().volume_change(jnp.asarray([-6.0]))

    out = vol(sig)
    assert np.allclose(out.numpy(), sig.numpy() * 10 ** (-6 / 20), atol=1e-6)

    # grad through a signal op
    def loss(x):
        s = AudioSignal(x, 44100)
        return jnp.abs(s.stft()).sum()

    g = jax.grad(loss)(sig.audio_data)
    assert g.shape == sig.audio_data.shape
    assert np.isfinite(np.asarray(g)).all()


def test_metadata_does_not_trigger_recompile():
    sig = _rand_signal()
    traces = []

    @jax.jit
    def f(s):
        traces.append(1)
        return s.audio_data * 2

    f(sig)
    sig2 = _rand_signal(3)
    sig2.metadata["foo"] = "bar"
    f(sig2)
    assert len(traces) == 1


def test_audio_data_setter_resets_loudness():
    sig = _rand_signal()
    sig.loudness()
    assert sig._loudness is not None
    sig.audio_data = sig.audio_data * 0.5
    assert sig._loudness is None


def test_where_drops_mismatched_stft_cache():
    """where() can only keep a cached STFT it can per-item select; with
    different stft shapes on the two sides the cache must be dropped,
    not inherited from if_true (regression: stale spectrogram silently
    inconsistent with the mixed audio)."""
    a = _rand_signal(seed=1, shape=(2, 1, 44100))
    b = _rand_signal(seed=2, shape=(2, 1, 44100))
    a.stft(window_length=512, hop_length=128)
    b.stft(window_length=256, hop_length=64)
    out = type(a).where(np.array([True, False]), a, b)
    assert out._stft_data is None
    # matching shapes still select per item
    b2 = _rand_signal(seed=3, shape=(2, 1, 44100))
    b2.stft(window_length=512, hop_length=128)
    out2 = type(a).where(np.array([True, False]), a, b2)
    assert out2._stft_data is not None
    assert np.allclose(
        np.asarray(out2._stft_data[0]), np.asarray(a._stft_data[0])
    )
    assert np.allclose(
        np.asarray(out2._stft_data[1]), np.asarray(b2._stft_data[1])
    )
