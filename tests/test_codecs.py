"""Compressed-codec tests (MP3 via libmp3lame/libmpg123)."""
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from audiotools_tpu.io import codecs, load_audio, save_audio
from tests.fixtures import speech_like

mp3 = pytest.mark.skipif(not codecs.mp3_available(), reason="no mp3 libs")


@mp3
def test_mp3_roundtrip_spectral(tmp_path):
    sr = 44100
    t = np.arange(sr * 2) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)[None]
    p = tmp_path / "t.mp3"
    codecs.write_mp3(p, x, sr)
    y, sr2 = codecs.read_mp3(p)
    assert sr2 == sr
    seg = y[0, 5000:80000]
    f = np.fft.rfftfreq(len(seg), 1 / sr)[np.abs(np.fft.rfft(seg)).argmax()]
    assert abs(f - 440) < 2


@mp3
def test_mp3_stereo_and_offset(tmp_path):
    sr = 22050
    x = np.stack([speech_like(0, 1.0, sr), speech_like(1, 1.0, sr)])
    p = tmp_path / "s.mp3"
    codecs.write_mp3(p, x, sr)
    y, _ = codecs.read_mp3(p)
    assert y.shape[0] == 2
    yo, _ = codecs.read_mp3(p, offset=0.25, duration=0.5)
    assert yo.shape[-1] == int(0.5 * sr)


@mp3
def test_audiosignal_mp3_io(tmp_path):
    sig = AudioSignal(speech_like(0, 1.0)[None, None], 44100)
    sig.write(tmp_path / "x.mp3")
    loaded = AudioSignal(tmp_path / "x.mp3")
    assert loaded.sample_rate == 44100
    assert loaded.num_channels == 1


@mp3
def test_apply_codec_mp3_preset():
    sig = AudioSignal(
        np.stack([speech_like(i, 1.0) for i in range(2)])[:, None], 44100
    )
    out = sig.clone().apply_codec(preset="MP3")
    assert out.shape == sig.shape
    # codec distortion present but aligned
    for i in range(2):
        c = np.corrcoef(out.numpy()[i, 0], sig.numpy()[i, 0])[0, 1]
        assert c > 0.98
    assert not np.allclose(out.numpy(), sig.numpy())


@mp3
def test_save_audio_dispatch(tmp_path):
    x = speech_like(0, 0.5)[None]
    save_audio(tmp_path / "a.mp3", x, 44100)
    y, sr = load_audio(tmp_path / "a.mp3")
    assert sr == 44100


def test_vorbis_binding_loads():
    assert codecs.vorbis_available() in (True, False)


vorbis = pytest.mark.skipif(
    not (codecs.vorbis_available() and codecs.vorbis_encode_available()),
    reason="no vorbis libs",
)


@vorbis
def test_ogg_roundtrip_sample_accurate(tmp_path):
    sr = 44100
    t = np.arange(sr * 2) / sr
    x = np.stack(
        [0.4 * np.sin(2 * np.pi * 440 * t), 0.4 * np.sin(2 * np.pi * 660 * t)]
    ).astype(np.float32)
    p = tmp_path / "t.ogg"
    codecs.write_ogg(p, x, sr)
    y, sr2 = codecs.read_ogg(p)
    assert sr2 == sr
    # vorbis decode is granulepos-aligned: exact length, no codec delay
    assert y.shape == x.shape
    a, b = y.ravel(), x.ravel()
    corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    assert corr > 0.99


@vorbis
def test_ogg_offset_duration(tmp_path):
    sr = 22050
    x = speech_like(0, 2.0, sr)[None]
    p = tmp_path / "s.ogg"
    codecs.write_ogg(p, x, sr)
    yo, _ = codecs.read_ogg(p, offset=0.5, duration=1.0)
    assert yo.shape[-1] == sr


@vorbis
def test_audiosignal_ogg_io(tmp_path):
    sig = AudioSignal(speech_like(0, 1.0)[None, None], 44100)
    sig.write(tmp_path / "x.ogg")
    loaded = AudioSignal(tmp_path / "x.ogg")
    assert loaded.sample_rate == 44100
    assert loaded.signal_length == sig.signal_length


@vorbis
def test_apply_codec_vorbis_preset():
    sig = AudioSignal(
        np.stack([speech_like(i, 1.0) for i in range(2)])[:, None], 44100
    )
    for preset in ("Vorbis", "Ogg"):
        out = sig.clone().apply_codec(preset=preset)
        assert out.shape == sig.shape
        for i in range(2):
            c = np.corrcoef(out.numpy()[i, 0], sig.numpy()[i, 0])[0, 1]
            assert c > 0.95
        assert not np.allclose(out.numpy(), sig.numpy())


@mp3
def test_apply_codec_no_preset_defaults():
    """format= without a preset leaves compression=None; both lossy
    branches must fall back to encoder defaults instead of crashing
    (regression: kwargs.get('compression', 3.0) never saw the default
    because the key was present with None)."""
    sig = AudioSignal(speech_like(5, 1.0)[None, None], 44100)
    fmts = ["mp3"]
    if codecs.vorbis_available() and codecs.vorbis_encode_available():
        fmts.append("ogg")
    for fmt in fmts:
        out = sig.clone().apply_codec(format=fmt)
        assert out.shape == sig.shape
        c = np.corrcoef(out.numpy()[0, 0], sig.numpy()[0, 0])[0, 1]
        assert c > 0.95, fmt


@mp3
def test_mp3_preset_degrades_more_than_default():
    """The 'MP3' preset (sox compression -9 -> LAME VBR quality 9) must
    produce audibly heavier artifacts than the default 192 kbps CBR —
    regression for the preset's compression being silently ignored."""
    sig = AudioSignal(speech_like(6, 1.0)[None, None], 44100)
    ref = sig.numpy()
    default = sig.clone().apply_codec(format="mp3").numpy()
    preset = sig.clone().apply_codec(preset="MP3").numpy()
    err_default = np.abs(default - ref).mean()
    err_preset = np.abs(preset - ref).mean()
    assert err_preset > 1.5 * err_default, (err_preset, err_default)


def test_gsm_roundtrip_correlates():
    """GSM 06.10 via libgsm: decoded 8 kHz audio stays highly correlated
    with the input (it's a 13 kbps speech codec, not transparent)."""
    from audiotools_tpu.io import codecs

    if not codecs.gsm_available():
        pytest.skip("libgsm not available")
    t = np.arange(8000) / 8000
    x = (0.4 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)[None, :]
    y = codecs.gsm_roundtrip(x)
    assert y.shape == x.shape
    assert np.corrcoef(x[0], y[0])[0, 1] > 0.98


def test_apply_codec_gsm_preset():
    """The GSM-FR preset (reference effects.py:14-25) round-trips through
    resample-to-8k + libgsm + resample-back at the original length."""
    from audiotools_tpu.io import codecs

    if not codecs.gsm_available():
        pytest.skip("libgsm not available")
    from audiotools_tpu import AudioSignal

    sr = 16000
    t = np.arange(sr) / sr
    x = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    sig = AudioSignal(jnp.asarray(x[None, None, :]), sr)
    out = sig.clone().apply_codec(preset="GSM-FR")
    assert out.signal_length == sig.signal_length
    assert out.sample_rate == sr
    a = np.asarray(out.audio_data[0, 0])
    # telephone-band content survives; exact waveform does not
    assert np.corrcoef(x, a)[0, 1] > 0.9
    assert np.abs(a - x).max() > 1e-4  # codec actually altered the audio
