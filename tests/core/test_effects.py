"""Effects tests (property/analytic style mirroring reference
tests/core/test_effects.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from tests.fixtures import ir_like, noise_like, speech_like


def _speech(seed=0, dur=2.0):
    return AudioSignal(speech_like(seed, dur)[None, None], 44100)


def _noise(seed=100, dur=2.0):
    return AudioSignal(noise_like(seed, dur)[None, None], 44100)


def _ir(seed=200):
    return AudioSignal(ir_like(seed)[None, None], 44100)


def test_normalize_hits_target():
    """normalize(db) hits target LUFS, batched per-item dbs
    (reference tests/core/test_effects.py:9-33)."""
    batch = AudioSignal(
        np.stack([speech_like(i, 2.0) for i in range(4)])[:, None], 44100
    )
    dbs = np.array([-20.0, -24.0, -30.0, -16.0], dtype=np.float32)
    batch.normalize(jnp.asarray(dbs))
    out = np.asarray(batch.loudness())
    assert np.allclose(out, dbs, atol=0.1)


def test_volume_change():
    sig = _speech()
    before = float(sig.loudness()[0])
    sig.volume_change(-6.0)
    after = float(sig.loudness()[0])
    assert abs((after - before) + 6.0) < 0.2


def test_mix_hits_snr():
    """mix(snr) hits target SNR within 1 dB
    (reference tests/core/test_effects.py:51-83)."""
    for snr in [0.0, 10.0, 20.0]:
        spk = _speech(0, 2.0)
        nz = _noise(100, 2.0)
        spk_l = float(spk.loudness()[0])
        mixed = spk.clone().mix(nz.clone(), snr=snr)
        residual = AudioSignal(mixed.audio_data - _speech(0, 2.0).audio_data, 44100)
        achieved = spk_l - float(residual.loudness()[0])
        assert abs(achieved - snr) < 1.0


def test_mix_with_eq():
    spk = _speech()
    nz = _noise()
    out = spk.clone().mix(nz.clone(), snr=10, other_eq=np.zeros((1, 6), np.float32))
    assert out.shape == spk.shape


def test_convolve_with_delta_is_identity():
    sig = _speech()
    delta = np.zeros((1, 1, sig.signal_length), np.float32)
    delta[0, 0, 0] = 1.0
    out = sig.clone().convolve(AudioSignal(delta, 44100))
    assert np.abs(out.numpy() - sig.numpy()).max() < 1e-4


def test_convolve_matmul_operator():
    sig = _speech()
    ir = _ir()
    a = sig.clone().convolve(ir.clone())
    b = sig.clone() @ ir.clone()
    assert np.allclose(a.numpy(), b.numpy(), atol=1e-6)


def test_convolve_start_at_max_removes_delay():
    sig = _speech()
    ir_delayed = np.zeros((1, 1, 44100), np.float32)
    ir_delayed[0, 0, 1000] = 1.0  # pure delayed delta
    out = sig.clone().convolve(AudioSignal(ir_delayed, 44100), start_at_max=True)
    # rolling over the max means no delay is induced
    assert np.abs(out.numpy() - sig.numpy()).max() < 1e-4


def test_apply_ir_with_drr_and_eq():
    sig = _speech()
    ir = _ir()
    out = sig.clone().apply_ir(ir.clone(), drr=15, ir_eq=np.zeros(6, np.float32))
    assert out.shape == sig.shape
    out2 = sig.clone().apply_ir(ir.clone(), use_original_phase=True)
    assert out2.shape == sig.shape


def test_ensure_max_of_audio():
    sig = AudioSignal(np.ones((1, 1, 1000), np.float32) * 3.0, 44100)
    sig.ensure_max_of_audio()
    assert np.abs(sig.numpy()).max() <= 1.0 + 1e-6
    quiet = AudioSignal(np.ones((1, 1, 1000), np.float32) * 0.1, 44100)
    quiet.ensure_max_of_audio()
    assert np.abs(quiet.numpy() - 0.1).max() < 1e-6


def test_clip_distortion():
    sig = _speech()
    out = sig.clone().clip_distortion(0.5)
    assert np.abs(out.numpy()).max() < np.abs(sig.numpy()).max()


def test_quantization_levels():
    sig = _speech()
    for ch in [8, 32, 128]:
        out = sig.clone().quantization(ch)
        uniq = np.unique(np.round(out.numpy(), 6))
        assert len(uniq) <= ch + 1


def test_mulaw_quantization_levels():
    sig = _speech()
    for ch in [8, 32, 128]:
        out = sig.clone().mulaw_quantization(ch)
        uniq = np.unique(np.round(out.numpy(), 6))
        assert len(uniq) <= ch + 1


def test_apply_codec_native():
    from audiotools_tpu.io import codecs

    sig = _speech()
    out = sig.clone().apply_codec(preset="8-bit")
    assert out.shape == sig.shape
    if codecs.mp3_available():
        out = sig.clone().apply_codec(preset="MP3")
        assert out.shape == sig.shape
        # codec round trip is lossy but should stay correlated with input
        a = out.numpy().ravel()
        b = sig.numpy().ravel()
        corr = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
        assert corr > 0.8
    else:
        with pytest.raises(RuntimeError):
            sig.clone().apply_codec(preset="MP3")
    with pytest.raises(ValueError):
        sig.clone().apply_codec(preset="nope")


def test_mel_filterbank_sums_to_signal():
    sig = _speech()
    fbank = sig.mel_filterbank(6)
    assert np.abs(np.asarray(fbank).sum(-1) - sig.numpy()).max() < 1e-5


def test_equalizer_shapes():
    sig = _speech()
    out = sig.clone().equalizer(np.zeros(6, np.float32))
    assert np.abs(out.numpy() - sig.numpy()).max() < 1e-5
    out = sig.clone().equalizer(np.zeros((1, 6), np.float32))
    assert out.shape == sig.shape


def test_measure_and_alter_drr():
    ir = _ir()
    drr0 = float(np.asarray(ir.measure_drr())[0, 0])
    for target in [5.0, 15.0, 25.0]:
        altered = ir.clone().alter_drr(target)
        achieved = float(np.asarray(altered.measure_drr())[0, 0])
        assert abs(achieved - target) < 0.5


def test_time_stretch_length_and_content():
    sig = AudioSignal.wave(440, 2.0, 44100)
    for factor in [0.8, 1.0, 1.25]:
        out = sig.clone().time_stretch(factor)
        assert out.signal_length == int(round(sig.signal_length / factor))
        # dominant frequency unchanged
        spec = np.abs(np.fft.rfft(out.numpy()[0, 0]))
        f0 = np.fft.rfftfreq(out.signal_length, 1 / 44100)[spec.argmax()]
        assert abs(f0 - 440) < 10


def test_pitch_shift_moves_f0():
    sig = AudioSignal.wave(440, 2.0, 44100)
    for n in [-5, 4, 7]:
        out = sig.clone().pitch_shift(n)
        assert out.signal_length == sig.signal_length
        spec = np.abs(np.fft.rfft(out.numpy()[0, 0]))
        f0 = np.fft.rfftfreq(out.signal_length, 1 / 44100)[spec.argmax()]
        expected = 440 * 2 ** (n / 12)
        assert abs(f0 - expected) / expected < 0.03


def test_preemphasis_attenuates_lows():
    sig = AudioSignal.wave(100, 1.0, 44100)
    out = sig.clone().preemphasis(0.99)
    assert np.abs(out.numpy()).max() < 0.5 * np.abs(sig.numpy()).max()


def test_pitch_shift_bf16_synthesis_close():
    """Single-pass-bf16 synthesis iDFT (synthesis_method="matmul_bf16")
    must stay within bf16 rounding of the full-precision vocoder output;
    the analysis side stays at 3-pass precision so no phase random-walk
    (see ops/stretch.py docstring + hw_pv_mm.py)."""
    from audiotools_tpu.ops import stretch as stretch_ops

    sig = AudioSignal.wave(440, 1.0, 44100)
    a = sig.audio_data
    full = np.asarray(stretch_ops.pitch_shift(a, 2.0, 44100))
    fast = np.asarray(
        stretch_ops.pitch_shift(a, 2.0, 44100, synthesis_method="matmul_bf16")
    )
    rel = np.abs(fast - full).max() / np.abs(full).max()
    assert rel < 2e-2, rel
