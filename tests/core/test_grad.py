"""Differentiability audit: gradient flows through (almost) every signal
op (mirror of reference tests/core/test_grad.py:11-91).

A notable improvement over the reference: ``pitch_shift`` and
``time_stretch`` ARE differentiable here (on-device phase vocoder; the
reference's sox paths are not, test_grad.py:55-56). ``apply_codec`` with
compressed presets and ``loudness``'s cached value remain host-side /
non-differentiable by design.
"""
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from tests.fixtures import ir_like, speech_like

SR = 44100


def _signal(x):
    return AudioSignal(x, SR)


def _other():
    return AudioSignal(speech_like(1, 0.5)[None, None], SR)


def _ir():
    return AudioSignal(ir_like(200)[None, None], SR)


CASES = [
    ("mix", True, lambda s: s.mix(_other(), snr=0)),
    ("convolve", True, lambda s: s.convolve(_ir())),
    (
        "apply_ir",
        True,
        lambda s: s.apply_ir(
            _ir(), drr=0.1, ir_eq=jnp.asarray(np.random.RandomState(0).randn(6).astype(np.float32))
        ),
    ),
    ("ensure_max_of_audio", True, lambda s: s.ensure_max_of_audio()),
    ("normalize", True, lambda s: s.normalize()),
    ("volume_change", True, lambda s: s.volume_change(1.0)),
    # differentiable here, unlike the reference's sox paths
    ("pitch_shift", True, lambda s: s.pitch_shift(1)),
    ("time_stretch", True, lambda s: s.time_stretch(1.25)),
    ("equalizer", True, lambda s: s.equalizer(jnp.asarray(np.random.RandomState(1).randn(6).astype(np.float32)))),
    ("clip_distortion", True, lambda s: s.clip_distortion(0.5)),
    ("quantization", True, lambda s: s.quantization(8)),
    ("mulaw_quantization", True, lambda s: s.mulaw_quantization(8)),
    ("resample", True, lambda s: s.resample(16000)),
    ("low_pass", True, lambda s: s.low_pass(1000)),
    ("high_pass", True, lambda s: s.high_pass(1000)),
    ("to_mono", True, lambda s: s.to_mono()),
    ("zero_pad", True, lambda s: s.zero_pad(10, 10)),
    ("magnitude", True, lambda s: s.magnitude),
    ("phase", True, lambda s: s.phase),
    ("log_magnitude", True, lambda s: s.log_magnitude()),
    ("stft", True, lambda s: s.stft()),
    ("mel_spectrogram", True, lambda s: s.mel_spectrogram()),
    ("mfcc", True, lambda s: s.mfcc()),
    ("zero_pad_to", True, lambda s: s.zero_pad_to(100000)),
    ("truncate_samples", True, lambda s: s.truncate_samples(1000)),
    ("corrupt_phase", True, lambda s: s.corrupt_phase(0.5, key=jax.random.PRNGKey(0))),
    ("shift_phase", True, lambda s: s.shift_phase(1.0)),
    ("mask_low_magnitudes", True, lambda s: s.mask_low_magnitudes(0.0)),
    ("mask_frequencies", True, lambda s: s.mask_frequencies(100, 1000)),
    ("mask_timesteps", True, lambda s: s.mask_timesteps(0.1, 0.5)),
    ("preemphasis", True, lambda s: s.preemphasis()),
    ("loudness_op", True, lambda s: s.loudness()),
    ("add", True, lambda s: s + _other()),
    ("sub", True, lambda s: s - _other()),
    ("mul", True, lambda s: s * 0.5),
    ("collect_windows", True, lambda s: s.collect_windows(0.1, 0.05)),
]


@pytest.mark.parametrize("name,expect_grad,op", CASES, ids=[c[0] for c in CASES])
def test_grad_flows(name, expect_grad, op):
    # 0.5 s is the shortest signal that keeps every case in-range
    # (mask_timesteps' [0.1, 0.5) s window, collect_windows(0.1, 0.05));
    # grad flow itself is length-independent, and the scan-heavy ops
    # (pitch_shift, resample) are execution-bound on this 1-core box.
    x = speech_like(0, 0.5)[None, None]

    def loss(audio):
        result = op(_signal(audio))
        if isinstance(result, AudioSignal):
            if result.stft_data is not None and result._audio_data is None:
                result.istft()
            val = result.audio_data
            if val is None:
                val = result.stft_data
        else:
            val = result
        if jnp.iscomplexobj(val):
            return jnp.sum(jnp.real(val))
        return jnp.sum(val)

    g = jax.grad(loss)(jnp.asarray(x))
    has_grad = bool(np.abs(np.asarray(g)).max() > 0)
    assert np.isfinite(np.asarray(g)).all(), f"{name}: non-finite grads"
    assert has_grad == expect_grad, f"{name}: grad flow mismatch"


def test_straight_through_gradient_is_identity():
    """quantization/mulaw use straight-through estimation: gradient of
    sum(output) wrt input should be exactly ones (reference
    effects.py:488-489)."""
    x = jnp.asarray(speech_like(0, 0.25)[None, None])
    for op in (lambda s: s.quantization(8), lambda s: s.mulaw_quantization(8)):
        g = jax.grad(lambda a: jnp.sum(op(AudioSignal(a, SR)).audio_data))(x)
        assert np.allclose(np.asarray(g), 1.0)
