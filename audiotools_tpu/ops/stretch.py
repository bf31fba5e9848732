"""Differentiable phase-vocoder time stretching and pitch shifting.

The reference shells out to sox for these (CPU-only, non-differentiable:
`/root/reference/audiotools/core/effects.py:247-309`, and its own grad
tests assert no gradient flows, tests/core/test_grad.py:55-56). Here both
run on-device as batched XLA programs: STFT -> magnitude interpolation +
cumulative phase propagation (a vectorized cumsum, no sequential loop) ->
ISTFT, so they are fast on TPU *and* differentiable.
"""
from fractions import Fraction

import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from . import resample as _resample

__all__ = ["phase_vocoder", "time_stretch", "pitch_shift"]


def phase_vocoder(
    stft_data: jnp.ndarray, rate: float, hop_length: int, window_length: int
) -> jnp.ndarray:
    """Stretch ``(..., F, T)`` complex STFT frames by ``rate``.

    ``rate > 1`` speeds up (fewer output frames). Phase propagation is the
    classic Flanagan/Laroche algorithm, vectorized: per-step phase
    deviations are computed with gathers and integrated with one cumsum.
    """
    F_bins, T = stft_data.shape[-2], stft_data.shape[-1]
    n_steps = int(np.ceil(T / rate))
    steps = np.arange(n_steps) * rate
    i0 = np.minimum(np.floor(steps).astype(np.int32), T - 1)
    i1 = np.minimum(i0 + 1, T - 1)
    frac = (steps - i0).astype(np.float32)

    mag = jnp.abs(stft_data)
    phase = jnp.angle(stft_data)

    mag_t = (1.0 - frac) * mag[..., i0] + frac * mag[..., i1]

    # expected phase advance per hop, per bin
    phi_advance = (
        2.0 * np.pi * hop_length * np.arange(F_bins, dtype=np.float32) / window_length
    )[:, None]

    dphase = phase[..., i1] - phase[..., i0] - phi_advance
    dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))
    step_advance = phi_advance + dphase  # (..., F, n_steps)
    # Wrap each step to its principal value before integrating: exp(i*acc)
    # is unchanged (the wrap shifts acc by multiples of 2*pi), but the
    # float32 cumsum stays O(pi*n) instead of O(hop*f*n) — the unwrapped
    # phi_advance reaches ~5e4 rad at high bins over a 5 s signal, where
    # f32 ulps are ~4e-3 rad (measured 1e-3 waveform error vs the float64
    # oracle in tests/parity; wrapped: ~2e-6).
    step_advance = step_advance - 2.0 * np.pi * jnp.round(
        step_advance / (2.0 * np.pi)
    )

    # integrated phase: start at the first frame's phase, then accumulate
    acc = jnp.cumsum(step_advance, axis=-1)
    phase_out = phase[..., i0[:1]] + jnp.concatenate(
        [jnp.zeros_like(acc[..., :1]), acc[..., :-1]], axis=-1
    )

    return mag_t * jnp.exp(1j * phase_out)


def time_stretch(
    audio: jnp.ndarray,
    factor: float,
    window_length: int = 2048,
    hop_length: int = None,
    method: str = "matmul",
    synthesis_method: str = None,
) -> jnp.ndarray:
    """Stretch ``(..., T)`` audio in time by ``factor`` (sox ``tempo``
    semantics: factor > 1 is faster/shorter). Output length is
    ``round(T / factor)``.

    ``method`` selects the *analysis* STFT evaluation; the default MXU
    matmul path is ~1.5x faster on TPU at ~1e-5 accuracy — far below the
    phase vocoder's own approximation error. Analysis precision matters:
    phase errors random-walk through the vocoder's ~T/hop-frame cumsum,
    so the analysis DFT must stay at >= 3-pass-bf16 accuracy (the bf16
    analysis DFT was measured at 5.75e-02 output error, hw_pv_mm.py).

    ``synthesis_method`` (default: same as ``method``) selects the
    *inverse* evaluation independently. The synthesis side has no phase
    accumulation — a single-pass bf16 iDFT only perturbs the output
    waveform ~3e-3 (~0.026 dB), so ``"matmul_bf16"`` is a safe fast
    option for augmentation pipelines.
    """
    if hop_length is None:
        hop_length = window_length // 4
    if synthesis_method is None:
        synthesis_method = method
    T = audio.shape[-1]
    out_len = int(round(T / factor))
    spec = _fft.stft(audio, window_length, hop_length, "hann", method=method)
    stretched = phase_vocoder(spec, factor, hop_length, window_length)
    return _fft.istft(
        stretched, window_length, hop_length, "hann", length=out_len,
        method=synthesis_method,
    )


def pitch_shift(
    audio: jnp.ndarray,
    n_semitones: float,
    sample_rate: int,
    window_length: int = 2048,
    hop_length: int = None,
    method: str = "matmul",
    synthesis_method: str = None,
) -> jnp.ndarray:
    """Shift pitch by ``n_semitones`` keeping duration (sox ``pitch``
    semantics): a time stretch by ``2**(-n/12)`` composed with a resample
    by the same ratio. The two commute, so the stretch (the expensive
    STFT/vocoder leg) always runs on whichever side of the resample has
    FEWER samples: resample-first for up-shifts (``rate < 1`` shrinks the
    signal), stretch-first for down-shifts."""
    T = audio.shape[-1]
    rate = 2.0 ** (-float(n_semitones) / 12.0)
    # Rational approximation of the resample ratio: the smallest
    # denominator that keeps the pitch-ratio error under 2e-5
    # (< 0.035 cents). Small denominators mean small polyphase banks
    # (e.g. +/-2 semitones -> 49/55); some intervals need larger ones
    # (e.g. +/-7 semitones, whose best small fraction 2/3 is ~2 cents off).
    for cap in (60, 125, 250, 500, 1000, 5000):
        frac = Fraction(rate).limit_denominator(cap)
        if abs(float(frac) - rate) / rate < 2e-5:
            break
    old_sr, new_sr = frac.denominator, frac.numerator
    if rate < 1.0:
        # Pitch up: resample shrinks by `rate`; vocoder runs on the
        # short signal (~11% fewer STFT samples at +2 semitones).
        shrunk = _resample.resample(audio, old_sr, new_sr)
        out = time_stretch(
            shrunk, rate, window_length, hop_length, method, synthesis_method
        )
    else:
        stretched = time_stretch(
            audio, rate, window_length, hop_length, method, synthesis_method
        )
        out = _resample.resample(stretched, old_sr, new_sr)
    if out.shape[-1] < T:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, T - out.shape[-1])])
    return out[..., :T]
