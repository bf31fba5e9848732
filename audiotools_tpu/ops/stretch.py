"""Differentiable phase-vocoder time stretching and pitch shifting.

The reference shells out to sox for these (CPU-only, non-differentiable:
`/root/reference/audiotools/core/effects.py:247-309`, and its own grad
tests assert no gradient flows, tests/core/test_grad.py:55-56). Here both
run on-device as batched XLA programs: STFT -> magnitude interpolation +
cumulative phase propagation (a vectorized cumsum, no sequential loop) ->
ISTFT, so they are fast on TPU *and* differentiable.
"""
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from . import resample as _resample

__all__ = ["phase_vocoder", "time_stretch", "pitch_shift"]


def _pv_indices(T: int, rate: float):
    n_steps = int(np.ceil(T / rate))
    steps = np.arange(n_steps) * rate
    i0 = np.minimum(np.floor(steps).astype(np.int32), T - 1)
    i1 = np.minimum(i0 + 1, T - 1)
    frac = (steps - i0).astype(np.float32)
    return i0, i1, frac


def phase_vocoder(
    stft_data: jnp.ndarray,
    rate: float,
    hop_length: int,
    window_length: int,
    formulation: str = "angle",
) -> jnp.ndarray:
    """Stretch ``(..., F, T)`` complex STFT frames by ``rate``.

    ``rate > 1`` speeds up (fewer output frames). Phase propagation is
    the classic Flanagan/Laroche algorithm; two evaluations are
    available (hw_pv_phasor.py, v5e, b64 bench shapes). They agree for
    every bin whose adjacent analysis frames are nonzero; at a
    transient zero (one frame silent, its neighbor not) the conventions
    differ — the phasor path contributes an identity rotation while the
    angle path treats atan2(0, 0) == 0 as a real phase — which is
    acceptable because phase is unobservable at a zero frame, but the
    step advance that propagates to later frames of that bin differs:

    - ``"angle"`` (default): the textbook real-angle evaluation (atan2,
      principal-value wraps, one single-plane cumsum, cos/sin), with the
      expected per-hop advance reduced mod 2*pi by exact integer
      arithmetic — 6.3 ms core / 20.8 ms full pitch-shift leg, 2e-5 vs
      the float64 oracle at 431 steps.
    - ``"phasor_fused"``: the phasor evaluation as one Pallas kernel —
      the rotation scan never leaves VMEM (time on sublanes, rows on
      lanes; ``pallas_kernels.phase_vocoder_fused``). v5e-measured
      2.77 ms core vs angle's 5.96 (hw_pv_fused.py), 2.5e-5 rel vs the
      angle path. NOT differentiable (``pallas_call`` has no VJP) —
      the augmentation fast path; use ``"angle"``/``"phasor"`` under
      ``jax.grad``. ``"phasor_fused_interpret"`` runs the same kernel
      in interpreter mode for CPU tests.
    - ``"phasor"``: the synthesis phase only ever enters the output
      through ``exp(i*phase)``, and phase *wrapping* is invisible in the
      complex domain — ``exp(i*(phi + wrap(dphi))) ==
      exp(i*(angle(z1) - angle(z0)))`` because the expected-advance term
      cancels and wraps shift by multiples of 2*pi. So the whole
      angle -> wrap -> cumsum -> cos/sin chain collapses to a cumulative
      product of the unit cross-spectra ``u_k = z1*conj(z0)/|z1*conj(z0)|``
      (a 2-D rotation scan with NO transcendentals). The tree-ordered
      scan tracks the float64 oracle ~4x closer (5e-6: log-depth rounding
      growth vs the cumsum's random walk) but moves twice the HBM bytes
      (two planes), measuring 12.9 ms core / 23.0 ms full leg — the
      high-precision option, not the default.
    """
    if formulation == "angle":
        return _phase_vocoder_angle(stft_data, rate, hop_length, window_length)
    if formulation in ("phasor_fused", "phasor_fused_interpret"):
        # single-pass Pallas evaluation of the phasor form: the rotation
        # scan never leaves VMEM (pallas_kernels.phase_vocoder_fused)
        from . import pallas_kernels as _pk

        T = stft_data.shape[-1]
        i0, i1, frac = _pv_indices(T, rate)
        return _pk.phase_vocoder_fused(
            stft_data, i0, i1, frac,
            interpret=formulation.endswith("interpret"),
        )
    if formulation != "phasor":
        raise ValueError(
            f"formulation must be 'angle', 'phasor', or 'phasor_fused', "
            f"got {formulation!r}"
        )
    F_bins, T = stft_data.shape[-2], stft_data.shape[-1]
    i0, i1, frac = _pv_indices(T, rate)

    z0 = stft_data[..., i0]
    z1 = stft_data[..., i1]
    a0 = jnp.abs(z0)
    a1 = jnp.abs(z1)
    mag_t = (1.0 - frac) * a0 + frac * a1

    # unit phasor of each step's phase advance: z1 * conj(z0), normalized.
    # A zero product (silent bin) contributes the identity rotation, which
    # matches the angle formulation (atan2(0, 0) == 0).
    wr = jnp.real(z1) * jnp.real(z0) + jnp.imag(z1) * jnp.imag(z0)
    wi = jnp.imag(z1) * jnp.real(z0) - jnp.real(z1) * jnp.imag(z0)
    norm = a0 * a1
    safe = jnp.where(norm > 0.0, norm, 1.0)
    ur = jnp.where(norm > 0.0, wr / safe, 1.0)
    ui = jnp.where(norm > 0.0, wi / safe, 0.0)

    # exclusive cumulative rotation, seeded with the first frame's phasor
    f0 = z0[..., :1]
    fa = jnp.abs(f0)
    fsafe = jnp.where(fa > 0.0, fa, 1.0)
    sr = jnp.concatenate(
        [jnp.where(fa > 0.0, jnp.real(f0) / fsafe, 1.0), ur[..., :-1]], axis=-1
    )
    si = jnp.concatenate(
        [jnp.where(fa > 0.0, jnp.imag(f0) / fsafe, 0.0), ui[..., :-1]], axis=-1
    )

    def rot(a, b):
        (ar, ai), (br, bi) = a, b
        return ar * br - ai * bi, ar * bi + ai * br

    pr, pi = jax.lax.associative_scan((rot), (sr, si), axis=-1)
    return jax.lax.complex(mag_t * pr, mag_t * pi)


def _phase_vocoder_angle(
    stft_data: jnp.ndarray, rate: float, hop_length: int, window_length: int
) -> jnp.ndarray:
    """Real-angle evaluation: per-step phase deviations via gathers and
    atan2, integrated with one cumsum."""
    F_bins, T = stft_data.shape[-2], stft_data.shape[-1]
    i0, i1, frac = _pv_indices(T, rate)

    mag = jnp.abs(stft_data)
    phase = jnp.angle(stft_data)

    mag_t = (1.0 - frac) * mag[..., i0] + frac * mag[..., i1]

    # Expected phase advance per hop, per bin, reduced mod 2*pi with EXACT
    # integer arithmetic. The unreduced ramp reaches ~1.6e3 rad at high
    # bins where f32 ulps are ~1e-4 rad; since the same phi enters every
    # step's deviation, that representation error accumulates LINEARLY
    # through the cumsum (measured 5e-3 vs the float64 oracle at 431
    # steps; exact-mod: 2e-5). The wrapped steps are mathematically
    # unchanged (phi shifts by multiples of 2*pi drop out of both wraps).
    phi_advance = (
        ((hop_length * np.arange(F_bins, dtype=np.int64)) % window_length).astype(
            np.float32
        )
        * (2.0 * np.pi / window_length)
    )[:, None]

    dphase = phase[..., i1] - phase[..., i0] - phi_advance
    dphase = dphase - 2.0 * np.pi * jnp.round(dphase / (2.0 * np.pi))
    step_advance = phi_advance + dphase  # (..., F, n_steps)
    # Wrap each step to its principal value before integrating: exp(i*acc)
    # is unchanged (the wrap shifts acc by multiples of 2*pi), and the
    # float32 cumsum stays O(pi*n) instead of growing with the unwrapped
    # phase ramp, so additions round at ~2e-7 instead of ~4e-3 rad.
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
    pv_formulation: str = "angle",
) -> jnp.ndarray:
    """Stretch ``(..., T)`` audio in time by ``factor`` (sox ``tempo``
    semantics: factor > 1 is faster/shorter). Output length is
    ``round(T / factor)``.

    ``pv_formulation`` selects the phase-propagation evaluation (see
    ``phase_vocoder``: default ``"angle"`` is ~2 ms/leg faster at 2e-5
    accuracy; ``"phasor"`` is transcendental-free and 4x more accurate).

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
    stretched = phase_vocoder(
        spec, factor, hop_length, window_length, formulation=pv_formulation
    )
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
    pv_formulation: str = "angle",
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
            shrunk, rate, window_length, hop_length, method, synthesis_method,
            pv_formulation,
        )
    else:
        stretched = time_stretch(
            audio, rate, window_length, hop_length, method, synthesis_method,
            pv_formulation,
        )
        out = _resample.resample(stretched, old_sr, new_sr)
    if out.shape[-1] < T:
        out = jnp.pad(out, [(0, 0)] * (out.ndim - 1) + [(0, T - out.shape[-1])])
    return out[..., :T]
