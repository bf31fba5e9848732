"""Differentiable phase-vocoder time stretching and pitch shifting.

The reference shells out to sox for these (CPU-only, non-differentiable:
`/root/reference/audiotools/core/effects.py:247-309`, and its own grad
tests assert no gradient flows, tests/core/test_grad.py:55-56). Here both
run on-device as batched XLA programs: STFT -> magnitude interpolation +
cumulative phase propagation (a vectorized cumsum, no sequential loop) ->
ISTFT, so they are fast on TPU *and* differentiable.
"""
import functools
from fractions import Fraction

import jax
import jax.numpy as jnp
import numpy as np

from . import fft as _fft
from . import resample as _resample

__all__ = ["phase_vocoder", "time_stretch", "pitch_shift"]


def _pv_phasor_prep(stft_data, i0, i1, frac):
    """Shared primal pieces of the phasor-form PV: interpolated
    magnitudes ``mag``, per-step unit rotations ``(ur, ui)`` (identity at
    silent bins, matching the angle path's ``atan2(0, 0) == 0``), and the
    first frame's unit seed phasor ``(cr, ci)``."""
    z0 = stft_data[..., i0]
    z1 = stft_data[..., i1]
    a0 = jnp.abs(z0)
    a1 = jnp.abs(z1)
    mag = (1.0 - frac) * a0 + frac * a1

    # unit phasor of each step's phase advance: z1 * conj(z0), normalized
    wr = jnp.real(z1) * jnp.real(z0) + jnp.imag(z1) * jnp.imag(z0)
    wi = jnp.imag(z1) * jnp.real(z0) - jnp.real(z1) * jnp.imag(z0)
    norm = a0 * a1
    safe = jnp.where(norm > 0.0, norm, 1.0)
    ur = jnp.where(norm > 0.0, wr / safe, 1.0)
    ui = jnp.where(norm > 0.0, wi / safe, 0.0)

    f0 = z0[..., 0]
    fa = jnp.abs(f0)
    fsafe = jnp.where(fa > 0.0, fa, 1.0)
    cr = jnp.where(fa > 0.0, jnp.real(f0) / fsafe, 1.0)
    ci = jnp.where(fa > 0.0, jnp.imag(f0) / fsafe, 0.0)
    return mag, ur, ui, cr, ci


@functools.lru_cache(maxsize=64)
def _fused_pv_diff(i0b: bytes, i1b: bytes, fracb: bytes, interpret: bool):
    """Differentiable fused PV for a fixed (static) step-index triple.

    Forward: the Pallas in-VMEM rotation scan
    (``pallas_kernels.phase_vocoder_fused``). Backward (``custom_vjp``,
    since ``pallas_call`` has no automatic VJP): with ``P_s`` the unit
    phasor track (``P_0 = c``, ``P_{s+1} = P_s u_s``) and output
    ``out_s = mag_s P_s``, the real-pair chain rule gives (complex
    cotangent notation, ``x̄ = dL/dx_r + i dL/dx_i``; products are
    R²-bilinear so ``ā = ȳ conj(b)``):

        Q_s = mag_s ḡ_s + conj(u_s) Q_{s+1}        (uses of P_s)
        ū_s = Q_{s+1} conj(P_s),   c̄ = Q_0,   m̄_s = Re(ḡ_s conj(P_s))

    Because every phasor is unit (|P| = |u| = 1 up to f32 roundoff), the
    reverse rotation recurrence collapses to a plain reversed cumsum:
    ``Q_s = P_s V_s`` with ``V_s = sum_{t>=s} w_t``,
    ``w_t = mag_t ḡ_t conj(P_t)``, so

        ū_s = u_s V_{s+1},   c̄ = c V_0.

    Backward cost engineering (tests/hw/hw_pv_bwd_parts.py): ``P`` is the
    forward kernel's scan carry, emitted as a residual
    (``with_phasor=True``) instead of re-scanned in the backward (the
    first cut's re-scan + relayouts were 7.5 of its 23 ms); the two
    reversed cumsums run as ONE ``lax.cumsum(reverse=True)`` over a
    stacked plane (the flip-flip evaluation costs 1.4x more); grads
    reach the spectrogram through ``jax.vjp`` of the pure-jnp prep
    (static gathers + normalization — XLA's static-index scatter-add
    transpose measures a cheap 0.8 ms), which is the same math the
    differentiable ``phasor`` formulation runs. Parity with that path's
    ``jax.grad`` is pinned in tests/core/test_stretch.py.
    """
    from . import pallas_kernels as _pk

    i0 = np.frombuffer(i0b, dtype=np.int32)
    i1 = np.frombuffer(i1b, dtype=np.int32)
    frac = np.frombuffer(fracb, dtype=np.float32)

    def primal(zr, zi):
        out = _pk.phase_vocoder_fused(
            jax.lax.complex(zr, zi), i0, i1, frac, interpret=interpret
        )
        return jnp.real(out), jnp.imag(out)

    @jax.custom_vjp
    def f(zr, zi):
        return primal(zr, zi)

    def fwd(zr, zi):
        out, (pr, pi) = _pk.phase_vocoder_fused(
            jax.lax.complex(zr, zi), i0, i1, frac, interpret=interpret,
            with_phasor=True,
        )
        return (jnp.real(out), jnp.imag(out)), (zr, zi, pr, pi)

    def bwd(res, cot):
        zr, zi, pr, pi = res
        gr, gi = cot

        def prep(r, i):
            return _pv_phasor_prep(jax.lax.complex(r, i), i0, i1, frac)

        (mag, ur, ui, cr, ci), prep_vjp = jax.vjp(prep, zr, zi)

        mbar = gr * pr + gi * pi  # Re(ḡ conj(P))
        wr = mag * mbar
        wi = mag * (gi * pr - gr * pi)
        # V_s = sum_{t>=s} w_t: one reverse cumsum over the stacked pair
        stacked = jnp.stack([wr, wi], axis=-2)  # (..., 2, n)
        v = jax.lax.cumsum(stacked, axis=stacked.ndim - 1, reverse=True)
        vr, vi = v[..., 0, :], v[..., 1, :]
        vr1 = jnp.concatenate([vr[..., 1:], jnp.zeros_like(vr[..., :1])], -1)
        vi1 = jnp.concatenate([vi[..., 1:], jnp.zeros_like(vi[..., :1])], -1)
        ubar_r = ur * vr1 - ui * vi1  # ū = u V_{s+1}
        ubar_i = ur * vi1 + ui * vr1
        cbar_r = cr * vr[..., 0] - ci * vi[..., 0]  # c̄ = c V_0
        cbar_i = cr * vi[..., 0] + ci * vr[..., 0]
        return prep_vjp((mbar, ubar_r, ubar_i, cbar_r, cbar_i))

    f.defvjp(fwd, bwd)
    return f


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
      angle path — the FORWARD fast path. Differentiable via a custom
      VJP (``_fused_pv_diff``; grad parity with the ``phasor``
      formulation pinned at 4.4e-5 on hardware): fwd+bwd measures
      26.1 ms vs phasor's 37.8 and angle's 13.6 (hw_pv_fused_grad.py),
      so when optimizing *through* the vocoder the default ``angle``
      evaluation remains the fastest; the fused path no longer falls
      off a differentiability cliff. ``"phasor_fused_interpret"`` runs
      the same kernels in interpreter mode for CPU tests.
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
        # scan never leaves VMEM (pallas_kernels.phase_vocoder_fused),
        # differentiable via the custom VJP in _fused_pv_diff
        T = stft_data.shape[-1]
        i0, i1, frac = _pv_indices(T, rate)
        f = _fused_pv_diff(
            i0.tobytes(), i1.tobytes(), frac.tobytes(),
            formulation.endswith("interpret"),
        )
        out_r, out_i = f(jnp.real(stft_data), jnp.imag(stft_data))
        return jax.lax.complex(out_r, out_i)
    if formulation != "phasor":
        raise ValueError(
            f"formulation must be 'angle', 'phasor', or 'phasor_fused', "
            f"got {formulation!r}"
        )
    F_bins, T = stft_data.shape[-2], stft_data.shape[-1]
    i0, i1, frac = _pv_indices(T, rate)

    # magnitudes, unit step rotations (identity at silent bins, matching
    # the angle formulation's atan2(0, 0) == 0), and the seed phasor
    mag_t, ur, ui, cr, ci = _pv_phasor_prep(stft_data, i0, i1, frac)

    # exclusive cumulative rotation, seeded with the first frame's phasor
    sr = jnp.concatenate([cr[..., None], ur[..., :-1]], axis=-1)
    si = jnp.concatenate([ci[..., None], ui[..., :-1]], axis=-1)

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
