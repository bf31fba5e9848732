"""ITU-R BS.1770-4 K-weighted gated loudness, as pure jittable functions.

Mirrors the reference's tensorized pyloudnorm meter
(`/root/reference/audiotools/core/loudness.py`), with both of its paths:

* exact IIR biquad cascade — here evaluated by block state-space
  lifting (``filters.iir_cascade_blocked``: MXU Toeplitz matmuls + a
  block-state scan) instead of a CPU ``lfilter`` (loudness.py:102-126);
* 512-tap truncated-FIR approximation via FFT convolution
  (loudness.py:54-100) — on TPU both stages fuse into a single causal FFT
  conv with the composed kernel.

K-weighting coefficients are designed natively from the RBJ biquad
formulas with analog parameters FITTED to BS.1770-4's published 48 kHz
coefficient table (high-shelf G=3.99979529 dB, Q=0.707315703,
fc=1500.51207 Hz; high-pass Q=0.50032685, fc=38.13546889 Hz — see
``design_filters``; the fit reproduces the table to ~2e-5 and scales the
bilinear design to any sample rate), replacing the reference's import of
``pyloudnorm.Meter._filters`` (loudness.py:253-260).

Gating follows BS.1770-4 eqs. 4-7 exactly as the reference implements them
(loudness.py:176-247): 400 ms blocks at 75% overlap (ceil block count with
zero padding, julius ``unfold`` semantics), absolute gate at -70 LKFS, then
relative gate at (ungated mean - 10).
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .filters import causal_fft_conv1d, fir_from_biquad, iir_cascade_blocked

__all__ = [
    "design_filters",
    "k_weighting_coefficients",
    "apply_k_weighting",
    "integrated_loudness",
    "set_fast_meter",
    "GAIN_FACTOR",
    "MIN_LOUDNESS",
]

GAIN_FACTOR = np.log(10) / 20
"""Gain factor for converting between amplitude and decibels
(reference effects.py:12)."""

_METER_DEFAULTS = {"use_fir": False, "conv_method": "fft", "zeros": 512}


def set_fast_meter(enable: bool = True, zeros: int = 512):
    """Flip the process-wide default loudness meter implementation.

    ``enable=True`` selects a ``zeros``-tap composed FIR evaluated by the
    Pallas MXU kernel for every ``loudness()`` call that doesn't pass
    explicit options (mix/normalize/VolumeNorm all route through it).
    First Pallas compile costs ~2 min on the tunneled TPU.

    The default 512 taps match the reference's own GPU meter (a 512-tap
    truncated FIR, reference loudness.py:54-100) and its accuracy
    envelope: ~7e-5 dB on broadband programme material, but up to
    0.63 dB on a pure 25 Hz sine (the high-pass stage's truncated tail —
    see tests/core/test_loudness_compliance.py).

    Since the exact cascade moved to block state-space lifting
    (``filters.iir_cascade_blocked``), the FIR mode is a PARITY mode,
    not a fast path: v5e batch-64 x 5 s meter e2e is 1.44 ms exact vs
    2.86 ms at 512 taps (tests/hw/hw_iir_blocked.py). Keep the default
    ``enable=False`` unless bit-level agreement with the reference GPU
    meter is the goal.
    """
    global _METER_DEFAULTS
    if enable:
        _METER_DEFAULTS = {"use_fir": True, "conv_method": "pallas", "zeros": zeros}
    else:
        _METER_DEFAULTS = {"use_fir": False, "conv_method": "fft", "zeros": 512}

MIN_LOUDNESS = -70.0
"""Minimum loudness (reference loudness.py:265)."""

# channel gains G: L, R, C, Ls, Rs (reference loudness.py:49)
CHANNEL_GAINS = np.array([1.0, 1.0, 1.0, 1.41, 1.41], dtype=np.float32)


def _rbj(filter_type: str, G: float, Q: float, fc: float, rate: float):
    """RBJ audio-EQ-cookbook biquad design (pyloudnorm's formulas)."""
    A = 10.0 ** (G / 40.0)
    w0 = 2.0 * np.pi * (fc / rate)
    alpha = np.sin(w0) / (2.0 * Q)
    cw = np.cos(w0)

    if filter_type == "high_shelf":
        b0 = A * ((A + 1) + (A - 1) * cw + 2 * np.sqrt(A) * alpha)
        b1 = -2 * A * ((A - 1) + (A + 1) * cw)
        b2 = A * ((A + 1) + (A - 1) * cw - 2 * np.sqrt(A) * alpha)
        a0 = (A + 1) - (A - 1) * cw + 2 * np.sqrt(A) * alpha
        a1 = 2 * ((A - 1) - (A + 1) * cw)
        a2 = (A + 1) - (A - 1) * cw - 2 * np.sqrt(A) * alpha
    elif filter_type == "high_pass":
        b0 = (1 + cw) / 2
        b1 = -(1 + cw)
        b2 = (1 + cw) / 2
        a0 = 1 + alpha
        a1 = -2 * cw
        a2 = 1 - alpha
    elif filter_type == "peaking":
        b0 = 1 + alpha * A
        b1 = -2 * cw
        b2 = 1 - alpha * A
        a0 = 1 + alpha / A
        a1 = -2 * cw
        a2 = 1 - alpha / A
    elif filter_type == "low_shelf":
        b0 = A * ((A + 1) - (A - 1) * cw + 2 * np.sqrt(A) * alpha)
        b1 = 2 * A * ((A - 1) - (A + 1) * cw)
        b2 = A * ((A + 1) - (A - 1) * cw - 2 * np.sqrt(A) * alpha)
        a0 = (A + 1) + (A - 1) * cw + 2 * np.sqrt(A) * alpha
        a1 = -2 * ((A - 1) + (A + 1) * cw)
        a2 = (A + 1) + (A - 1) * cw - 2 * np.sqrt(A) * alpha
    else:
        raise ValueError(f"Unknown filter type {filter_type}")

    b = np.array([b0, b1, b2], dtype=np.float64) / a0
    a = np.array([a0, a1, a2], dtype=np.float64) / a0
    return b, a


@functools.lru_cache(maxsize=None)
def design_filters(rate: int, filter_class: str = "K-weighting"):
    """Weighting-filter cascade for a sample rate.

    Returns a tuple of ``(b, a, passband_gain)`` stages, matching the
    filter classes pyloudnorm exposes (reference loudness.py:253-260).
    """
    if filter_class == "K-weighting":
        # RBJ shelf/high-pass parameters fitted so the bilinear design
        # reproduces BS.1770-4's published 48 kHz coefficient table to
        # ~2e-5 (sub-millidB), while scaling correctly to any sample rate.
        shelf = _rbj("high_shelf", 3.99979529, 0.707315703, 1500.51207, rate)
        hp_b, hp_a = _rbj("high_pass", 0.0, 0.50032685, 38.13546889, rate)
        # BS.1770 specifies the high-pass numerator as exactly [1, -2, 1]
        # (the stage is not normalized to unit passband gain).
        hp_b = np.array([1.0, -2.0, 1.0])
        stages = [(shelf, 1.0), ((hp_b, hp_a), 1.0)]
    elif filter_class == "Fenton/Lee 1":
        stages = [
            (_rbj("high_shelf", 5.0, 1 / np.sqrt(2.0), 1500.0, rate), 1.0),
            (_rbj("high_pass", 0.0, 0.5, 130.0, rate), 1.0),
            (_rbj("peaking", 0.0, 1 / np.sqrt(2.0), 500.0, rate), 1.0),
        ]
    elif filter_class == "Fenton/Lee 2":
        stages = [
            (_rbj("high_shelf", 5.0, 1 / np.sqrt(2.0), 1500.0, rate), 1.0),
            (_rbj("high_pass", 0.0, 0.5, 130.0, rate), 1.0),
        ]
    elif filter_class == "Dash et al.":
        stages = [
            (_rbj("high_pass", 0.0, 0.375, 149.0, rate), 1.0),
            (_rbj("peaking", -13.24, 1 / np.sqrt(2.0), 1000.0, rate), 1.0),
        ]
    else:
        raise ValueError(f"Unknown filter class {filter_class}")
    return tuple(((b, a), g) for (b, a), g in stages)


def k_weighting_coefficients(rate: int):
    """K-weighting ``(b, a)`` per stage — BS.1770 table reproduction."""
    return [ba for ba, _ in design_filters(rate, "K-weighting")]


@functools.lru_cache(maxsize=None)
def _composed_fir(rate: int, filter_class: str, zeros: int):
    """Compose all truncated stage FIRs into one causal kernel (host-side).

    The reference applies each 512-tap stage FIR sequentially with causal
    alignment and truncation to the signal length (loudness.py:89-96); since
    the convs are causal, composing the kernels first is mathematically
    identical and halves the FFT work.
    """
    stages = design_filters(rate, filter_class)
    h = np.zeros(1, dtype=np.float64)
    h[0] = 1.0
    gain = 1.0
    for (b, a), g in stages:
        fir = fir_from_biquad(b, a, zeros).astype(np.float64)
        h = np.convolve(h, fir)
        gain *= g
    return (gain * h).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _exact_fir(rate: int, filter_class: str, max_taps: int = 1 << 16):
    """Full impulse response of the weighting cascade, trimmed where the
    tail falls below float32 noise (host-side design).

    All BS.1770 weighting stages are stable IIRs, so their impulse response
    decays geometrically; convolving with the response truncated at the
    1e-10 relative level is exact to float32. This turns the "exact IIR"
    path into one causal FFT convolution — the TPU-idiomatic equivalent of
    the reference's sequential CPU ``lfilter`` (loudness.py:102-126).
    """
    from scipy.signal import lfilter

    stages = design_filters(rate, filter_class)
    n = max_taps
    impulse = np.zeros(n)
    impulse[0] = 1.0
    h = impulse
    gain = 1.0
    for (b, a), g in stages:
        h = lfilter(b, a, h)
        gain *= g
    h = gain * h
    tail = np.abs(h) / (np.abs(h).max() + 1e-30)
    keep = np.nonzero(tail > 1e-10)[0]
    n_keep = int(keep[-1]) + 1 if len(keep) else 1
    return h[:n_keep].astype(np.float32)


def apply_k_weighting(
    audio: jnp.ndarray,
    rate: int,
    filter_class: str = "K-weighting",
    use_fir: bool = False,
    zeros: int = 512,
    conv_method: str = "fft",
) -> jnp.ndarray:
    """Apply the frequency-weighting cascade to ``(..., T)`` audio.

    ``use_fir=False`` runs the float32-exact composed impulse response (the
    moral equivalent of the reference's exact-IIR CPU path, loudness.py:102-126,
    but as one FFT conv); ``use_fir=True`` runs the 512-tap truncated-FIR
    approximation for bit-level parity with the reference GPU path
    (loudness.py:69-100).

    ``conv_method``: ``"fft"`` = one full-length pow2 FFT conv;
    ``"fft_os"`` = pow2 overlap-save blocks; ``"pallas"`` = blocked
    Toeplitz matmul on the MXU (hardware-measured 2.3x faster than fft for
    the 1023-tap FIR at 5e-7 rel accuracy, but ~2 min first compile).

    The exact path (``use_fir=False``) evaluates the cascade by block
    state-space lifting (``filters.iir_cascade_blocked``): per-block
    Toeplitz matmuls + a tiny block-state scan — v5e-measured ~10x the
    composed-impulse-response FFT conv it replaces, ~1.5e-4 signal-level
    error vs the float64 sequential filter at 5 s (pure f32 state
    propagation at the near-DC pole; ~2e-8 dB on gated energies).
    The former composed-impulse-response evaluation survives as
    ``_exact_fir``/``causal_fft_conv1d`` for oracle tests and for the
    sequence-parallel meter (``parallel/timeshard.py``), where a
    halo-exchanged FIR is the right sharded formulation.
    """
    if not use_fir:
        stages = [(b, a, g) for (b, a), g in design_filters(rate, filter_class)]
        return iir_cascade_blocked(audio, stages)
    kernel = _composed_fir(rate, filter_class, zeros)
    if conv_method in ("pallas", "pallas_interpret"):
        from .pallas_kernels import MAX_TAPS, fir_conv_causal

        # Pallas compiles only on TPU; elsewhere (CPU test runs) fall
        # through to the numerically-equivalent FFT path —
        # "pallas_interpret" instead runs the kernel in interpret mode so
        # CI exercises the production meter's numeric path off-TPU.
        interpret = conv_method == "pallas_interpret"
        if len(kernel) <= MAX_TAPS and (
            interpret or jax.default_backend() != "cpu"
        ):
            return fir_conv_causal(audio, kernel, interpret=interpret)
    block = 8192 if conv_method == "fft_os" else None
    return causal_fft_conv1d(audio, jnp.asarray(kernel), block_size=block)


def _gated_lufs(filtered, rate, block_size, xp):
    """BS.1770-4 gating (eqs. 1-7) over weighted ``(nb, nch, nt)`` audio.

    One implementation shared by the jittable meter (``xp=jnp``) and the
    host meter (``xp=np``) so the gating math cannot drift between them
    (reference loudness.py:164-247).
    """
    nb, nch, nt = filtered.shape
    G = xp.asarray(CHANNEL_GAINS[:nch], dtype=filtered.dtype)
    T_g = block_size
    Gamma_a = -70.0

    kernel = int(T_g * rate)
    stride = int(T_g * rate * 0.25)  # 75% overlap (loudness.py:164-174)
    # julius.core.unfold: ceil frame count with zero padding at the end
    n_frames = math.ceil((max(nt, kernel) - kernel) / stride) + 1
    tgt = (n_frames - 1) * stride + kernel
    padded = xp.pad(filtered, ((0, 0), (0, 0), (0, tgt - nt)))

    # mean square power per block, per channel (eq. 1). With the standard
    # 75% overlap the block is exactly 4 strides, so block powers are sums
    # of non-overlapping stride-sized partial sums — a reshape instead of
    # materializing the (nb, nch, n_frames, kernel) unfold gather (which
    # costs ~212 MB of HBM traffic at batch-64 x 5 s and dominated the
    # device meter; v5e: 6.2 ms -> 3.9 ms).
    if kernel == 4 * stride:
        sq = padded * padded
        s = xp.sum(
            sq.reshape(nb, nch, (n_frames + 3), stride), axis=-1
        )  # (nb, nch, n_frames + 3) stride-partial sums
        z = (
            s[..., 0:n_frames]
            + s[..., 1 : n_frames + 1]
            + s[..., 2 : n_frames + 2]
            + s[..., 3 : n_frames + 3]
        ) / (T_g * rate)
    else:
        idx = (
            np.arange(n_frames, dtype=np.int32)[:, None] * stride
            + np.arange(kernel, dtype=np.int32)[None, :]
        )
        unfolded = padded[..., idx]  # (nb, nch, n_frames, kernel)
        z = xp.sum(unfolded * unfolded, axis=-1) / (T_g * rate)
    # block loudness (eq. 2)
    l = -0.691 + 10.0 * xp.log10(
        xp.sum(G[None, :, None] * z, axis=1, keepdims=True)
    )
    l = xp.broadcast_to(l, z.shape)

    # absolute gate (eq. 5-6)
    above_abs = l > Gamma_a
    z_abs = xp.where(above_abs, z, 0.0)
    count_abs = xp.sum(above_abs, axis=2)
    z_avg_abs = xp.sum(z_abs, axis=2) / count_abs  # may be nan/inf like reference

    Gamma_r = (
        -0.691
        + 10.0 * xp.log10(xp.sum(z_avg_abs * G[None, :], axis=-1))
        - 10.0
    )
    Gamma_r = Gamma_r[:, None, None]

    # relative + absolute gate (eq. 7)
    above_both = above_abs & (l > Gamma_r)
    z_both = xp.where(above_both, z, 0.0)
    count_both = xp.sum(above_both, axis=2)
    z_avg_gated = xp.sum(z_both, axis=2) / count_both

    # nan/inf handling (reference loudness.py:238-244)
    z_avg_gated = xp.where(xp.isnan(z_avg_gated), 0.0, z_avg_gated)
    z_avg_gated = xp.where(
        z_avg_gated == xp.inf, xp.finfo(xp.float32).max, z_avg_gated
    )
    z_avg_gated = xp.where(
        z_avg_gated == -xp.inf, xp.finfo(xp.float32).min, z_avg_gated
    )

    lufs = -0.691 + 10.0 * xp.log10(xp.sum(G[None, :] * z_avg_gated, axis=1))
    return lufs.astype(xp.float32)


def integrated_loudness(
    data: jnp.ndarray,
    rate: int,
    filter_class: str = "K-weighting",
    block_size: float = 0.400,
    use_fir: bool = None,
    zeros: int = None,
    conv_method: str = None,
) -> jnp.ndarray:
    """Integrated gated loudness (LUFS) of ``(nb, nt, nch)`` audio.

    Pure function mirror of ``Meter.integrated_loudness``
    (reference loudness.py:176-247). Returns shape ``(nb,)``.
    """
    if data.ndim == 1:
        data = data[None, :, None]
    elif data.ndim == 2:
        data = data[None, ...]
    if use_fir is None:
        use_fir = _METER_DEFAULTS["use_fir"]
    if conv_method is None:
        conv_method = _METER_DEFAULTS["conv_method"]
    if zeros is None:
        zeros = _METER_DEFAULTS["zeros"]
    data = data.astype(jnp.float32)
    nb, nt, nch = data.shape

    # weighting filters run over the time axis
    filtered = apply_k_weighting(
        jnp.swapaxes(data, -1, -2), rate, filter_class, use_fir, zeros,
        conv_method,
    )  # (nb, nch, nt)

    return _gated_lufs(filtered, rate, block_size, jnp)


def host_loudness(
    audio_data: np.ndarray,
    sample_rate: int,
    filter_class: str = "K-weighting",
    block_size: float = 0.400,
    dtype=np.float64,
) -> np.ndarray:
    """Host-side (numpy/scipy) BS.1770 meter for ``(nb, nch, nt)`` audio.

    Same numerics as ``loudness()`` but built on ``scipy.signal.lfilter``
    (exact IIR, C loop) and numpy gating — the right tool on the host CPU,
    where the jittable meter costs ~500 ms per call and this one ~4 ms.
    Used by the data-loading path (``salient_excerpt`` loudness cutoff,
    reference audio_signal.py:227-286), which runs in dataloader workers.

    ``dtype=np.float32`` runs the filter cascade and gating in single
    precision: 1.7x faster (3.0 vs 5.1 ms on a 5 s clip, this box) at a
    measured 0.004 mdB deviation across a 60 dB level sweep — the
    salient-excerpt cutoff path uses it (the meter is the dominant
    loader cost; reference tests/profilers/profile_load.py:62-74).
    """
    from scipy.signal import lfilter

    from .._hostprof import span

    with span("salient_meter"):
        return _host_loudness_impl(
            audio_data, sample_rate, filter_class, block_size, lfilter,
            dtype,
        )


def _host_loudness_impl(audio_data, sample_rate, filter_class, block_size,
                        lfilter, dtype=np.float64):
    data = np.asarray(audio_data, dtype=dtype)
    if data.ndim == 1:
        data = data[None, None, :]
    elif data.ndim == 2:
        data = data[None, ...]
    nb, nch, nt = data.shape

    min_len = int(0.5 * sample_rate)
    if nt < min_len:
        data = np.pad(data, ((0, 0), (0, 0), (0, min_len - nt)))
        nt = min_len

    filtered = data
    for (b, a), gain in design_filters(sample_rate, filter_class):
        filtered = gain * lfilter(
            np.asarray(b, dtype=dtype), np.asarray(a, dtype=dtype),
            filtered, axis=-1,
        )

    with np.errstate(divide="ignore", invalid="ignore"):
        lufs = _gated_lufs(filtered, sample_rate, block_size, np)
    return np.maximum(lufs, MIN_LOUDNESS).astype(np.float32)


def loudness(
    audio_data: jnp.ndarray,
    sample_rate: int,
    filter_class: str = "K-weighting",
    block_size: float = 0.400,
    **kwargs,
) -> jnp.ndarray:
    """Loudness of ``(nb, nch, nt)`` audio, padded to >= 0.5 s and clamped
    at -70 LKFS (reference ``LoudnessMixin.loudness``, loudness.py:268-320)."""
    nb, nch, nt = audio_data.shape
    min_len = int(0.5 * sample_rate)
    if nt < min_len:
        audio_data = jnp.pad(audio_data, ((0, 0), (0, 0), (0, min_len - nt)))
    out = integrated_loudness(
        jnp.swapaxes(audio_data, -1, -2),
        sample_rate,
        filter_class=filter_class,
        block_size=block_size,
        **kwargs,
    )
    return jnp.maximum(out, MIN_LOUDNESS)
