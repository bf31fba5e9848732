"""FIR/IIR filtering primitives: windowed-sinc kernels, FFT convolution,
mel band-splitting, biquad cascades.

TPU-first design notes
----------------------
* All FIR filtering goes through one batched FFT convolution
  (``fft_conv1d``) — ``rfft``/``irfft`` are XLA-native and HBM-bandwidth
  bound, so a single fused conv over ``(B*C, T)`` is the speed-of-light
  implementation for the long kernels used here (50-45k taps).
* Per-item filter cutoffs are handled by building the whole bank of
  windowed-sinc kernels *inside* the program from traced cutoff values over
  a static support (``lowpass_kernel``) — no Python loop over the batch
  (the reference loops per item: /root/reference/audiotools/core/dsp.py:177-179).
* Exact IIR biquads are evaluated without a per-sample time loop: the
  general ``biquad`` uses an associative scan (O(log T) depth), and the
  loudness cascade uses ``iir_cascade_blocked`` — block state-space
  lifting (per-block Toeplitz matmuls on the MXU + a block-state scan).

Numerical semantics mirror ``julius`` (pure-torch) filters used by the
reference: ``julius.LowPassFilter/HighPassFilter`` (dsp.py:178,210),
``julius.SplitBands`` (effects.py:399-403), ``julius.fftconv.fft_conv1d``
(loudness.py:94).
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fft_conv1d",
    "overlap_save_valid",
    "lowpass_kernel",
    "low_pass",
    "high_pass",
    "split_bands",
    "mel_band_cutoffs",
    "equalizer",
    "biquad",
    "biquad_cascade",
    "iir_cascade_blocked",
    "fir_from_biquad",
    "preemphasis",
]


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def fft_conv1d(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Valid-mode convolution of ``(..., T)`` signals with ``(K, L)`` kernels
    via FFT, returning ``(..., K, T - L + 1)``.

    The kernels are *correlated* (torch ``conv1d`` convention, as in
    ``julius.fftconv.fft_conv1d``).
    """
    T = x.shape[-1]
    L = kernels.shape[-1]
    n = _next_pow2(T)
    X = jnp.fft.rfft(x, n=n)
    # correlation == convolution with reversed kernel
    H = jnp.fft.rfft(kernels[..., ::-1], n=n)
    Y = X[..., None, :] * H
    y = jnp.fft.irfft(Y, n=n)
    return y[..., L - 1 : T]


def causal_fft_conv1d(
    x: jnp.ndarray, kernel: jnp.ndarray, block_size: int = None
) -> jnp.ndarray:
    """Causal convolution ``y[n] = sum_k h[k] x[n-k]`` truncated to ``T``.

    Matches the net alignment of the reference loudness FIR path
    (/root/reference/audiotools/core/loudness.py:89-96: pad, fft_conv with
    reversed kernel, slice ``[1:nt+1]``).

    ``block_size`` switches to overlap-save with pow2 block FFTs — many
    small batched FFTs often beat one huge FFT on the TPU VPU.
    """
    T = x.shape[-1]
    L = kernel.shape[-1]
    if block_size is not None and block_size > 2 * L:
        return _causal_overlap_save(x, kernel, block_size)
    n = _next_pow2(T + L)
    X = jnp.fft.rfft(x, n=n)
    H = jnp.fft.rfft(kernel, n=n)
    y = jnp.fft.irfft(X * H, n=n)
    return y[..., :T]


def _causal_overlap_save(
    x: jnp.ndarray, kernel: jnp.ndarray, nfft: int
) -> jnp.ndarray:
    """Overlap-save causal convolution with pow2 ``nfft`` blocks."""
    T = x.shape[-1]
    L = kernel.shape[-1]
    hop = nfft - (L - 1)
    nblk = -(-T // hop)
    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, T))
    # each block b reads x[b*hop - (L-1) : b*hop + hop + ...]; front-pad
    # with the causal history and tail-pad to the block grid
    total = (nblk - 1) * hop + nfft
    xp = jnp.pad(xf, ((0, 0), (L - 1, max(0, total - T - (L - 1)))))
    idx = (
        np.arange(nblk, dtype=np.int32)[:, None] * hop
        + np.arange(nfft, dtype=np.int32)[None, :]
    )
    blocks = xp[:, idx]  # (B, nblk, nfft)
    Y = jnp.fft.rfft(blocks, n=nfft) * jnp.fft.rfft(kernel, n=nfft)
    y = jnp.fft.irfft(Y, n=nfft)[..., L - 1 :]  # valid part: hop samples
    y = y.reshape((xf.shape[0], -1))[:, :T]
    return y.reshape(batch_shape + (T,))


def overlap_save_valid(
    x: jnp.ndarray, kernels: jnp.ndarray, nfft: int, correlate: bool = True
) -> jnp.ndarray:
    """Valid-mode overlap-save convolution with pow2 block FFTs.

    Returns full-convolution indices ``[L-1 : T]`` (length ``T - L + 1``)
    of ``(..., T)`` signals against ``(..., L)`` kernels whose leading dims
    broadcast against the signal's. Many small batched pow2 FFTs instead of
    one huge full-length FFT — the huge FFT is VPU-latency bound on TPU
    while blocks pipeline.

    ``correlate=True`` flips the kernel (torch ``conv1d`` convention, as in
    ``fft_conv1d``); symmetric windowed-sinc kernels are unaffected.
    """
    L = kernels.shape[-1]
    if nfft <= L - 1:
        raise ValueError(f"nfft ({nfft}) must exceed kernel overlap ({L - 1})")
    hop = nfft - (L - 1)
    T = x.shape[-1]
    n_out = T - (L - 1)
    nblk = -(-n_out // hop)
    total = (nblk - 1) * hop + nfft
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, max(0, total - T))])
    idx = (
        np.arange(nblk, dtype=np.int32)[:, None] * hop
        + np.arange(nfft, dtype=np.int32)[None, :]
    )
    blocks = xp[..., idx]  # (..., nblk, nfft)
    k = kernels[..., ::-1] if correlate else kernels
    H = jnp.fft.rfft(k[..., None, :], n=nfft)  # (..., 1, F)
    y = jnp.fft.irfft(jnp.fft.rfft(blocks, n=nfft) * H, n=nfft)[..., L - 1 :]
    y = y.reshape(y.shape[:-2] + (nblk * hop,))[..., :n_out]
    return y


def lowpass_kernel(
    cutoff: jnp.ndarray, zeros: int, half_size: int
) -> jnp.ndarray:
    """Windowed-sinc low-pass kernel(s) over a static support.

    Reproduces ``julius.LowPassFilter``'s kernel for a (possibly traced)
    ``cutoff`` expressed as a fraction of the sample rate: taps
    ``2*c*hann(2h+1)*sinc(2*pi*c*t)`` for ``|t| <= h`` with
    ``h = floor(zeros / cutoff / 2)``, normalized to unit sum. Taps outside
    the per-cutoff support are zero, so a conservative static ``half_size``
    yields exactly the same filter as julius's dynamic sizing.

    Parameters
    ----------
    cutoff : scalar or (B,) array, fraction of sample rate in (0, 0.5].
    zeros : int, number of zero crossings (reference default 51).
    half_size : int, static support half-width; must satisfy
        ``half_size >= floor(zeros / cutoff / 2)`` for every cutoff.

    Returns
    -------
    (B, 2*half_size+1) (or (2*half_size+1,) for scalar input) kernel array.
    """
    cutoff = jnp.asarray(cutoff, dtype=jnp.float32)
    scalar = cutoff.ndim == 0
    c = jnp.atleast_1d(cutoff)[:, None]  # (B, 1)
    t = jnp.arange(-half_size, half_size + 1, dtype=jnp.float32)[None, :]

    h = jnp.floor(zeros / c / 2.0)  # per-item half support
    inside = jnp.abs(t) <= h
    # hann_window(2h+1, periodic=False) centered: cos^2(pi t / (2h))
    window = jnp.cos(jnp.pi * t / (2.0 * jnp.maximum(h, 1.0))) ** 2
    arg = 2.0 * c * jnp.pi * t
    sinc = jnp.where(jnp.abs(arg) < 1e-8, 1.0, jnp.sin(arg) / jnp.where(arg == 0, 1.0, arg))
    kernel = 2.0 * c * window * sinc
    kernel = jnp.where(inside, kernel, 0.0)
    kernel = kernel / jnp.sum(kernel, axis=-1, keepdims=True)
    # cutoff >= 0.5 -> identity (julius: delta), cutoff <= 0 -> zero
    delta = (t == 0).astype(kernel.dtype)
    kernel = jnp.where(c >= 0.5, delta, kernel)
    kernel = jnp.where(c <= 0.0, 0.0, kernel)
    return kernel[0] if scalar else kernel


def _edge_pad(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Replicate-pad the last axis (julius pads mode='replicate')."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")


def _auto_block(overlap: int, scale: int, lo: int, hi: int) -> int:
    """Overlap-save block size heuristic anchored to v5e measurements:
    ``next_pow2(scale * overlap)`` clamped to ``[lo, hi]``; ``None`` (full
    FFT) when even ``hi`` can't fit the overlap."""
    bs = min(max(_next_pow2(max(1, scale * overlap)), lo), hi)
    return bs if bs > 2 * overlap else None


def _fft_conv_valid(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Per-item-kernel FFT correlation of ``(B, C, Tp)`` signals against
    ``(B_k, L)`` kernels (``B_k`` broadcasting against ``B``), returning
    full-convolution indices ``[L-1:]``. The pow2 circular conv's
    wraparound contaminates only the discarded ``[0, L-1)`` head, so the
    slice is exact linear convolution."""
    L = kernels.shape[-1]
    n = _next_pow2(x.shape[-1])
    X = jnp.fft.rfft(x, n=n)
    H = jnp.fft.rfft(kernels[:, None, ::-1], n=n)
    return jnp.fft.irfft(X * H, n=n)[..., L - 1 :]


def low_pass(
    audio: jnp.ndarray, cutoffs: jnp.ndarray, sample_rate: int, zeros: int = 51,
    min_cutoff_hz: float = 40.0, block_size="auto",
) -> jnp.ndarray:
    """Low-pass ``(B, C, T)`` audio with per-item cutoffs in Hz.

    Vmapped-kernel equivalent of the reference's per-item julius loop
    (/root/reference/audiotools/core/dsp.py:153-183). ``min_cutoff_hz``
    bounds the static kernel support; cutoffs below it are clamped.
    ``block_size`` switches the conv to pow2 overlap-save blocks:
    ``"auto"`` (default) picks a measured-good size when the kernel is
    short enough to profit (v5e: 11.2 ms vs 19.1 ms full-FFT at batch-64
    x 5 s with a 4 kHz-support kernel); ``None`` forces one full-length
    FFT.
    """
    B, C, T = audio.shape
    c_in = jnp.asarray(cutoffs, jnp.float32)
    if not isinstance(c_in, jax.core.Tracer):
        # concrete cutoffs: tighten the static kernel support to the
        # actual minimum instead of the worst-case min_cutoff_hz
        concrete_min = float(np.min(np.asarray(c_in)))
        min_cutoff_hz = max(min_cutoff_hz, min(concrete_min, sample_rate / 2))
    c = jnp.broadcast_to(jnp.atleast_1d(c_in).reshape(-1), (B,))
    c = jnp.maximum(c, min_cutoff_hz) / sample_rate
    half = max(1, int(zeros / (min_cutoff_hz / sample_rate) / 2))
    kernels = lowpass_kernel(c, zeros, half)  # (B, 2h+1)
    x = _edge_pad(audio, half)  # (B, C, T + 2h)
    L = kernels.shape[-1]
    if block_size == "auto":
        block_size = _auto_block(L - 1, 8, 4096, 32768)
    if block_size is not None and block_size > 2 * (L - 1):
        y = overlap_save_valid(x, kernels[:, None, :], block_size)
        return y[..., :T]
    # one fft conv per batch item against its own kernel
    return _fft_conv_valid(x, kernels)[..., :T]


def high_pass(
    audio: jnp.ndarray, cutoffs: jnp.ndarray, sample_rate: int, zeros: int = 51,
    min_cutoff_hz: float = 40.0, block_size="auto",
) -> jnp.ndarray:
    """High-pass = input - low_pass (julius.HighPassFilter semantics;
    reference /root/reference/audiotools/core/dsp.py:185-215)."""
    return audio - low_pass(
        audio, cutoffs, sample_rate, zeros, min_cutoff_hz, block_size
    )


@functools.lru_cache(maxsize=None)
def mel_band_cutoffs(sample_rate: int, n_bands: int) -> tuple:
    """Interior mel-spaced cutoff frequencies (Hz) for ``SplitBands``.

    julius uses the HTK mel scale (2595*log10(1+f/700)) with ``n_bands + 1``
    points between 0 and Nyquist, keeping the interior points.
    """
    low = 0.0
    high = 2595.0 * math.log10(1 + (sample_rate / 2) / 700.0)
    mels = np.linspace(low, high, n_bands + 1)
    freqs = 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    return tuple(float(f) for f in freqs[1:-1])


@functools.lru_cache(maxsize=None)
def _split_band_kernels(sample_rate: int, n_bands: int, zeros: int = 8):
    """Static low-pass kernel bank for the mel band-splitter.

    julius ``LowPassFilters`` (plural) stacks all cutoffs into one conv
    weight, so every kernel shares the support dictated by the *smallest*
    cutoff and is windowed by the full-support hann — unlike the per-item
    ``LowPassFilter`` (singular) design in :func:`lowpass_kernel`, which
    tightens support per cutoff. Parity pinned by
    tests/parity/test_parity.py::test_split_bands_matches_julius.
    """
    cutoffs = np.array(mel_band_cutoffs(sample_rate, n_bands)) / sample_rate
    half = int(zeros / cutoffs.min() / 2)
    t = np.arange(-half, half + 1, dtype=np.float64)
    win = np.hanning(2 * half + 1) if half > 0 else np.ones(1)
    kernels = np.zeros((len(cutoffs), 2 * half + 1))
    for i, c in enumerate(cutoffs):
        arg = 2 * c * np.pi * t
        sinc = np.where(np.abs(arg) < 1e-12, 1.0, np.sin(arg) / np.where(arg == 0, 1, arg))
        k = 2 * c * win * sinc
        kernels[i] = k / k.sum()
    return kernels.astype(np.float32), half


def split_bands(
    audio: jnp.ndarray, sample_rate: int, n_bands: int, zeros: int = 8,
    block_size="auto",
):
    """Split ``(B, C, T)`` audio into ``n_bands`` mel-spaced bands
    ``(B, C, T, n_bands)``.

    julius.SplitBands semantics (reference effects.py:386-403): cascade of
    low-passes at mel-spaced cutoffs; band i = lp[i] - lp[i-1]; the last
    band is the residual, so the bands sum exactly to the input.
    ``block_size`` switches the conv to pow2 overlap-save blocks;
    ``"auto"`` picks a measured-good size (v5e: 31.6 ms vs 49.5 ms
    full-FFT for 6 bands at batch-64 x 5 s), ``None`` forces one
    full-length FFT.
    """
    if n_bands < 1:
        raise ValueError("n_bands must be >= 1")
    if n_bands == 1:
        return audio[..., None]
    kernels, half = _split_band_kernels(sample_rate, n_bands, zeros)
    x = _edge_pad(audio, half)
    if block_size == "auto":
        block_size = _auto_block(2 * half, 32, 16384, 65536)
    if block_size is not None and block_size > 2 * (2 * half):
        lows = overlap_save_valid(
            x[..., None, :], jnp.asarray(kernels), block_size
        )  # (B, C, n_bands-1, T)
    else:
        lows = fft_conv1d(x, jnp.asarray(kernels))  # (B, C, n_bands-1, T)
    lows = jnp.moveaxis(lows, -2, 0)  # (n_bands-1, B, C, T)
    bands = [lows[0]]
    for i in range(1, n_bands - 1):
        bands.append(lows[i] - lows[i - 1])
    bands.append(audio - lows[-1])
    return jnp.stack(bands, axis=-1)


def equalizer(
    audio: jnp.ndarray, db: jnp.ndarray, sample_rate: int, zeros: int = 8,
    conv_method: str = None,
) -> jnp.ndarray:
    """Mel-spaced graphic EQ: weight each band by ``10**db`` and sum
    (reference ``EffectMixin.equalizer``, effects.py:405-433).

    Identical numerics to ``sum(split_bands * weights)``, but computed as
    ONE convolution: with bands ``b_0 = lp_0``, ``b_i = lp_i - lp_{i-1}``,
    ``b_{n-1} = x - lp_{n-2}`` the weighted sum telescopes to

        EQ(x) = w_{n-1} x + x * sum_i (w_i - w_{i+1}) k_i

    so the (static) low-pass kernel bank collapses through the (traced)
    per-item weights into one ``(B, L)`` kernel — an (n_bands-1)x FLOP
    reduction over the band-split (v5e: 34 ms -> one short per-item conv).

    ``conv_method``: ``None`` auto-selects — the per-item-kernel Pallas
    MXU FIR on TPU for kernels inside its validated envelope (v5e:
    2.0 ms vs 7.0 ms overlap-save at batch-64 x 5 s), pow2 overlap-save
    otherwise. ``"pallas"``/``"pallas_interpret"``/``"fft"`` force a path
    (interpret runs the kernel in interpret mode for CPU CI).
    """
    db = jnp.asarray(db, dtype=jnp.float32)
    if db.ndim == 1:
        db = db[None, :]
    n_bands = db.shape[-1]
    weights = 10.0 ** db  # (B, n_bands)
    if n_bands == 1:
        return audio * weights[:, 0, None, None]
    kernels, half = _split_band_kernels(sample_rate, n_bands, zeros)
    # (B, n_bands-1) telescoped weight differences @ (n_bands-1, L) bank
    w_diff = weights[:, :-1] - weights[:, 1:]
    combined = jnp.einsum(
        "bk,kl->bl", w_diff, jnp.asarray(kernels),
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, L)
    x = _edge_pad(audio, half)
    L = 2 * half + 1
    T = audio.shape[-1]
    if conv_method is None:
        conv_method = (
            "pallas"
            if jax.default_backend() == "tpu" and L <= 2048
            else "fft"
        )
    if conv_method in ("pallas", "pallas_interpret") and L <= 2048:
        # the conv output at full-conv index t + L - 1 is exactly the
        # causal conv of the edge-padded signal with the REVERSED kernel
        # at time t + L - 1, so one truncated causal MXU conv suffices
        from .pallas_kernels import fir_conv_causal_batch

        B_, C_, Tp = x.shape
        g = combined[:, ::-1]
        # a batch-1 EQ curve broadcasts over a batched signal (reference
        # effects.py:423-427) — materialize it so the per-item-kernel
        # conv sees one kernel row per signal row
        if g.shape[0] == 1 and B_ > 1:
            g = jnp.broadcast_to(g, (B_, g.shape[-1]))
        if C_ > 1:
            g = jnp.repeat(g, C_, axis=0)
        y = fir_conv_causal_batch(
            x.reshape(B_ * C_, Tp), g,
            interpret=conv_method == "pallas_interpret",
        ).reshape(B_, C_, Tp)
        y = y[..., L - 1 :]
    else:
        block = _auto_block(L - 1, 8, 4096, 32768)
        if block is not None:
            y = overlap_save_valid(x, combined[:, None, :], block)
        else:
            y = _fft_conv_valid(x, combined)
    return weights[:, -1, None, None] * audio + y[..., :T]


# -----------------------------------------------------------------------------
# IIR biquads
# -----------------------------------------------------------------------------


def biquad(x: jnp.ndarray, b: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """Exact direct-form-II-transposed biquad over the last axis.

    ``a``/``b`` are length-3 coefficient arrays (``a[0]`` normalized to 1 is
    not required; we normalize). Implemented as an associative scan over the
    2-dim state recurrence, giving O(log T) depth on TPU instead of a
    sequential time loop (replaces ``torchaudio.functional.lfilter``,
    reference loudness.py:122).
    """
    b = jnp.asarray(b, dtype=x.dtype)
    a = jnp.asarray(a, dtype=x.dtype)
    b = b / a[0]
    a = a / a[0]

    # DF2T: y[n] = b0 x[n] + s1[n-1]
    #       s1[n] = b1 x[n] - a1 y[n] + s2[n-1]
    #       s2[n] = b2 x[n] - a2 y[n]
    # State s = (s1, s2); s[n] = A s[n-1] + B x[n] with
    # A = [[-a1, 1], [-a2, 0]], B = [b1 - a1 b0, b2 - a2 b0]
    A = jnp.array([[-a[1], 1.0], [-a[2], 0.0]], dtype=x.dtype)
    Bv = jnp.array([b[1] - a[1] * b[0], b[2] - a[2] * b[0]], dtype=x.dtype)

    T = x.shape[-1]
    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, T))

    # elements: (M_n, v_n) with s_n = M_n s_{n-1} + v_n ; M_n == A constant.
    B_sz = xf.shape[0]
    Ms = jnp.broadcast_to(A, (B_sz, T, 2, 2))
    vs = xf[..., :, None] * Bv  # (B, T, 2)

    def combine(left, right):
        M1, v1 = left
        M2, v2 = right
        return M2 @ M1, jnp.einsum("...tij,...tj->...ti", M2, v1) + v2

    M_acc, v_acc = jax.lax.associative_scan(combine, (Ms, vs), axis=1)
    # s[n] = v_acc[n] (initial state = 0); y[n] = b0 x[n] + s1[n-1]
    s1 = v_acc[..., 0]
    s1_prev = jnp.concatenate([jnp.zeros_like(s1[..., :1]), s1[..., :-1]], axis=-1)
    y = b[0] * xf + s1_prev
    return y.reshape(batch_shape + (T,))


def biquad_cascade(x: jnp.ndarray, coeffs: list) -> jnp.ndarray:
    """Apply a sequence of ``(b, a, gain)`` biquad stages."""
    for b, a, gain in coeffs:
        x = gain * biquad(x, b, a)
    return x


@functools.lru_cache(maxsize=None)
def _blocked_iir_operators(stages_key: tuple, block: int):
    """Block-lifted state-space operators of an IIR biquad cascade
    (host-side float64 design, cast to float32).

    With per-sample recurrence ``s[n] = A s[n-1] + B x[n]``,
    ``y[n] = C s[n-1] + D x[n]`` (the DF2T convention of ``biquad``),
    a block of L samples evaluates as

        y_blk = Phi_x @ x_blk + Phi_s @ s_pre
        s_end = A^L s_pre + Psi_x @ x_blk

    where ``Phi_x[i, j] = h[i-j]`` (lower-triangular Toeplitz of Markov
    parameters, ``h[0] = D``, ``h[m] = C A^{m-1} B``),
    ``Phi_s[i] = C A^i`` and ``Psi_x[:, j] = A^{L-1-j} B``.
    """
    A = np.zeros((0, 0))
    Bv = np.zeros((0,))
    Cv = np.zeros((0,))
    Dg = 1.0
    for b, a, gain in stages_key:
        b = np.asarray(b, dtype=np.float64)
        a = np.asarray(a, dtype=np.float64)
        b = b / a[0] * gain
        a = a / a[0]
        A_i = np.array([[-a[1], 1.0], [-a[2], 0.0]])
        B_i = np.array([b[1] - a[1] * b[0], b[2] - a[2] * b[0]])
        C_i = np.array([1.0, 0.0])
        D_i = b[0]
        # cascade composition: x -> (A,B,C,D) -> (A_i,B_i,C_i,D_i)
        n = A.shape[0]
        A = np.block([
            [A, np.zeros((n, 2))],
            [np.outer(B_i, Cv), A_i],
        ]) if n else A_i
        Bv = np.concatenate([Bv, B_i * Dg]) if n else B_i
        Cv = np.concatenate([D_i * Cv, C_i]) if n else C_i
        Dg = D_i * Dg

    ns = A.shape[0]

    # Diagonally balance the realization: equalize each state's input
    # energy (controllability gramian P) against its output sensitivity
    # (observability gramian Q) with t_i = (P_ii / Q_ii)^(1/4), so f32
    # state ulps stop leaking into y through oversized states.
    from scipy.linalg import solve_discrete_lyapunov

    P = solve_discrete_lyapunov(A, np.outer(Bv, Bv))
    Q = solve_discrete_lyapunov(A.T, np.outer(Cv, Cv))
    scale = (
        np.maximum(np.diag(P), 1e-20) / np.maximum(np.diag(Q), 1e-20)
    ) ** 0.25
    A = A * (scale[None, :] / scale[:, None])
    Bv = Bv / scale
    Cv = Cv * scale

    powers = [np.eye(ns)]
    for _ in range(block):
        powers.append(A @ powers[-1])

    markov = np.zeros(block)
    markov[0] = Dg
    for m in range(1, block):
        markov[m] = Cv @ powers[m - 1] @ Bv
    idx = np.arange(block)
    diff = idx[:, None] - idx[None, :]
    phi_x = np.where(diff >= 0, markov[np.clip(diff, 0, block - 1)], 0.0)

    phi_s = np.stack([Cv @ powers[i] for i in range(block)])  # (L, ns)
    psi_x = np.stack(
        [powers[block - 1 - j] @ Bv for j in range(block)], axis=1
    )  # (ns, L)
    return (
        phi_x.astype(np.float32),
        phi_s.astype(np.float32),
        psi_x.astype(np.float32),
        powers[block].astype(np.float32),
    )


def iir_cascade_blocked(
    x: jnp.ndarray, stages, block: int = 512
) -> jnp.ndarray:
    """Exact IIR biquad-cascade filtering over the last axis via block
    state-space lifting: one (L, L) lower-triangular Toeplitz matmul per
    L-sample block (MXU) plus an associative scan over the tiny per-block
    state maps — the TPU-idiomatic exact evaluation of sequential
    ``lfilter`` (reference loudness.py:102-126). Accuracy vs the float64
    sequential filter: ~1e-5 abs at 5 s x 44.1 kHz (K-weighting cascade,
    block=512; diagonally balanced realization + sequential block scan —
    see the in-code notes). Speed measured in tests/hw/hw_iir_blocked.py.

    ``stages``: iterable of ``(b, a, gain)`` with length-3 coefficient
    arrays (the ``design_filters`` layout).
    """
    stages_key = tuple(
        (tuple(float(v) for v in b), tuple(float(v) for v in a), float(g))
        for b, a, g in stages
    )
    phi_x, phi_s, psi_x, A_L = (
        jnp.asarray(m) for m in _blocked_iir_operators(stages_key, block)
    )
    ns = A_L.shape[0]

    T = x.shape[-1]
    batch_shape = x.shape[:-1]
    pad = -T % block
    xf = jnp.pad(x.reshape((-1, T)), ((0, 0), (0, pad)))
    xb = xf.reshape(xf.shape[0], -1, block)  # (B, nblk, L)
    n_blk = xb.shape[1]

    # in-block contributions: one MXU matmul per block, batched
    part = jnp.einsum(
        "il,bkl->bki", phi_x, xb, precision=jax.lax.Precision.HIGHEST
    )
    # block input-to-state maps
    u = jnp.einsum(
        "sl,bkl->bks", psi_x, xb, precision=jax.lax.Precision.HIGHEST
    )

    # States at each block start: a SEQUENTIAL scan over blocks. The
    # tree (associative) scan forms explicit f32 products of A^L — whose
    # entries reach ~70 for the near-DC K-weighting pole — and amplifies
    # rounding ~20x (measured 9e-4 vs 4e-5 abs at 48k x 1 s); at one
    # step per 128 samples the sequential dependency is cheap.
    def step(s, u_k):
        return jnp.einsum("ij,bj->bi", A_L, s) + u_k, s

    s0 = jnp.zeros((xb.shape[0], ns), dtype=xb.dtype)
    _, s_pre = jax.lax.scan(step, s0, jnp.swapaxes(u, 0, 1))
    s_pre = jnp.swapaxes(s_pre, 0, 1)  # (B, nblk, ns), state BEFORE block

    y = part + jnp.einsum(
        "is,bks->bki", phi_s, s_pre, precision=jax.lax.Precision.HIGHEST
    )
    return y.reshape(xf.shape[0], -1)[:, :T].reshape(batch_shape + (T,))


def fir_from_biquad(b: np.ndarray, a: np.ndarray, n_taps: int) -> np.ndarray:
    """Truncated impulse response of an IIR biquad (host-side design),
    as the reference builds its GPU FIR approximation (loudness.py:54-64)."""
    from scipy.signal import lfilter

    impulse = np.zeros(n_taps)
    impulse[0] = 1.0
    return lfilter(b, a, impulse).astype(np.float32)


def preemphasis(audio: jnp.ndarray, coef: float = 0.85) -> jnp.ndarray:
    """Pre-emphasis matching the reference's conv kernel ``[1, -coef, 0]``
    with padding 1 (/root/reference/audiotools/core/dsp.py:372-390):
    ``y[n] = x[n-1] - coef * x[n]`` (with ``x[-1] = 0``)."""
    x_prev = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(1, 0)])[..., :-1]
    return x_prev - coef * audio
