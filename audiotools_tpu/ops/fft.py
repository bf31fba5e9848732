"""Framed FFT ops: STFT / ISTFT, mel & MFCC bases, log-magnitude.

TPU-first design notes
----------------------
Everything in this module is a pure, jittable function over ``(..., T)``
arrays with *static* frame parameters, so a whole spectral-loss stack
compiles to one XLA program. Framing is expressed as a gather with a
precomputed index matrix (XLA lowers this to an efficient strided load),
the FFT runs as a batched ``rfft`` over the last axis, and the mel / DCT
projections are matmuls that map straight onto the MXU.

Semantics mirror the reference implementation
(`/root/reference/audiotools/core/audio_signal.py:1009-1516`):

* ``stft`` = optional match-stride pre-pad (reflect) + center pad of
  ``n_fft//2`` (reflect) + frames of length ``n_fft`` every ``hop``
  samples + window + rfft (reference: audio_signal.py:1123-1212, which
  defers to ``torch.stft(center=True)``).
* ``match_stride`` drops the first/last two frames so that
  ``frames * hop == samples`` (audio_signal.py:1206-1209).
* ``istft`` inverts including re-padding dropped frames
  (audio_signal.py:1214-1296), using windowed overlap-add with
  window-square envelope normalization like ``torch.istft``.
* mel filterbank follows librosa's slaney-scale / slaney-norm filters
  (audio_signal.py:1298-1331), DCT follows torchaudio ``create_dct``
  (audio_signal.py:1371-1396); both are computed natively here (no
  librosa/torchaudio at runtime).
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "get_window",
    "stft",
    "istft",
    "compute_stft_padding",
    "num_frames",
    "mel_filters",
    "dct_matrix",
    "mel_spectrogram",
    "mfcc",
    "log_magnitude",
    "default_win_length",
]


def default_win_length(sample_rate: int) -> int:
    """Default window: ``2 ** ceil(log2(0.032 * sr))`` (reference
    audio_signal.py:1066)."""
    return int(2 ** (np.ceil(np.log2(0.032 * sample_rate))))


@functools.lru_cache(maxsize=None)
def get_window(window_type: str, window_length: int) -> np.ndarray:
    """Window function as float32 numpy array (host-cached).

    Mirrors reference ``AudioSignal.get_window`` (audio_signal.py:1009-1039):
    scipy ``get_window`` semantics (periodic windows), plus the extra
    ``"average"`` and ``"sqrt_hann"`` types.
    """
    from scipy import signal

    if window_type == "average":
        window = np.ones(window_length) / window_length
    elif window_type == "sqrt_hann":
        window = np.sqrt(signal.get_window("hann", window_length))
    else:
        window = signal.get_window(window_type, window_length)
    return window.astype(np.float32)


def compute_stft_padding(
    length: int, window_length: int, hop_length: int, match_stride: bool
):
    """Amount to pad on either side of audio before the STFT.

    Mirrors reference ``compute_stft_padding`` (audio_signal.py:1089-1121).

    Returns
    -------
    (right_pad, pad) : tuple of int
    """
    if match_stride:
        assert (
            hop_length == window_length // 4
        ), "match_stride assumes 75% overlap (hop_length == window_length // 4)"
        right_pad = math.ceil(length / hop_length) * hop_length - length
        pad = (window_length - hop_length) // 2
    else:
        right_pad = 0
        pad = 0
    return right_pad, pad


def num_frames(
    length: int, window_length: int, hop_length: int, match_stride: bool = False
) -> int:
    """Number of STFT frames produced for a signal of ``length`` samples."""
    right_pad, pad = compute_stft_padding(
        length, window_length, hop_length, match_stride
    )
    padded = length + 2 * pad + right_pad
    nt = 1 + padded // hop_length
    if match_stride:
        nt -= 4
    return nt


def _frame(x: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Extract frames from the last axis: ``(..., T) -> (..., n_frames, frame_length)``.

    When the hop divides the frame length (every default STFT config),
    framing decomposes into ``frame_length // hop`` interleaved
    *non-overlapping* reshapes — pure data movement, no gather. Otherwise
    falls back to a static-index gather.
    """
    T = x.shape[-1]
    n = 1 + (T - frame_length) // hop_length

    if frame_length % hop_length == 0:
        r = frame_length // hop_length
        nq = -(-n // r)  # blocks per offset
        need = (nq - 1) * frame_length + frame_length  # nq * L
        pad = max(0, (r - 1) * hop_length + need - T)
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
        parts = []
        for j in range(r):
            seg = xp[..., j * hop_length : j * hop_length + nq * frame_length]
            parts.append(seg.reshape(seg.shape[:-1] + (nq, frame_length)))
        stacked = jnp.stack(parts, axis=-2)  # (..., nq, r, L)
        frames = stacked.reshape(x.shape[:-1] + (nq * r, frame_length))
        return frames[..., :n, :]

    idx = (
        np.arange(n, dtype=np.int32)[:, None] * hop_length
        + np.arange(frame_length, dtype=np.int32)[None, :]
    )
    return x[..., idx]


def _overlap_add(frames: jnp.ndarray, hop_length: int, out_len: int) -> jnp.ndarray:
    """OLA of ``(B, n_frames, L)`` frames into ``(B, out_len)``.

    When the hop divides the frame length, OLA decomposes into
    ``L // hop`` interleaved non-overlapping folds — static-slice adds,
    no scatter (which would lower poorly on TPU). Falls back to a
    static-index scatter otherwise.
    """
    B, nt, L = frames.shape
    y = jnp.zeros((B, out_len), dtype=frames.dtype)

    if L % hop_length == 0:
        r = L // hop_length
        for j in range(0, min(r, nt)):
            grp = frames[:, j::r, :]  # non-overlapping frames
            flat = grp.reshape(B, -1)
            start = j * hop_length
            y = y.at[:, start : start + flat.shape[1]].add(flat)
        return y

    idx = (
        np.arange(nt, dtype=np.int32)[:, None] * hop_length
        + np.arange(L, dtype=np.int32)[None, :]
    ).reshape(-1)
    return y.at[:, idx].add(frames.reshape(B, -1))


@functools.lru_cache(maxsize=None)
def _dft_matrices(window_type: str, n_fft: int):
    """Window-fused real-DFT matrices ``(n_fft, n_freq)`` for cos and -sin,
    so ``X = frames @ C + 1j * frames @ S`` equals ``rfft(frames * w)``."""
    w = get_window(window_type, n_fft).astype(np.float64)
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    C = (np.cos(ang) * w[:, None]).astype(np.float32)
    S = (np.sin(ang) * w[:, None]).astype(np.float32)
    return C, S


@functools.lru_cache(maxsize=None)
def _dft_half_literals(n_fft: int):
    """Float64-computed cos/sin of ``-2*pi*n*k/n_fft`` for the FIRST HALF
    of the time rows (``n = 0..n_fft/2``), cast to f32 — the embeddable
    half of the real-DFT matrices (see :func:`_dft_matrices_device`).

    Returned as *device* arrays created once per process: closing over
    the SAME jax.Array object at every call site makes all of them share
    one constvar in the trace, so a program computing many STFTs (the
    multi-scale losses call stft 4+ times) embeds each matrix ONCE — the
    per-site ``jnp.asarray(np_array)`` pattern embedded a fresh copy per
    site (measured: 8 copies in the DAC train step, 33.6 MB of 20 MB
    total upload).
    """
    n = np.arange(n_fft // 2 + 1)[:, None]
    k = np.arange(n_fft // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    # ensure_compile_time_eval: the first call may happen INSIDE a trace,
    # and a cached tracer would leak out of it (UnexpectedTracerError on
    # the next trace) — force concrete device arrays regardless
    with jax.ensure_compile_time_eval():
        return (
            jnp.asarray(np.cos(ang).astype(np.float32)),
            jnp.asarray(np.sin(ang).astype(np.float32)),
        )


def _dft_matrices_device(window_type: str, n_fft: int):
    """Window-fused real-DFT matrices, assembled on device from
    half-size literals via the ``n -> n_fft - n`` DFT symmetry.

    A (2048, 1025) f32 cos+sin pair is ~17 MB of HLO constant; programs
    stacking several scales (multi-scale losses + discriminator
    spectrograms) overflowed the tunneled remote-compile transport's
    ~20 MB upload cap (HTTP 413). Rebuilding the matrices from iotas +
    cos/sin shrinks the program but costs ~2 ms of VPU transcendentals
    per invocation on v5e (XLA-TPU does not constant-fold them). The
    mirror trick gets both: only rows ``n = 0..n_fft/2`` are embedded
    (``cos``/``sin`` rows for ``n > n_fft/2`` equal the reflected row,
    sin with a sign flip), and the on-device completion is one reverse +
    concat + window multiply — pure data movement, ~free. Values match
    the full float64-computed literals to 1 ulp.
    """
    w = _window_device(window_type, n_fft)
    Ch, Sh = _dft_half_literals(n_fft)
    # rows n_fft/2+1 .. n_fft-1  ==  rows n_fft/2-1 .. 1 reflected
    C = jnp.concatenate([Ch, Ch[1 : n_fft // 2][::-1]], axis=0)
    S = jnp.concatenate([Sh, -Sh[1 : n_fft // 2][::-1]], axis=0)
    return C * w[:, None], S * w[:, None]


@functools.lru_cache(maxsize=None)
def _window_device(window_type: str, n_fft: int):
    """Per-process device copy of the analysis window (shared constvar
    across call sites, like :func:`_dft_half_literals`)."""
    with jax.ensure_compile_time_eval():
        return jnp.asarray(get_window(window_type, n_fft).astype(np.float32))


@functools.lru_cache(maxsize=None)
def _idft_half_literals(n_fft: int):
    """Half-time-column inverse-DFT literals: ``scale * cos/sin(ang) /
    n_fft`` for ``n = 0..n_fft/2``, as per-process device arrays
    (see :func:`_idft_matrices_device` / :func:`_dft_half_literals`)."""
    k = np.arange(n_fft // 2 + 1)[:, None]
    n = np.arange(n_fft // 2 + 1)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    scale = np.full((n_fft // 2 + 1, 1), 2.0)
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    Ci = (scale * np.cos(ang) / n_fft).astype(np.float32)
    Si = (-scale * np.sin(ang) / n_fft).astype(np.float32)
    with jax.ensure_compile_time_eval():
        return jnp.asarray(Ci), jnp.asarray(Si)


def _idft_matrices_device(window_type: str, n_fft: int):
    """Window-fused inverse real-DFT matrices from half-size literals
    (mirror along the time axis; see :func:`_dft_matrices_device`)."""
    w = _window_device(window_type, n_fft)
    Cih, Sih = _idft_half_literals(n_fft)
    Ci = jnp.concatenate([Cih, Cih[:, 1 : n_fft // 2][:, ::-1]], axis=1)
    Si = jnp.concatenate([Sih, -Sih[:, 1 : n_fft // 2][:, ::-1]], axis=1)
    return Ci * w[None, :], Si * w[None, :]


def stft(
    audio: jnp.ndarray,
    window_length: int,
    hop_length: int,
    window_type: str = "hann",
    match_stride: bool = False,
    padding_type: str = "reflect",
    method: str = "fft",
) -> jnp.ndarray:
    """Short-time Fourier transform of ``(..., T)`` audio.

    Returns complex64 of shape ``(..., n_freq, n_frames)`` with
    ``n_freq = window_length // 2 + 1``, matching the reference's
    ``torch.stft(center=True)`` path (audio_signal.py:1123-1212).

    ``method="matmul"`` evaluates the windowed DFT as two MXU matmuls
    against precomputed cos/sin matrices instead of a VPU FFT — the
    GEMM-native frontend strategy; faster on TPU at slightly relaxed
    (3-pass bf16 ~ 1e-5) precision.
    """
    length = audio.shape[-1]
    right_pad, pad = compute_stft_padding(
        length, window_length, hop_length, match_stride
    )
    batch_shape = audio.shape[:-1]
    x = audio.reshape((-1, length))

    mode = {"reflect": "reflect", "constant": "constant", "replicate": "edge"}.get(
        padding_type, padding_type
    )
    if pad + right_pad > 0:
        x = jnp.pad(x, ((0, 0), (pad, pad + right_pad)), mode=mode)
    # center padding (torch.stft center=True, default pad_mode="reflect")
    cpad = window_length // 2
    x = jnp.pad(x, ((0, 0), (cpad, cpad)), mode="reflect")

    frames = _frame(x, window_length, hop_length)  # (B, n_frames, n_fft)
    if method in ("matmul", "matmul_bf16"):
        # "matmul": 3-pass bf16 (HIGH) ~1e-5 rel, 10.9 ms vs 16.5 ms FFT
        # at batch-64 x 5 s on v5e. "matmul_bf16": single-pass ~3.4e-3
        # rel, 9.6 ms — for loss stacks that tolerate bf16 magnitudes.
        prec = (
            jax.lax.Precision.HIGH
            if method == "matmul"
            else jax.lax.Precision.DEFAULT
        )
        C, S = _dft_matrices_device(window_type, window_length)
        re = jnp.dot(frames, C, precision=prec)
        im = jnp.dot(frames, S, precision=prec)
        spec = jax.lax.complex(re, im)  # (B, n_frames, n_freq)
    elif method == "fft":
        window = jnp.asarray(get_window(window_type, window_length))
        spec = jnp.fft.rfft(frames * window, axis=-1)  # (B, n_frames, n_freq)
    else:
        raise ValueError(f"Unknown stft method: {method!r}")
    spec = jnp.swapaxes(spec, -1, -2)  # (B, n_freq, n_frames)

    if match_stride:
        # Drop first/last two frames added by padding, so that
        # num_frames * hop_length == num_samples (audio_signal.py:1206-1209).
        spec = spec[..., 2:-2]

    return spec.reshape(batch_shape + spec.shape[1:])


@functools.lru_cache(maxsize=None)
def _idft_matrices(window_type: str, n_fft: int):
    """Window-fused inverse real-DFT matrices ``(n_freq, n_fft)`` so that
    ``frames*w == Re(S) @ Ci + Im(S) @ Si`` equals ``irfft(S) * w``."""
    w = get_window(window_type, n_fft).astype(np.float64)
    k = np.arange(n_fft // 2 + 1)[:, None]
    n = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * k * n / n_fft
    scale = np.full((n_fft // 2 + 1, 1), 2.0)
    scale[0] = 1.0
    if n_fft % 2 == 0:
        scale[-1] = 1.0
    Ci = (scale * np.cos(ang) * w[None, :] / n_fft).astype(np.float32)
    Si = (-scale * np.sin(ang) * w[None, :] / n_fft).astype(np.float32)
    return Ci, Si


def istft(
    stft_data: jnp.ndarray,
    window_length: int,
    hop_length: int,
    window_type: str = "hann",
    match_stride: bool = False,
    length: int = None,
    original_length: int = None,
    method: str = "fft",
) -> jnp.ndarray:
    """Inverse STFT of ``(..., n_freq, n_frames)`` complex data.

    Mirrors reference ``istft`` (audio_signal.py:1214-1296): zero-pads back
    the frames dropped under ``match_stride``, runs windowed overlap-add with
    window-square normalization (``torch.istft`` semantics), trims center
    padding, cuts to ``length``, then removes the match-stride padding.

    One of ``length`` / ``original_length`` must be provided;
    ``original_length`` is the pre-STFT signal length (the reference's
    ``self.original_signal_length``).
    """
    if length is None and original_length is None:
        raise ValueError("Provide either `length` or `original_length`.")
    right_pad, pad = compute_stft_padding(
        original_length if original_length is not None else length,
        window_length,
        hop_length,
        match_stride,
    )
    if length is None:
        length = original_length + 2 * pad + right_pad

    batch_shape = stft_data.shape[:-2]
    nf, nt = stft_data.shape[-2], stft_data.shape[-1]
    spec = stft_data.reshape((-1, nf, nt))

    if match_stride:
        spec = jnp.pad(spec, ((0, 0), (0, 0), (2, 2)))
        nt = nt + 4

    window_np = get_window(window_type, window_length)
    out_len = window_length + hop_length * (nt - 1)

    # window-square normalization envelope is static — precompute on host
    norm = np.zeros(out_len, dtype=np.float32)
    wsq = (window_np * window_np).astype(np.float32)
    for i in range(nt):
        norm[i * hop_length : i * hop_length + window_length] += wsq
    inv_env = np.where(norm > 1e-11, 1.0 / np.maximum(norm, 1e-11), 1.0)

    if method in ("matmul_bf16_fused", "matmul_bf16_fused_interpret"):
        # One Pallas pass: iDFT matmul + overlap-add + envelope divide
        # (matmul_bf16 numerics). Hardware-measured SPEED-NEUTRAL with
        # matmul_bf16 (XLA fuses the same pipeline, hw_istft_fused.py);
        # its value is peak HBM — the (B, nt, n_fft) frame tensor is
        # never materialized, which matters for long-signal synthesis.
        # Pallas compiles only on TPU — elsewhere fall back to the
        # numerically-matching matmul_bf16 path; "…_interpret" runs the
        # kernel interpreted so CI covers the numeric path off-TPU.
        interpret = method.endswith("_interpret")
        if (
            window_length % hop_length == 0
            and window_length // hop_length <= 8
            and (interpret or jax.default_backend() != "cpu")
        ):
            from . import pallas_kernels as PK

            Ci, Si = _idft_matrices_device(window_type, window_length)
            S = jnp.swapaxes(spec, -1, -2)  # (B, nt, n_freq)
            y = PK.istft_synthesis_fused(
                jnp.real(S), jnp.imag(S), Ci, Si, hop_length, inv_env,
                interpret=interpret,
            )
            return _istft_trim(
                y, window_length, length, match_stride, pad, right_pad,
                batch_shape,
            )
        method = "matmul_bf16"

    if method in ("matmul", "matmul_bf16"):
        # MXU inverse DFT fused with the synthesis window (counterpart of
        # stft(method="matmul"/"matmul_bf16"))
        prec = (
            jax.lax.Precision.HIGH
            if method == "matmul"
            else jax.lax.Precision.DEFAULT
        )
        Ci, Si = _idft_matrices_device(window_type, window_length)
        S = jnp.swapaxes(spec, -1, -2)  # (B, nt, n_freq)
        frames = jnp.dot(
            jnp.real(S), Ci, precision=prec
        ) + jnp.dot(
            jnp.imag(S), Si, precision=prec
        )  # (B, nt, n_fft), window already applied
    elif method == "fft":
        window = jnp.asarray(window_np)
        frames = jnp.fft.irfft(
            jnp.swapaxes(spec, -1, -2), n=window_length, axis=-1
        )
        frames = frames * window  # (B, nt, n_fft)
    else:
        raise ValueError(f"Unknown istft method: {method!r}")

    y = _overlap_add(frames, hop_length, out_len)
    y = y * jnp.asarray(inv_env)
    return _istft_trim(
        y, window_length, length, match_stride, pad, right_pad, batch_shape
    )


def _istft_trim(
    y, window_length, length, match_stride, pad, right_pad, batch_shape
):
    """Shared istft tail: drop center padding, cut to ``length``, undo the
    match-stride padding, restore the batch shape."""
    cpad = window_length // 2
    y = y[:, cpad:]
    if y.shape[1] < length:
        y = jnp.pad(y, ((0, 0), (0, length - y.shape[1])))
    y = y[:, :length]

    if match_stride:
        y = y[:, pad : y.shape[1] - (pad + right_pad)]

    return y.reshape(batch_shape + (y.shape[-1],))


# -----------------------------------------------------------------------------
# Mel / DCT bases (native replacements for librosa.filters.mel and
# torchaudio.functional.create_dct; reference audio_signal.py:1298-1331,
# 1371-1396).
# -----------------------------------------------------------------------------


def _hz_to_mel(freq: np.ndarray) -> np.ndarray:
    """Slaney-scale Hz->mel (librosa default, htk=False)."""
    freq = np.asanyarray(freq, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = freq / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    if freq.ndim:
        log_t = freq >= min_log_hz
        mels[log_t] = min_log_mel + np.log(freq[log_t] / min_log_hz) / logstep
    elif freq >= min_log_hz:
        mels = min_log_mel + np.log(freq / min_log_hz) / logstep
    return mels


def _mel_to_hz(mels: np.ndarray) -> np.ndarray:
    """Slaney-scale mel->Hz (librosa default, htk=False)."""
    mels = np.asanyarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    if mels.ndim:
        log_t = mels >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (mels[log_t] - min_log_mel))
    elif mels >= min_log_mel:
        freqs = min_log_hz * np.exp(logstep * (mels - min_log_mel))
    return freqs


@functools.lru_cache(maxsize=None)
def mel_filters(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float = None
) -> np.ndarray:
    """Mel filterbank matrix ``(n_mels, 1 + n_fft//2)``.

    Native reimplementation of ``librosa.filters.mel`` with the defaults the
    reference uses (slaney mel scale, slaney area normalization); reference
    ``get_mel_filters`` (audio_signal.py:1298-1331).
    """
    if fmax is None:
        fmax = float(sr) / 2

    fftfreqs = np.linspace(0, float(sr) / 2, 1 + n_fft // 2, endpoint=True)
    mel_f = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0, np.minimum(lower, upper))

    # slaney normalization: scale to be approx constant energy per channel
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def dct_matrix(n_mfcc: int, n_mels: int, norm: str = "ortho") -> np.ndarray:
    """DCT-II matrix ``(n_mels, n_mfcc)``.

    Native reimplementation of ``torchaudio.functional.create_dct``;
    reference ``get_dct`` (audio_signal.py:1371-1396).
    """
    n = np.arange(n_mels, dtype=np.float64)
    k = np.arange(n_mfcc, dtype=np.float64)[:, None]
    dct = np.cos(np.pi / n_mels * (n + 0.5) * k)  # (n_mfcc, n_mels)
    if norm is None:
        dct *= 2.0
    else:
        assert norm == "ortho"
        dct[0] *= 1.0 / np.sqrt(2.0)
        dct *= np.sqrt(2.0 / n_mels)
    return dct.T.astype(np.float32)


def mel_spectrogram(
    audio: jnp.ndarray,
    sample_rate: int,
    n_mels: int = 80,
    mel_fmin: float = 0.0,
    mel_fmax: float = None,
    window_length: int = None,
    hop_length: int = None,
    window_type: str = "hann",
    match_stride: bool = False,
    padding_type: str = "reflect",
    method: str = "fft",
) -> jnp.ndarray:
    """Mel spectrogram ``(..., n_mels, n_frames)`` of ``(..., T)`` audio.

    |STFT| projected through the mel basis with an MXU matmul in full
    precision (reference ``mel_spectrogram``, audio_signal.py:1333-1369).
    """
    if window_length is None:
        window_length = default_win_length(sample_rate)
    if hop_length is None:
        hop_length = window_length // 4
    spec = stft(
        audio, window_length, hop_length, window_type, match_stride,
        padding_type, method,
    )
    magnitude = jnp.abs(spec)
    basis = jnp.asarray(
        mel_filters(sample_rate, window_length, n_mels, mel_fmin, mel_fmax)
    )
    mel = jnp.einsum(
        "...ft,mf->...mt", magnitude, basis, precision=jax.lax.Precision.HIGHEST
    )
    return mel


def mfcc(
    audio: jnp.ndarray,
    sample_rate: int,
    n_mfcc: int = 40,
    n_mels: int = 80,
    log_offset: float = 1e-6,
    **kwargs,
) -> jnp.ndarray:
    """MFCCs ``(..., n_mfcc, n_frames)`` (reference audio_signal.py:1398-1426)."""
    mel = mel_spectrogram(audio, sample_rate, n_mels=n_mels, **kwargs)
    log_mel = jnp.log(mel + log_offset)
    dct = jnp.asarray(dct_matrix(n_mfcc, n_mels, "ortho"))
    out = jnp.einsum(
        "...mt,mk->...kt", log_mel, dct, precision=jax.lax.Precision.HIGHEST
    )
    return out


def log_magnitude(
    magnitude: jnp.ndarray,
    ref_value: float = 1.0,
    amin: float = 1e-5,
    top_db: float = 80.0,
) -> jnp.ndarray:
    """Log-magnitude in dB, librosa ``amplitude_to_db``-compatible
    (reference ``log_magnitude``, audio_signal.py:1457-1487)."""
    amin = amin**2
    log_spec = 10.0 * jnp.log10(jnp.maximum(magnitude**2, amin))
    log_spec = log_spec - 10.0 * np.log10(np.maximum(amin, ref_value))
    if top_db is not None:
        log_spec = jnp.maximum(log_spec, log_spec.max() - top_db)
    return log_spec
