"""Batched, jittable P.862-architecture PESQ on device.

The reference computes PESQ by looping the ``pesq`` C extension over the
batch on the host (reference metrics/quality.py:64-102); this repo's
host mirror (``metrics/_pesq.py``) does the same with a native
implementation. This module is the TPU-native path: the full
P.862-architecture pipeline — level alignment, receive filtering,
two-stage delay estimation, Bark pitch-power densities, partial
frequency/gain compensation, Zwicker loudness, masked + asymmetric
disturbance, L6/L2 aggregation, MOS-LQO map — as one jitted program
over ``(B, T)`` batches. The reference has no batched or on-device
PESQ at all.

Numerics are intentionally the same as ``metrics/_pesq.py`` (all mode
tables are imported from it), with the alignment realized
shape-statically instead of by trimming:

- the degraded signal is rolled by the estimated delay and a valid
  window mask replaces the host's physical trim,
- frames are computed on the full static grid; the fully-valid frames
  (a contiguous run) are rolled to the front so the gain-smoothing
  recursion warmup, active-frame statistics, and the 320 ms L6 chunk
  boundaries all reproduce the host's trimmed-from-start semantics,
- the first-order gain smoother runs as a ``lax.associative_scan``
  (log-depth) affine recurrence rather than a Python loop.

For zero-delay pairs the result matches the host implementation to
float32 precision. For delayed pairs the framing phase can differ from
the host by up to one hop (the host re-frames from the trim point, the
static grid cannot), which moves scores by a few hundredths of a MOS
point — the tests pin both regimes.

All FFTs are powers of two (TPU rule), Bark-band grouping is a
(bins, bands) 0/1 matmul, framing reuses the reshape-based kernel from
``ops.fft``. Like the host path, narrowband expects 8 kHz input and
wideband 16 kHz.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .fft import _frame

__all__ = ["pesq_batch"]

_TARGET_POWER = 1e7
_ACTIVE_THRESH = 1e-2 * _TARGET_POWER * 1e-4
_CHUNK = 20  # frames per L6 sub-interval (~320 ms at 50% overlap)


@functools.lru_cache(maxsize=None)
def _mode_tables(mode: str, n_fft: int):
    """Pure-numpy constants for one mode, derived from the host
    implementation's tables so both paths share numerics by construction.

    ``n_fft`` is the padded transform length used for the level/receive
    full-signal filters (depends on T, hence a cache key).
    """
    from ..metrics import _pesq as host

    if mode not in host._MODES:
        raise ValueError(f"mode must be 'nb' or 'wb', got {mode!r}")
    m = host._MODES[mode]

    # full-signal filter gains on the padded rfft grid
    freqs = np.fft.rfftfreq(n_fft, d=1.0 / m.fs)
    level_gain = ((freqs > 300.0) & (freqs < 0.475 * m.fs)).astype(np.float32)
    if mode == "wb":
        recv_gain = 1.0 / (1.0 + (100.0 / np.maximum(freqs, 1e-9)) ** 8)
    else:
        pts_hz = np.array(
            [50.0, 135.0, 250.0, 300.0, 500.0, 1000.0, 2000.0, 3000.0, 3400.0, 4000.0]
        )
        pts_db = np.array(
            [-40.0, -20.0, -6.0, -2.0, 0.0, 0.0, 2.0, 4.0, -2.0, -40.0]
        )
        lf = np.log10(np.maximum(freqs, 1.0))
        g_db = np.interp(lf, np.log10(pts_hz), pts_db, left=-60.0, right=-60.0)
        recv_gain = 10.0 ** (g_db / 20.0)
    recv_gain = recv_gain.astype(np.float32)

    # Bark grouping as a (valid_bins, n_bands) 0/1 matrix
    onehot = np.zeros((int(m.valid_bin.sum()), m.n_bands), dtype=np.float32)
    onehot[np.arange(onehot.shape[0]), m.band_of_bin[m.valid_bin]] = 1.0

    return dict(
        fs=m.fs,
        frame=m.frame,
        hop=m.hop,
        n_bands=m.n_bands,
        level_gain=level_gain,
        recv_gain=recv_gain,
        valid_bin=np.where(m.valid_bin)[0],
        onehot=onehot,
        bin_counts=m.band_bin_counts.astype(np.float32),
        abs_thresh=m.abs_thresh.astype(np.float32),
        band_widths=m.band_widths_bark.astype(np.float32),
        spl0=np.float32(host._SPL0),
        d_sym=np.float32(host._D_SYM_SCALE),
        d_asym=np.float32(host._D_ASYM_SCALE),
        d_loss=np.float32(host._D_LOSS_SCALE),
        zwicker_p=np.float32(host._ZWICKER_P),
        loud_scale=np.float32(host._LOUDNESS_SCALE),
    )


def _level_and_receive(x, tab):
    """Level alignment + receive filtering via one padded rfft
    (host _pesq.py:107-143 semantics: gains measured on the truncated
    filtered signal, not via Parseval over the padded length)."""
    T = x.shape[-1]
    n = int(2 ** np.ceil(np.log2(max(T, 2))))
    X = jnp.fft.rfft(x, n=n)
    band = jnp.fft.irfft(X * jnp.asarray(tab["level_gain"]), n=n)[..., :T]
    p = jnp.mean(band**2, axis=-1, keepdims=True) + 1e-30
    scale = jnp.sqrt(_TARGET_POWER / p)
    filt = jnp.fft.irfft(X * jnp.asarray(tab["recv_gain"]), n=n)[..., :T]
    return filt * scale


def _coarse_delay(x, y, win):
    """Log-energy-envelope cross-correlation lag, in envelope frames
    (host _pesq.py:157-171), via a padded-FFT circular correlation."""
    T = x.shape[-1]
    nE = T // win
    ex = jnp.log10(jnp.sum(x[: nE * win].reshape(nE, win) ** 2, axis=1) + 1e4)
    ey = jnp.log10(jnp.sum(y[: nE * win].reshape(nE, win) ** 2, axis=1) + 1e4)
    ex = ex - ex.mean()
    ey = ey - ey.mean()
    M = int(2 ** np.ceil(np.log2(max(2 * nE, 2))))
    c = jnp.fft.irfft(
        jnp.fft.rfft(ey, n=M) * jnp.conj(jnp.fft.rfft(ex, n=M)), n=M
    )  # c[l] = sum_i ey[i + l] ex[i], negative lags wrapped to the top
    lags = np.concatenate([np.arange(nE), np.arange(-(nE - 1), 0)])
    vals = jnp.concatenate([c[:nE], c[M - (nE - 1) :]])
    # tie-break exactly like the host (_pesq.py): among near-equal
    # maxima (flat correlation — silent/constant degraded signal) pick
    # the lag nearest zero, negative lag first on |lag| ties
    lags_j = jnp.asarray(lags)
    tol = 1e-9 * jnp.maximum(jnp.abs(vals).max(), 1.0)
    tied = vals >= vals.max() - tol
    key = jnp.abs(lags_j) * 2 + (lags_j > 0)
    key = jnp.where(tied, key, jnp.iinfo(jnp.int32).max)
    return lags_j[jnp.argmin(key)]


def _fine_delay(x, y, coarse, fs):
    """Rectified-signal correlation over a static +-2 ms lag grid around
    the coarse estimate (host _pesq.py:173-188), normalized by overlap."""
    T = x.shape[-1]
    span = int(0.002 * fs)
    step = max(span // 16, 1)
    # grid ordered nearest-first so argmax's first-max tie rule matches
    # the host's strict-improvement visit order (_pesq.py fine search)
    off_np = np.arange(-span, span + 1, step)
    offsets = jnp.asarray(off_np[np.lexsort((off_np, np.abs(off_np)))])
    r = jnp.abs(x)
    d = jnp.abs(y)
    idx = jnp.arange(T)

    def score(off):
        lag = coarse + off
        d_s = jnp.roll(d, -lag)
        m = (idx + lag >= 0) & (idx + lag < T)
        mf = m.astype(r.dtype)
        return jnp.dot(r * mf, d_s) / (jnp.sum(mf) + 1e-9)

    # one compiled body for the ~33-lag grid instead of an unrolled loop
    vals = jax.vmap(score)(offsets)
    return coarse + offsets[jnp.argmax(vals)]


def _smooth_gain(g):
    """g_s[i] = 0.8 g_s[i-1] + 0.2 g[i] with g_s[-1] = g[0]
    (host _pesq.py:265-269) as an associative affine scan."""

    def combine(p, q):
        a1, b1 = p
        a2, b2 = q
        return a1 * a2, a2 * b1 + b2

    a = jnp.full_like(g, 0.8)
    A, B = lax.associative_scan(combine, (a, 0.2 * g))
    return A * g[0] + B


def _aggregate(d, n_valid_frames):
    """L6 over CHUNK-frame sub-intervals, L2 over chunks
    (host _pesq.py:298-303). ``d`` is zero past the valid prefix, so the
    partial last chunk's zero fill matches the host's zero pad; wholly
    invalid chunks are masked out of the L2 mean."""
    F = d.shape[-1]
    Fp = -(-F // _CHUNK) * _CHUNK
    d = jnp.pad(d, (0, Fp - F)).reshape(-1, _CHUNK)
    d6 = jnp.mean(d**6.0, axis=1) ** (1.0 / 6.0)
    n_chunks = jnp.ceil(n_valid_frames / _CHUNK)
    cmask = (jnp.arange(d6.shape[0]) < n_chunks).astype(d.dtype)
    return jnp.sqrt(jnp.sum(cmask * d6**2.0) / jnp.maximum(n_chunks, 1.0))


def _pesq_single(x, y, mode, T):
    tab = _mode_tables(mode, int(2 ** np.ceil(np.log2(max(T, 2)))))
    fs, frame, hop = tab["fs"], tab["frame"], tab["hop"]

    x = _level_and_receive(x, tab)
    y = _level_and_receive(y, tab)

    win = max(int(0.004 * fs), 1)
    delay = _fine_delay(x, y, _coarse_delay(x, y, win) * win, fs)

    # align by rolling the degraded signal; the window of sample indices
    # where both sides are genuine data replaces the host's trim
    y = jnp.roll(y, -delay)
    s0 = jnp.maximum(0, -delay)
    e0 = T - jnp.maximum(0, delay)

    # Bark pitch-power densities on the full static frame grid
    w = jnp.asarray(np.hanning(frame).astype(np.float32))
    w_pow = float(np.mean(np.hanning(frame) ** 2))

    def bark(sig):
        fr = _frame(sig, frame, hop) * w
        spec = jnp.abs(jnp.fft.rfft(fr, axis=-1)) ** 2 / (w_pow * frame)
        return (spec[:, jnp.asarray(tab["valid_bin"])] @ jnp.asarray(
            tab["onehot"]
        )) / jnp.asarray(tab["bin_counts"])

    B_ref = bark(x)
    B_deg = bark(y)
    F = B_ref.shape[0]

    starts = jnp.arange(F) * hop
    valid = (starts >= s0) & (starts + frame <= e0)  # contiguous run
    # roll the valid run to the front: downstream warmups, active-frame
    # statistics and chunk boundaries then match the host's re-framed
    # trimmed signal (up to the sub-hop framing phase)
    f0 = jnp.argmax(valid)
    nv = jnp.sum(valid)
    B_ref = jnp.roll(B_ref, -f0, axis=0)
    B_deg = jnp.roll(B_deg, -f0, axis=0)
    vmask = (jnp.arange(F) < nv).astype(B_ref.dtype)

    frame_pow = B_ref.sum(axis=1)
    active = (frame_pow > _ACTIVE_THRESH).astype(B_ref.dtype) * vmask
    active = jnp.where(jnp.sum(active) > 0, active, vmask)

    # partial frequency compensation (host _pesq.py:252-259)
    n_act = jnp.sum(active) + 1e-9
    mean_ref = jnp.sum(B_ref * active[:, None], axis=0) / n_act
    mean_deg = jnp.sum(B_deg * active[:, None], axis=0) / n_act
    comp = jnp.clip((mean_deg + 1e3) / (mean_ref + 1e3), 1e-2, 1e2)
    B_ref_eq = B_ref * comp[None, :]

    # short-term gain compensation (host _pesq.py:261-270); invalid
    # frames take the first valid frame's gain so the recurrence reaches
    # the valid prefix in the host's warmed-up state
    g = (B_ref_eq.sum(axis=1) + 5e3) / (B_deg.sum(axis=1) + 5e3)
    g = jnp.clip(g, 3e-4, 5.0)
    g = jnp.where(vmask > 0, g, g[0])
    B_deg_eq = B_deg * _smooth_gain(g)[:, None]

    # Zwicker loudness (host _pesq.py:225-234)
    p0 = jnp.asarray(tab["abs_thresh"])[None, :]
    zp = tab["zwicker_p"]

    def loud(b):
        ratio = jnp.maximum(b / p0, 0.0)
        L = (
            tab["loud_scale"]
            * (p0 / (0.5 * tab["spl0"])) ** zp
            * ((0.5 + 0.5 * ratio) ** zp - 1.0)
        )
        return jnp.maximum(L, 0.0)

    L_ref = loud(B_ref_eq)
    L_deg = loud(B_deg_eq)

    # masked + asymmetric disturbance (host _pesq.py:277-295)
    diff = L_deg - L_ref
    dead = 0.25 * jnp.minimum(L_deg, L_ref)
    disturb = jnp.sign(diff) * jnp.maximum(jnp.abs(diff) - dead, 0.0)
    h = ((B_deg_eq + 50.0) / (B_ref_eq + 50.0)) ** 1.2
    h = jnp.where(h < 3.0, 0.0, jnp.minimum(h, 12.0))

    wb = jnp.asarray(tab["band_widths"])[None, :]
    wb_sum = jnp.sum(wb)
    d_frame = (jnp.sum(wb * jnp.abs(disturb) ** 2.0, axis=1) / wb_sum) ** 0.5
    da_frame = jnp.sum(jnp.abs(disturb * h) * wb, axis=1) / wb_sum

    wf = ((frame_pow + 1e5) / 1e7) ** 0.04
    d_frame = jnp.minimum(d_frame / wf, 45.0) * vmask
    da_frame = jnp.minimum(da_frame / wf, 45.0) * vmask

    # subtractive-loss channel (host _pesq.py _D_LOSS_SCALE): fraction
    # of audible reference loudness with no degraded counterpart,
    # cubed and averaged over the active frames
    loss = jnp.sum(wb * jnp.maximum(L_ref - L_deg, 0.0), axis=1) / (
        jnp.sum(wb * L_ref, axis=1) + 1e-12
    )
    d_loss = jnp.sum(active * loss**3) / (jnp.sum(active) + 1e-9)

    raw = (
        4.5
        - tab["d_sym"] * _aggregate(d_frame, nv)
        - tab["d_asym"] * _aggregate(da_frame, nv)
        - tab["d_loss"] * d_loss
    )
    if mode == "wb":
        mos = 0.999 + 4.999 / (1.0 + jnp.exp(-1.338 * raw + 5.035))
    else:
        mos = 0.999 + 4.0 / (1.0 + jnp.exp(-1.4945 * raw + 4.6607))
    # alignment left no fully-valid frame (e.g. the estimated delay
    # pushes the overlap window off the signal): every disturbance term
    # above degenerates to 0 and `raw` collapses to its 4.5 ceiling — a
    # perfect score for a pair with no usable overlap. Undefined, as in
    # stoi's too-short guard.
    return jnp.where(nv > 0, mos, jnp.nan)


@functools.partial(jax.jit, static_argnames=("mode",))
def pesq_batch(references, estimates, mode: str = "wb"):
    """MOS-LQO estimates for ``(B, T)`` reference/degraded pairs already
    at the mode's sample rate (nb: 8 kHz, wb: 16 kHz). Returns ``(B,)``.

    Each item is level-aligned, receive-filtered, delay-aligned and
    scored independently (one ``vmap`` over the P.862 pipeline).
    Length-mismatched pairs are trimmed to the shorter signal — the
    delay-alignment stage absorbs the offset, matching what the host
    path's post-alignment trim does."""
    references = jnp.asarray(references, dtype=jnp.float32)
    estimates = jnp.asarray(estimates, dtype=jnp.float32)
    if references.shape[-1] != estimates.shape[-1]:
        T = min(references.shape[-1], estimates.shape[-1])
        references = references[..., :T]
        estimates = estimates[..., :T]
    T = references.shape[-1]
    tab = _mode_tables(mode, 2)  # validates the mode eagerly
    if T < 4 * tab["frame"]:
        raise ValueError("signals too short for PESQ (need >= 4 frames)")
    fn = lambda x, y: _pesq_single(x, y, mode, T)
    return jax.vmap(fn)(references, estimates)
