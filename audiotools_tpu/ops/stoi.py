"""Batched, jittable STOI (Taal et al. 2010/2011) on device.

The reference computes STOI by looping ``pystoi`` over the batch on the
host (reference metrics/quality.py:9-61); this repo's host mirror does
the same (``metrics/quality.py::stoi``). This module is the TPU-native
path: the full measure — framing, silence removal, one-third-octave
band envelopes, 384 ms sliding-window correlations — as one jitted
program over ``(B, T)`` batches.

The awkward part for XLA is silence removal: the host algorithm
physically deletes quiet frames and splices the survivors, a
data-dependent shape. Here the same semantics run shape-statically: a
stable argsort compacts the retained frames to the front (order
preserved), dropped slots are zeroed, the compacted frames overlap-add
into a fixed-length buffer, and every downstream reduction is masked by
the retained-frame count. Output matches the host implementation to
float32 precision.

All FFTs are at the power-of-two 512 (TPU rule: no arbitrary-length
FFTs), framing/OLA reuse the reshape-based kernels from ``ops.fft``
(no gathers along time), and the sliding correlation windows are a
static-index gather over frames (tiny axis), not samples.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from .fft import _frame, _overlap_add

__all__ = ["FS", "stoi_batch", "thirdoct"]

FS = 10000
N_FRAME = 256
HOP = N_FRAME // 2
NFFT = 512
NUMBAND = 15
MINFREQ = 150
N = 30  # frames per intermediate-intelligibility window (384 ms)
BETA = -15.0
DYN_RANGE = 40.0


@functools.lru_cache(maxsize=None)
def thirdoct(fs=FS, nfft=NFFT, num_bands=NUMBAND, min_freq=MINFREQ):
    """One-third-octave band matrix ``(num_bands, nfft//2+1)`` and the
    band center frequencies (same construction as the host meter)."""
    f = np.linspace(0, fs, nfft + 1)[: nfft // 2 + 1]
    k = np.arange(num_bands)
    cf = 2.0 ** (k / 3.0) * min_freq
    freq_low = min_freq * 2.0 ** ((2 * k - 1) / 6.0)
    freq_high = min_freq * 2.0 ** ((2 * k + 1) / 6.0)
    obm = np.zeros((num_bands, len(f)), dtype=np.float32)
    for i in range(num_bands):
        lo = np.argmin((f - freq_low[i]) ** 2)
        hi = np.argmin((f - freq_high[i]) ** 2)
        obm[i, lo:hi] = 1
    return obm, cf


@functools.lru_cache(maxsize=None)
def _window():
    return np.hanning(N_FRAME + 2)[1:-1].astype(np.float32)


def _band_envelopes(sig, w, obm):
    """(T,) spliced signal -> (NUMBAND, n_frames) band magnitudes."""
    frames = _frame(sig, N_FRAME, HOP) * w
    spec = jnp.abs(jnp.fft.rfft(frames, NFFT)) ** 2
    bands = jnp.matmul(spec, obm.T, precision="highest")
    return jnp.sqrt(jnp.maximum(bands, 1e-15)).T


def _stoi_single_device(x, y, extended):
    """One (reference x, estimate y) pair at 10 kHz -> scalar score."""
    w = jnp.asarray(_window())
    obm = jnp.asarray(thirdoct()[0])

    xf = _frame(x, N_FRAME, HOP) * w  # (n0, 256)
    yf = _frame(y, N_FRAME, HOP) * w
    n0 = xf.shape[0]

    # silence removal keyed on the REFERENCE frame energies: compact the
    # retained frames to the front in original order (unique integer
    # keys make the argsort order deterministic), zero the rest
    energies = 20.0 * jnp.log10(jnp.linalg.norm(xf, axis=-1) + 1e-12)
    mask = energies > energies.max() - DYN_RANGE
    slot = jnp.arange(n0)
    order = jnp.argsort(jnp.where(mask, slot, n0 + slot))
    n_valid = mask.sum()
    keep = (slot < n_valid)[:, None]
    xk = jnp.where(keep, xf[order], 0.0)
    yk = jnp.where(keep, yf[order], 0.0)

    # splice retained frames (the zeroed tail keeps the buffer exact)
    out_len = (n0 - 1) * HOP + N_FRAME
    xs = _overlap_add(xk[None], HOP, out_len)[0]
    ys = _overlap_add(yk[None], HOP, out_len)[0]

    X = _band_envelopes(xs, w, obm)  # (15, n0); cols >= n_valid are junk
    Y = _band_envelopes(ys, w, obm)

    # all N-frame windows at static positions; window p covers frames
    # [p, p+N) and is valid iff it lies inside the retained region
    n_win = n0 - N + 1
    pos = np.arange(n_win)[:, None] + np.arange(N)[None, :]
    Xs = jnp.transpose(X[:, pos], (1, 0, 2))  # (n_win, 15, N)
    Ys = jnp.transpose(Y[:, pos], (1, 0, 2))
    if extended:
        # eSTOI (Jensen & Taal 2016 eq. 3-6): normalize each band across
        # the N frames (axis=-1 in this (n_win, 15, N) layout), THEN each
        # frame across bands (axis=-2), average inner products over the N
        # frames — the host mirror (metrics/quality.py::
        # _row_col_normalize) is the float64 oracle for this branch

        def _rcn(Z):
            Z = Z - Z.mean(axis=-1, keepdims=True)
            Z = Z / (jnp.linalg.norm(Z, axis=-1, keepdims=True) + 1e-12)
            Z = Z - Z.mean(axis=-2, keepdims=True)
            Z = Z / (jnp.linalg.norm(Z, axis=-2, keepdims=True) + 1e-12)
            return Z

        d_win = (_rcn(Xs) * _rcn(Ys)).sum(axis=(-2, -1)) / N
    else:
        alpha = jnp.linalg.norm(Xs, axis=-1, keepdims=True) / (
            jnp.linalg.norm(Ys, axis=-1, keepdims=True) + 1e-12
        )
        aY = jnp.minimum(Ys * alpha, Xs * (1 + 10 ** (-BETA / 20)))
        xm = Xs - Xs.mean(axis=-1, keepdims=True)
        ym = aY - aY.mean(axis=-1, keepdims=True)
        num = (xm * ym).sum(axis=-1)
        den = (
            jnp.linalg.norm(xm, axis=-1) * jnp.linalg.norm(ym, axis=-1)
            + 1e-12
        )
        d_win = (num / den).mean(axis=-1)

    valid = jnp.arange(n_win) + N <= n_valid
    d = jnp.where(valid, d_win, 0.0).sum() / jnp.maximum(valid.sum(), 1)

    # too little retained signal for even one window: undefined (host
    # parity: spliced length under N_FRAME * N samples)
    spliced_len = jnp.maximum(n_valid - 1, 0) * HOP + N_FRAME
    return jnp.where(spliced_len < N_FRAME * N, jnp.nan, d)


@functools.partial(jax.jit, static_argnames=("extended",))
def stoi_batch(references, estimates, extended=False):
    """STOI for ``(B, T)`` reference/estimate pairs at 10 kHz -> ``(B,)``.

    Jittable and vmapped over the batch; resample to ``FS`` (and mono
    mixdown) happens in the caller — ``metrics.quality.stoi_device``
    wires the ``AudioSignal`` surface.
    """
    references = jnp.asarray(references, dtype=jnp.float32)
    estimates = jnp.asarray(estimates, dtype=jnp.float32)
    # trim to the common length (as pesq_batch/nsim_batch do): framing the
    # longer signal against the shorter would clamp-gather garbage frames
    T = min(references.shape[-1], estimates.shape[-1])
    references = references[..., :T]
    estimates = estimates[..., :T]
    if references.shape[-1] < N_FRAME + (N - 1) * HOP:
        # fewer than N frames total: no window can ever be valid
        return jnp.full(references.shape[0], jnp.nan, dtype=jnp.float32)
    fn = lambda x, y: _stoi_single_device(x, y, extended)
    return jax.vmap(fn)(references, estimates)
