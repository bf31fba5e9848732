"""DSP mixin: windowing, filtering, SpecAug masks, phase ops, preemphasis.

Mirror of `/root/reference/audiotools/core/dsp.py`, with every op batched
on-device (the reference loops per item for the filters, dsp.py:177-179;
here per-item cutoffs are handled by a vmapped kernel bank).
"""
import typing

import jax.numpy as jnp
import numpy as np

from . import util
from ..ops import filters as _filters


def _frame_indices(length: int, window_length: int, hop_length: int):
    """Static (n_frames, window_length) index matrix framing a signal of
    ``length`` samples — framing/OLA as a plain gather on a numpy
    constant (no traced indices; CLAUDE.md TPU rule)."""
    n_frames = max(1 + (length - window_length) // hop_length, 0)
    starts = np.arange(n_frames, dtype=np.int32) * hop_length
    offsets = np.arange(window_length, dtype=np.int32)
    return starts[:, None] + offsets[None, :]


class DSPMixin:
    _original_batch_size = None
    _original_num_channels = None
    _padded_signal_length = None

    def _preprocess_signal_for_windowing(self, window_duration, hop_duration):
        """Snap the window to a hop multiple, pad by one hop each side,
        and remember the original layout for ``overlap_and_add``."""
        self._original_batch_size = self.batch_size
        self._original_num_channels = self.num_channels
        hop_length = int(hop_duration * self.sample_rate)
        window_length = int(window_duration * self.sample_rate)
        window_length -= window_length % hop_length
        self.zero_pad(hop_length, hop_length)
        self._padded_signal_length = self.signal_length
        return window_length, hop_length

    def _windowing_lengths(self, window_duration, hop_duration, preprocess):
        if preprocess:
            return self._preprocess_signal_for_windowing(
                window_duration, hop_duration
            )
        return (
            int(window_duration * self.sample_rate),
            int(hop_duration * self.sample_rate),
        )

    def windows(self, window_duration: float, hop_duration: float,
                preprocess: bool = True):
        """Generator yielding AudioSignal windows (reference dsp.py:31-68)."""
        window_length, hop_length = self._windowing_lengths(
            window_duration, hop_duration, preprocess
        )

        self.audio_data = self.audio_data.reshape(-1, 1, self.signal_length)
        n_frames = max(
            1 + (self.signal_length - window_length) // hop_length, 0
        )
        for b in range(self.batch_size):
            for i in range(n_frames):
                start = i * hop_length
                yield self[b, ..., start : start + window_length]

    def collect_windows(self, window_duration: float, hop_duration: float,
                        preprocess: bool = True):
        """Reshape into overlapping windows along the batch dim
        (reference dsp.py:70-108)."""
        window_length, hop_length = self._windowing_lengths(
            window_duration, hop_duration, preprocess
        )
        frames = _frame_indices(self.signal_length, window_length, hop_length)
        flat = self.audio_data.reshape(-1, self.signal_length)
        self.audio_data = flat[:, frames].reshape(-1, 1, window_length)
        return self

    def overlap_and_add(self, hop_duration: float):
        """Overlap-add windows back into a signal, dividing by the fold
        count per sample (reference dsp.py:110-151)."""
        hop_length = int(hop_duration * self.sample_rate)
        window_length = self.signal_length
        nb, nch = self._original_batch_size, self._original_num_channels
        out_len = self._padded_signal_length

        stacked = self.audio_data.reshape(nb * nch, -1, window_length)
        n_frames = stacked.shape[1]
        scatter = _frame_indices(
            out_len, window_length, hop_length
        )[:n_frames].reshape(-1)

        folded = jnp.zeros((nb * nch, out_len), dtype=stacked.dtype)
        folded = folded.at[:, scatter].add(stacked.reshape(nb * nch, -1))
        coverage = (
            jnp.zeros((out_len,), dtype=stacked.dtype)
            .at[scatter]
            .add(jnp.ones((scatter.size,), dtype=stacked.dtype))
        )
        self.audio_data = (folded / coverage).reshape(nb, nch, -1)
        self.trim(hop_length, hop_length)
        return self

    def low_pass(self, cutoffs, zeros: int = 51, min_cutoff_hz: float = None,
                 block_size="auto"):
        """Batched low-pass with per-item cutoffs in Hz
        (reference dsp.py:153-183).

        ``min_cutoff_hz`` bounds the static sinc support when the cutoffs
        are traced (concrete cutoffs bound it automatically);
        ``block_size`` selects pow2 overlap-save convolution.
        """
        cutoffs = util.ensure_tensor(cutoffs, 2, self.batch_size)
        kw = {} if min_cutoff_hz is None else {"min_cutoff_hz": min_cutoff_hz}
        self.audio_data = _filters.low_pass(
            self.audio_data, cutoffs.reshape(-1), self.sample_rate, zeros,
            block_size=block_size, **kw,
        )
        self.stft_data = None
        return self

    def high_pass(self, cutoffs, zeros: int = 51, min_cutoff_hz: float = None,
                  block_size="auto"):
        """Batched high-pass with per-item cutoffs in Hz
        (reference dsp.py:185-215)."""
        cutoffs = util.ensure_tensor(cutoffs, 2, self.batch_size)
        kw = {} if min_cutoff_hz is None else {"min_cutoff_hz": min_cutoff_hz}
        self.audio_data = _filters.high_pass(
            self.audio_data, cutoffs.reshape(-1), self.sample_rate, zeros,
            block_size=block_size, **kw,
        )
        self.stft_data = None
        return self

    def mask_frequencies(self, fmin_hz, fmax_hz, val: float = 0.0):
        """SpecAug frequency masking (reference dsp.py:217-260)."""
        mag, phase = self.magnitude, self.phase
        fmin_hz = util.ensure_tensor(fmin_hz, ndim=mag.ndim)
        fmax_hz = util.ensure_tensor(fmax_hz, ndim=mag.ndim)

        nbins = mag.shape[-2]
        bins_hz = jnp.linspace(0, self.sample_rate / 2, nbins)
        bins_hz = jnp.broadcast_to(
            bins_hz[None, None, :, None],
            (self.batch_size, 1, nbins, mag.shape[-1]),
        )
        mask = (fmin_hz <= bins_hz) & (bins_hz < fmax_hz)

        mag = jnp.where(mask, val, mag)
        phase = jnp.where(mask, val, phase)
        self.stft_data = mag * jnp.exp(1j * phase)
        return self

    def mask_timesteps(self, tmin_s, tmax_s, val: float = 0.0):
        """SpecAug time masking (reference dsp.py:262-305)."""
        mag, phase = self.magnitude, self.phase
        tmin_s = util.ensure_tensor(tmin_s, ndim=mag.ndim)
        tmax_s = util.ensure_tensor(tmax_s, ndim=mag.ndim)

        nt = mag.shape[-1]
        bins_t = jnp.linspace(0, self.signal_duration, nt)
        bins_t = jnp.broadcast_to(
            bins_t[None, None, None, :],
            (self.batch_size, 1, mag.shape[-2], nt),
        )
        mask = (tmin_s <= bins_t) & (bins_t < tmax_s)

        mag = jnp.where(mask, val, mag)
        phase = jnp.where(mask, val, phase)
        self.stft_data = mag * jnp.exp(1j * phase)
        return self

    def mask_low_magnitudes(self, db_cutoff, val: float = 0.0):
        """Mask away low-magnitude cells (reference dsp.py:307-334)."""
        mag = self.magnitude
        log_mag = self.log_magnitude()

        db_cutoff = util.ensure_tensor(db_cutoff, ndim=mag.ndim)
        mask = log_mag < db_cutoff
        mag = jnp.where(mask, val, mag)

        self.magnitude = mag
        return self

    def shift_phase(self, shift):
        """Constant phase shift (reference dsp.py:336-352)."""
        phase = self.phase
        shift = util.ensure_tensor(shift)
        if shift.ndim == phase.ndim - 1 and shift.shape == phase.shape[1:]:
            # a full per-item (C, F, T) correction (CorruptPhase single
            # instantiation): broadcast over the batch dim
            shift = shift[None, ...]
        else:
            shift = util.ensure_tensor(shift, ndim=phase.ndim)
        self.phase = phase + shift
        return self

    def corrupt_phase(self, scale, key=None):
        """Add Gaussian noise to the phase (reference dsp.py:354-370).

        Randomness is explicit in JAX: pass a ``jax.random`` key, or omit it
        to draw from numpy's global RNG on host.
        """
        import jax

        scale = util.ensure_tensor(scale, ndim=self.phase.ndim)
        if key is None:
            noise = jnp.asarray(
                np.random.randn(*self.phase.shape).astype(np.float32)
            )
        else:
            noise = jax.random.normal(key, self.phase.shape)
        self.phase = self.phase + scale * noise
        return self

    def preemphasis(self, coef: float = 0.85):
        """Pre-emphasis filter (reference dsp.py:372-390)."""
        self.audio_data = _filters.preemphasis(self.audio_data, coef)
        return self
