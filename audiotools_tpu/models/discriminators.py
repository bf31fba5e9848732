"""Adversarial discriminators for codec training (DAC/HiFi-GAN recipe).

The reference library ships no model code (SURVEY.md §2) — this extends
the flagship :class:`~audiotools_tpu.models.dac.DAC` codec with the
discriminator ensemble the published DAC recipe trains against, built
from scratch in flax for a ``jax.sharding.Mesh``:

* **MPD** — multi-period waveform discriminators (HiFi-GAN): the signal
  is folded into ``(T / p, p)`` planes per prime period ``p`` and judged
  by 2-D conv stacks, so periodic artifacts at any of the periods light
  up a dedicated column.
* **MRD** — multi-resolution spectrogram discriminators: complex STFTs
  at several window sizes, split into frequency bands, judged by 2-D
  conv stacks over (time, freq, re/im) — phase-aware where a magnitude
  mel loss is not.

Every sub-discriminator returns its intermediate feature maps (for the
feature-matching loss) with the final logit map last.  All convs are
NHWC 2-D convs that XLA tiles onto the MXU; pass ``dtype=jnp.bfloat16``
for mixed-precision discriminator passes (params stay f32).
"""
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import fft as _fft

_LEAK = 0.1


def _conv(ch, kernel, strides=(1, 1), dtype=None, weight_norm=True):
    """2-D conv, weight-normalized by default as in the published DAC/
    HiFi-GAN discriminators (decouples each filter's direction from its
    magnitude — the standard GAN-discriminator conditioning trick)."""
    conv = nn.Conv(ch, kernel_size=kernel, strides=strides, dtype=dtype)
    return nn.WeightNorm(conv) if weight_norm else conv

# frequency-band split points (fractions of the rfft bins) for the
# multi-band spectrogram discriminators, as in the published DAC config
BAND_SPLITS: Tuple[Tuple[float, float], ...] = (
    (0.0, 0.1),
    (0.1, 0.25),
    (0.25, 0.5),
    (0.5, 0.75),
    (0.75, 1.0),
)


class PeriodDiscriminator(nn.Module):
    """One MPD column: fold ``(B, T)`` into ``(B, T/p, p, 1)`` and run a
    strided 2-D conv stack down the time axis."""

    period: int
    channels: Sequence[int] = (32, 128, 512, 1024)
    weight_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x: (B, T) waveform
        B, T = x.shape
        p = self.period
        pad = (p - T % p) % p
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="edge")
        h = x.reshape(B, -1, p, 1)
        if self.dtype is not None:
            h = h.astype(self.dtype)
        feats = []
        for ch in self.channels:
            h = _conv(ch, (5, 1), (3, 1), self.dtype, self.weight_norm)(h)
            h = nn.leaky_relu(h, _LEAK)
            feats.append(h)
        h = _conv(
            self.channels[-1], (5, 1), dtype=self.dtype,
            weight_norm=self.weight_norm,
        )(h)
        h = nn.leaky_relu(h, _LEAK)
        feats.append(h)
        logits = _conv(
            1, (3, 1), dtype=self.dtype, weight_norm=self.weight_norm
        )(h)
        feats.append(logits.astype(jnp.float32))
        return feats


class BandSpectrogramDiscriminator(nn.Module):
    """One MRD column: complex STFT at ``window_length``, split into
    frequency bands, each judged by its own conv stack; band features are
    re-joined along the frequency axis for the final logit map."""

    window_length: int
    channels: int = 32
    bands: Tuple[Tuple[float, float], ...] = BAND_SPLITS
    # MXU DFT-matmul analysis by default (~1e-5 vs fft, and its backward
    # is matmul transposes: MRD fwd+bwd 17.7 -> 16.7 ms on v5e,
    # tests/hw/hw_mrd_probe.py); pass "fft" for the bit-matched path.
    stft_method: str = "matmul"
    weight_norm: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # x: (B, T) waveform -> (B, frames, bins, 2) re/im image
        hop = self.window_length // 4
        spec = _fft.stft(
            x, self.window_length, hop, "hann", method=self.stft_method
        )  # (B, F, frames) complex
        img = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        img = jnp.swapaxes(img, 1, 2)  # (B, frames, F, 2)
        if self.dtype is not None:
            img = img.astype(self.dtype)
        n_bins = img.shape[2]
        edges = [int(round(f * n_bins)) for f, _ in self.bands] + [n_bins]

        feats = []
        outs = []
        for b in range(len(self.bands)):
            h = img[:, :, edges[b] : edges[b + 1], :]
            for i in range(4):
                h = _conv(
                    self.channels,
                    (3, 9),
                    (1, 2) if i else (1, 1),
                    self.dtype,
                    self.weight_norm,
                )(h)
                h = nn.leaky_relu(h, _LEAK)
                feats.append(h)
            h = _conv(
                self.channels, (3, 3), dtype=self.dtype,
                weight_norm=self.weight_norm,
            )(h)
            h = nn.leaky_relu(h, _LEAK)
            feats.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)  # re-join bands along freq
        logits = _conv(
            1, (3, 3), dtype=self.dtype, weight_norm=self.weight_norm
        )(h)
        feats.append(logits.astype(jnp.float32))
        return feats


class Discriminator(nn.Module):
    """The full DAC discriminator ensemble: MPD at prime periods + MRD at
    three STFT resolutions.  ``__call__`` takes ``(B, 1, T)`` (or
    ``(B, T)``) audio and returns one feature-map list per
    sub-discriminator, final logits last in each list."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    fft_sizes: Tuple[int, ...] = (2048, 1024, 512)
    mpd_channels: Sequence[int] = (32, 128, 512, 1024)
    mrd_channels: int = 32
    bands: Tuple[Tuple[float, float], ...] = BAND_SPLITS
    stft_method: str = "matmul"  # see BandSpectrogramDiscriminator
    weight_norm: bool = True
    dtype: Any = None

    def setup(self):
        self.mpd = [
            PeriodDiscriminator(
                p,
                tuple(self.mpd_channels),
                weight_norm=self.weight_norm,
                dtype=self.dtype,
            )
            for p in self.periods
        ]
        self.mrd = [
            BandSpectrogramDiscriminator(
                n,
                self.mrd_channels,
                tuple(self.bands),
                stft_method=self.stft_method,
                weight_norm=self.weight_norm,
                dtype=self.dtype,
            )
            for n in self.fft_sizes
        ]

    def __call__(self, audio):
        if audio.ndim == 3:
            x = audio[:, 0, :]
        else:
            x = audio
        x = x.astype(jnp.float32)
        return [d(x) for d in self.mpd] + [d(x) for d in self.mrd]
