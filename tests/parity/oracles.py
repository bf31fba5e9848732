"""Independent numerical oracles for reference-parity tests.

The reference library delegates its DSP numerics to julius (pure-torch
polyphase resampling / windowed-sinc filtering) and pyloudnorm-designed
BS.1770 filters.  None of those packages exist in this image, so the
oracles here are clean-room torch/scipy transcriptions of the published
algorithms, written in float64 and kept deliberately naive (direct conv,
sequential lfilter) so they share no code path with the implementations
under test in ``audiotools_tpu``.

Algorithm sources (public):
* julius resample_frac / LowPassFilters / SplitBands — adefossez/julius
  (MIT), as used at /root/reference/audiotools/core/audio_signal.py:716-736,
  core/dsp.py:153-215, core/effects.py:386-433.
* ITU-R BS.1770-4 gating and the published 48 kHz K-weighting coefficient
  table (also in /root/reference/tests/core/test_loudness.py).
"""
import math

import numpy as np
import torch
import torch.nn.functional as F


def _sinc(t: torch.Tensor) -> torch.Tensor:
    return torch.where(t == 0, torch.tensor(1.0, dtype=t.dtype), torch.sin(t) / t)


def torch_resample_frac(
    x: torch.Tensor, old_sr: int, new_sr: int, zeros: int = 24,
    rolloff: float = 0.945,
) -> torch.Tensor:
    """julius.resample_frac: polyphase windowed-sinc resampling of the last
    axis, replicate padding, output length ``int(T * new/old)``."""
    x = x.double()
    gcd = math.gcd(old_sr, new_sr)
    old_sr, new_sr = old_sr // gcd, new_sr // gcd
    if old_sr == new_sr:
        return x

    sr = min(new_sr, old_sr) * rolloff
    width = math.ceil(zeros * old_sr / sr)
    idx = torch.arange(-width, width + old_sr, dtype=torch.float64)
    kernels = []
    for i in range(new_sr):
        t = ((-i / new_sr + idx / old_sr) * sr).clamp(-zeros, zeros) * math.pi
        window = torch.cos(t / zeros / 2) ** 2
        kernel = _sinc(t) * window
        kernel /= kernel.sum()
        kernels.append(kernel)
    kernel = torch.stack(kernels).view(new_sr, 1, -1)

    shape = x.shape
    length = shape[-1]
    x = x.reshape(-1, 1, length)
    x = F.pad(x, (width, width + old_sr), mode="replicate")
    ys = F.conv1d(x, kernel, stride=old_sr)
    y = ys.transpose(1, 2).reshape(x.shape[0], -1)
    out_len = int(length * new_sr / old_sr)
    return y[..., :out_len].reshape(shape[:-1] + (out_len,))


def torch_lowpass_filters(
    x: torch.Tensor, cutoffs, zeros: int = 8, pad: bool = True
) -> torch.Tensor:
    """julius.LowPassFilters: all cutoffs share the support dictated by the
    smallest one, each sinc windowed by the full-support hann window.
    Returns ``(n_cutoffs, *x.shape)``."""
    x = x.double()
    cutoffs = list(cutoffs)
    half_size = int(zeros / min(c for c in cutoffs if c > 0) / 2)
    window = torch.hann_window(
        2 * half_size + 1, periodic=False, dtype=torch.float64
    )
    t = torch.arange(-half_size, half_size + 1, dtype=torch.float64)
    filters = []
    for c in cutoffs:
        if c == 0:
            filters.append(torch.zeros_like(t))
        else:
            filt = 2 * c * window * _sinc(2 * c * math.pi * t)
            filt /= filt.sum()
            filters.append(filt)
    weight = torch.stack(filters)[:, None]

    shape = x.shape
    x = x.reshape(-1, 1, shape[-1])
    if pad:
        x = F.pad(x, (half_size, half_size), mode="replicate")
    out = F.conv1d(x, weight)
    return out.permute(1, 0, 2).reshape((len(cutoffs),) + shape)


def torch_lowpass_filter(x: torch.Tensor, cutoff: float, zeros: int = 8):
    """julius.LowPassFilter: the single-cutoff case (own support)."""
    return torch_lowpass_filters(x, [cutoff], zeros=zeros)[0]


def mel_cutoffs(sample_rate: int, n_bands: int):
    """julius.split_bands' interior mel-spaced cutoffs, as a fraction of
    the sample rate (HTK mel scale)."""
    low, high = 0.0, 2595.0 * math.log10(1 + (sample_rate / 2) / 700.0)
    mels = np.linspace(low, high, n_bands + 1)[1:-1]
    hz = 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    return [float(f) / sample_rate for f in hz]


def torch_split_bands(
    x: torch.Tensor, sample_rate: int, n_bands: int, zeros: int = 8
) -> torch.Tensor:
    """julius.SplitBands over mel cutoffs: band 0 is the lowest low-pass,
    interior bands are consecutive low-pass differences, the top band is
    the residual. Returns ``(n_bands, *x.shape)``; bands sum to input."""
    x = x.double()
    lows = torch_lowpass_filters(x, mel_cutoffs(sample_rate, n_bands), zeros)
    bands = [lows[0]]
    for i in range(1, len(lows)):
        bands.append(lows[i] - lows[i - 1])
    bands.append(x - lows[-1])
    return torch.stack(bands)


# ---------------------------------------------------------------------------
# BS.1770
# ---------------------------------------------------------------------------

# Published 48 kHz K-weighting coefficient table (ITU-R BS.1770-4 tables 1-2).
BS1770_48K_SHELF_B = [1.53512485958697, -2.69169618940638, 1.19839281085285]
BS1770_48K_SHELF_A = [1.0, -1.69065929318241, 0.73248077421585]
BS1770_48K_HIGHPASS_B = [1.0, -2.0, 1.0]
BS1770_48K_HIGHPASS_A = [1.0, -1.99004745483398, 0.99007225036621]


def scipy_k_weight(x: np.ndarray, coeff_pairs) -> np.ndarray:
    """Sequential exact-IIR weighting via scipy.signal.lfilter (float64)."""
    from scipy.signal import lfilter

    y = np.asarray(x, dtype=np.float64)
    for b, a in coeff_pairs:
        y = lfilter(b, a, y, axis=-1)
    return y


def numpy_gated_lufs(weighted: np.ndarray, rate: int) -> float:
    """Fresh BS.1770-4 gating (eqs. 1-7) for one ``(nch, nt)`` weighted
    signal, written directly from the spec: 400 ms blocks at 75% overlap,
    -70 LKFS absolute gate, then a relative gate 10 LU under the
    absolute-gated mean."""
    weighted = np.asarray(weighted, dtype=np.float64)
    nch, nt = weighted.shape
    g = np.array([1.0, 1.0, 1.0, 1.41, 1.41])[:nch]

    block = int(0.400 * rate)
    step = block // 4
    n_blocks = math.ceil((max(nt, block) - block) / step) + 1
    padded = np.pad(weighted, ((0, 0), (0, (n_blocks - 1) * step + block - nt)))

    powers = np.empty((n_blocks, nch))
    for j in range(n_blocks):
        seg = padded[:, j * step : j * step + block]
        powers[j] = np.mean(seg**2, axis=-1)

    def lk(p):  # block/mean power -> loudness
        return -0.691 + 10.0 * np.log10(p @ g)

    block_loudness = np.array([lk(p) for p in powers])

    abs_gated = powers[block_loudness > -70.0]
    gamma_r = lk(abs_gated.mean(axis=0)) - 10.0
    both = powers[(block_loudness > -70.0) & (block_loudness > gamma_r)]
    return float(lk(both.mean(axis=0)))


def numpy_phase_vocoder(spec: np.ndarray, rate: float, hop: int, win: int) -> np.ndarray:
    """Flanagan/Laroche phase vocoder, naive float64 per-step loop.

    Same algorithm contract as ``audiotools_tpu.ops.stretch.phase_vocoder``
    (magnitude lerp onto the step grid; per-step principal-value phase
    deviation integrated from frame 0's phase) but implemented as an
    explicit python loop over complex128 — no shared code path.
    """
    F_b, T = spec.shape
    n_steps = int(np.ceil(T / rate))
    phi_adv = 2.0 * np.pi * hop * np.arange(F_b) / win
    out = np.zeros((F_b, n_steps), np.complex128)
    phase_acc = np.angle(spec[:, 0]).astype(np.float64)
    for s in range(n_steps):
        pos = s * rate
        i0 = min(int(np.floor(pos)), T - 1)
        i1 = min(i0 + 1, T - 1)
        frac = pos - i0
        mag = (1.0 - frac) * np.abs(spec[:, i0]) + frac * np.abs(spec[:, i1])
        out[:, s] = mag * np.exp(1j * phase_acc)
        dph = np.angle(spec[:, i1]) - np.angle(spec[:, i0]) - phi_adv
        dph -= 2.0 * np.pi * np.round(dph / (2.0 * np.pi))
        phase_acc = phase_acc + phi_adv + dph
    return out


def torch_time_stretch(
    x: torch.Tensor, factor: float, win: int, hop: int
) -> torch.Tensor:
    """Oracle time stretch: float64 torch.stft (center, reflect, hann) ->
    numpy_phase_vocoder -> torch.istft, out length ``round(T / factor)``."""
    x = x.double()
    T = x.shape[-1]
    out_len = int(round(T / factor))
    window = torch.hann_window(win, dtype=torch.float64)
    spec = torch.stft(
        x.reshape(-1, T), n_fft=win, hop_length=hop, window=window,
        center=True, pad_mode="reflect", return_complex=True,
    )
    stretched = torch.stack([
        torch.from_numpy(
            numpy_phase_vocoder(s.numpy(), factor, hop, win)
        )
        for s in spec
    ])
    y = torch.istft(
        stretched, n_fft=win, hop_length=hop, window=window,
        center=True, length=out_len,
    )
    return y.reshape(x.shape[:-1] + (out_len,))
