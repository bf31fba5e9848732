"""Audacity-style spectral gating noise reduction (mirror of
`/root/reference/audiotools/ml/layers/spectral_gate.py`), as a pure
jittable module: noise statistics -> threshold -> smoothed binary mask ->
masked ISTFT."""
import jax
import jax.numpy as jnp
import numpy as np

from ...core import AudioSignal, STFTParams
from ...core import util


class SpectralGate:
    """Spectral gate for noise reduction (reference spectral_gate.py:10-127).

    Parameters
    ----------
    n_freq : int
        Frequency bins to smooth by, default 3.
    n_time : int
        Time bins to smooth by, default 5.
    """

    def __init__(self, n_freq: int = 3, n_time: int = 5):
        smoothing_filter = np.outer(
            np.concatenate(
                [np.linspace(0, 1, n_freq + 2)[:-1], np.linspace(1, 0, n_freq + 2)]
            )[1:-1],
            np.concatenate(
                [np.linspace(0, 1, n_time + 2)[:-1], np.linspace(1, 0, n_time + 2)]
            )[1:-1],
        )
        smoothing_filter = smoothing_filter / smoothing_filter.sum()
        self.smoothing_filter = jnp.asarray(
            smoothing_filter[None, None].astype(np.float32)
        )

    @staticmethod
    def _fresh_stft(signal: AudioSignal, params: STFTParams) -> AudioSignal:
        """Clone with the gate's analysis parameters and any cached
        spectrogram dropped (forces recompute at these settings)."""
        out = signal.clone()
        out.stft_data = None
        out.stft_params = params
        return out

    def __call__(
        self, audio_signal: AudioSignal, nz_signal: AudioSignal,
        denoise_amount: float = 1.0, n_std: float = 3.0,
        win_length: int = 2048, hop_length: int = 512,
    ):
        """Denoise ``audio_signal`` using noise statistics from
        ``nz_signal`` (reference spectral_gate.py:59-127)."""
        stft_params = STFTParams(win_length, hop_length, "sqrt_hann")
        audio_signal = self._fresh_stft(audio_signal, stft_params)
        nz_signal = self._fresh_stft(nz_signal, stft_params)

        nz_stft_db = 20 * jnp.log10(jnp.maximum(nz_signal.magnitude, 1e-4))
        nz_freq_mean = nz_stft_db.mean(axis=-1, keepdims=True)
        nz_freq_std = nz_stft_db.std(axis=-1, keepdims=True)

        nz_thresh = nz_freq_mean + nz_freq_std * n_std

        stft_db = 20 * jnp.log10(jnp.maximum(audio_signal.magnitude, 1e-4))
        nb, nac, nf, nt = stft_db.shape
        db_thresh = jnp.broadcast_to(nz_thresh, (nb, nac, nf, nt))

        stft_mask = (stft_db < db_thresh).astype(jnp.float32)
        shape = stft_mask.shape

        stft_mask = stft_mask.reshape(nb * nac, 1, nf, nt)
        pad_f = self.smoothing_filter.shape[-2] // 2
        pad_t = self.smoothing_filter.shape[-1] // 2
        stft_mask = jax.lax.conv_general_dilated(
            stft_mask,
            self.smoothing_filter,
            window_strides=(1, 1),
            padding=((pad_f, pad_f), (pad_t, pad_t)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        stft_mask = stft_mask.reshape(shape)
        stft_mask = stft_mask * util.ensure_tensor(
            denoise_amount, ndim=stft_mask.ndim
        )
        stft_mask = 1 - stft_mask

        audio_signal.stft_data = audio_signal.stft_data * stft_mask
        audio_signal.istft()

        return audio_signal

    forward = __call__

    def to(self, device):  # reference-compat no-op
        return self
