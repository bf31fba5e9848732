"""Display mixin: spectrogram/waveform plotting and tensorboard logging.

Mirror of `/root/reference/audiotools/core/display.py`. The reference plots
through ``librosa.display``; librosa is not available here, so axis
handling (time/linear/log/mel) is implemented directly on matplotlib.
"""
import inspect
import typing
from functools import wraps

import numpy as np

from . import util


def format_figure(func):
    """Forward figure-formatting kwargs to ``util.format_figure``
    (reference display.py:8-30)."""

    @wraps(func)
    def wrapper(*args, **kwargs):
        f_keys = inspect.signature(util.format_figure).parameters.keys()
        f_kwargs = {}
        for k, v in list(kwargs.items()):
            if k in f_keys:
                kwargs.pop(k)
                f_kwargs[k] = v
        func(*args, **kwargs)
        util.format_figure(**f_kwargs)

    return wrapper


def _specshow(data, sr, hop_length, x_axis="time", y_axis="linear", n_mels=None):
    """Minimal librosa.display.specshow equivalent on matplotlib."""
    import matplotlib.pyplot as plt

    nf, nt = data.shape
    dur = nt * hop_length / sr
    if y_axis == "mel":
        extent = [0, dur, 0, nf]
        ylabel = "Mel bin"
    else:
        extent = [0, dur, 0, sr / 2]
        ylabel = "Hz"
    ax = plt.gca()
    ax.imshow(
        data,
        origin="lower",
        aspect="auto",
        extent=extent,
        cmap="magma",
        interpolation="nearest",
    )
    if y_axis == "log":
        ax.set_yscale("symlog", base=2, linthresh=64)
    ax.set_xlabel("Time (s)" if x_axis == "time" else x_axis)
    ax.set_ylabel(ylabel)


class DisplayMixin:
    @format_figure
    def specshow(
        self,
        preemphasis: bool = False,
        x_axis: str = "time",
        y_axis: str = "linear",
        n_mels: int = 128,
        **kwargs,
    ):
        """Display a spectrogram (reference display.py:34-80)."""
        import jax.numpy as jnp

        # Always re-compute the STFT data before showing it.
        signal = self.clone()
        signal.stft_data = None

        if preemphasis:
            signal.preemphasis()

        ref = signal.magnitude.max()
        log_mag = signal.log_magnitude(ref_value=float(ref))

        if y_axis == "mel":
            log_mag = 20 * jnp.log10(jnp.maximum(signal.mel_spectrogram(n_mels), 1e-5))
            log_mag -= log_mag.max()

        _specshow(
            np.asarray(log_mag)[0].mean(axis=0),
            sr=signal.sample_rate,
            hop_length=signal.stft_params.hop_length,
            x_axis=x_axis,
            y_axis=y_axis,
            n_mels=n_mels,
        )

    @format_figure
    def waveplot(self, x_axis: str = "time", **kwargs):
        """Display a waveform plot (reference display.py:82-103)."""
        import matplotlib.pyplot as plt

        audio_data = np.asarray(self.audio_data[0]).mean(axis=0)
        t = np.arange(len(audio_data)) / self.sample_rate
        ax = plt.gca()
        ax.fill_between(t, audio_data, -audio_data, alpha=0.75)
        ax.set_xlim(0, t[-1] if len(t) else 1.0)
        ax.set_xlabel("Time (s)" if x_axis == "time" else x_axis)

    @format_figure
    def wavespec(self, x_axis: str = "time", **kwargs):
        """Waveform stacked over spectrogram (reference display.py:105-123)."""
        import matplotlib.pyplot as plt
        from matplotlib.gridspec import GridSpec

        gs = GridSpec(6, 1)
        plt.subplot(gs[0, :])
        self.waveplot(x_axis=x_axis)
        plt.subplot(gs[1:, :])
        self.specshow(x_axis=x_axis, **kwargs)

    def write_audio_to_tb(
        self,
        tag: str,
        writer,
        step: int = None,
        plot_fn: typing.Union[typing.Callable, str] = "specshow",
        **kwargs,
    ):
        """Write signal + spectrogram image to tensorboard
        (reference display.py:125-165)."""
        import matplotlib.pyplot as plt
        import torch

        audio_data = torch.from_numpy(np.asarray(self.audio_data[0, 0]))
        sample_rate = self.sample_rate
        writer.add_audio(tag, audio_data, step, sample_rate)

        if plot_fn is not None:
            if isinstance(plot_fn, str):
                plot_fn = getattr(self, plot_fn)
            fig = plt.figure()
            plt.clf()
            plot_fn(**kwargs)
            writer.add_figure(tag.replace("wav", "png"), fig, step)

    def save_image(
        self,
        image_path: str,
        plot_fn: typing.Union[typing.Callable, str] = "specshow",
        **kwargs,
    ):
        """Save a plot of the signal to a file (reference display.py:167-194)."""
        import matplotlib.pyplot as plt

        if isinstance(plot_fn, str):
            plot_fn = getattr(self, plot_fn)

        plt.clf()
        plot_fn(**kwargs)
        plt.savefig(image_path, bbox_inches="tight", pad_inches=0)
        plt.close()
