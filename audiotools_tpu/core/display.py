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
        accepted = inspect.signature(util.format_figure).parameters
        fig_kwargs = {k: kwargs.pop(k) for k in list(kwargs) if k in accepted}
        func(*args, **kwargs)
        util.format_figure(**fig_kwargs)

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
        self, preemphasis: bool = False, x_axis: str = "time",
        y_axis: str = "linear", n_mels: int = 128, **kwargs,
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
        """Waveform stacked over spectrogram (parity with reference
        display.py:105-123: a 1:5 vertical split)."""
        import matplotlib.pyplot as plt

        plt.subplot2grid((6, 1), (0, 0))
        self.waveplot(x_axis=x_axis)
        plt.subplot2grid((6, 1), (1, 0), rowspan=5)
        self.specshow(x_axis=x_axis, **kwargs)

    def _plot_to_current_figure(self, plot_fn, **kwargs):
        """Resolve ``plot_fn`` (name or callable) and draw onto a cleared
        current figure; returns the figure."""
        import matplotlib.pyplot as plt

        fig = plt.gcf()
        plt.clf()
        if isinstance(plot_fn, str):
            plot_fn = getattr(self, plot_fn)
        plot_fn(**kwargs)
        return fig

    def write_audio_to_tb(
        self, tag: str, writer, step: int = None,
        plot_fn: typing.Union[typing.Callable, str] = "specshow", **kwargs,
    ):
        """Write signal + spectrogram image to tensorboard
        (parity with reference display.py:125-165)."""
        import torch

        samples = torch.from_numpy(np.asarray(self.audio_data[0, 0]))
        writer.add_audio(tag, samples, step, self.sample_rate)
        if plot_fn is not None:
            fig = self._plot_to_current_figure(plot_fn, **kwargs)
            writer.add_figure(tag.replace("wav", "png"), fig, step)

    def save_image(
        self, image_path: str,
        plot_fn: typing.Union[typing.Callable, str] = "specshow", **kwargs,
    ):
        """Save a plot of the signal to a file (parity with reference
        display.py:167-194)."""
        import matplotlib.pyplot as plt

        self._plot_to_current_figure(plot_fn, **kwargs)
        plt.savefig(image_path, bbox_inches="tight", pad_inches=0)
        plt.close()
