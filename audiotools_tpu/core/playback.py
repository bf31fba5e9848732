"""Playback mixin: notebook embeds, an HTML/JS player widget, and local
playback.

Mirror of `/root/reference/audiotools/core/playback.py`. The widget
templates are an original minimal player (image + seek cursor + levels
strip + HTML5 audio element).
"""
import base64
import io
import random
import shutil
import string
import subprocess
from pathlib import Path
from tempfile import NamedTemporaryFile

from .util import _close_temp_files

_TEMPLATES = Path(__file__).parent / "templates"
headers = (_TEMPLATES / "headers.html").read_text()
widget = (_TEMPLATES / "widget.html").read_text()

DEFAULT_EXTENSION = ".wav"


def _check_imports():
    try:
        import IPython
    except ImportError:
        raise ImportError("embed/play requires IPython, which is not installed")
    return None, IPython


class PlayMixin:
    def embed(self, ext: str = None, display: bool = True, return_html: bool = False):
        """Embed audio as a playable element in a notebook
        (reference playback.py:39-94)."""
        if ext is None:
            ext = DEFAULT_EXTENSION
        ext = f".{ext}" if not ext.startswith(".") else ext
        _, IPython = _check_imports()
        sr = self.sample_rate
        tmpfiles = []

        with _close_temp_files(tmpfiles):
            tmp_wav = NamedTemporaryFile(mode="w+", suffix=".wav", delete=False)
            tmpfiles.append(tmp_wav)
            self.write(tmp_wav.name)
            # compressed alternatives need external codecs; always embed wav
            audio_element = IPython.display.Audio(data=tmp_wav.name, rate=sr)
            if display:
                IPython.display.display(audio_element)

        if return_html:
            audio_element = (
                f"<audio "
                f"  controls "
                f"  src='{audio_element.src_attr()}'> "
                f"</audio> "
            )
        return audio_element

    def widget(
        self,
        title: str = None,
        ext: str = ".wav",
        add_headers: bool = True,
        player_width: str = "100%",
        margin: str = "10px",
        plot_fn: str = "specshow",
        return_html: bool = False,
        **kwargs,
    ):
        """Playable widget with spectrogram image, click-to-seek and a
        levels strip (reference playback.py:96-192)."""
        import matplotlib.pyplot as plt

        def _save_fig_to_tag():
            buffer = io.BytesIO()
            plt.savefig(buffer, bbox_inches="tight", pad_inches=0)
            plt.close()
            buffer.seek(0)
            data_uri = base64.b64encode(buffer.read()).decode("ascii")
            return "data:image/png;base64,{0}".format(data_uri)

        _, IPython = _check_imports()

        header_html = ""

        if add_headers:
            header_html = headers.replace("PLAYER_WIDTH", str(player_width))
            header_html = header_html.replace("MARGIN", str(margin))
            IPython.display.display(IPython.display.HTML(header_html))

        widget_html = widget
        if isinstance(plot_fn, str):
            plot_fn = getattr(self, plot_fn)
            kwargs["title"] = title
        plot_fn(**kwargs)

        fig = plt.gcf()
        pixels = fig.get_size_inches() * fig.dpi

        tag = _save_fig_to_tag()

        # Source image for the levels strip
        self.specshow()
        from . import util as _util

        _util.format_figure((12, 1.5))
        levels_tag = _save_fig_to_tag()

        player_id = "".join(random.choice(string.ascii_uppercase) for _ in range(10))

        audio_elem = self.embed(ext=ext, display=False)
        widget_html = widget_html.replace("AUDIO_SRC", audio_elem.src_attr())
        widget_html = widget_html.replace("IMAGE_SRC", tag)
        widget_html = widget_html.replace("LEVELS_SRC", levels_tag)
        widget_html = widget_html.replace("PLAYER_ID", player_id)
        widget_html = widget_html.replace("PADDING_AMOUNT", f"{int(pixels[1])}px")
        widget_html = widget_html.replace("MAX_WIDTH", f"{int(pixels[0])}px")

        IPython.display.display(IPython.display.HTML(widget_html))

        if return_html:
            html = header_html if add_headers else ""
            html += widget_html
            return html

    def play(self):
        """Play audio locally via ffplay/aplay if present
        (reference playback.py:194-216)."""
        tmpfiles = []
        with _close_temp_files(tmpfiles):
            tmp_wav = NamedTemporaryFile(suffix=".wav", delete=False)
            tmpfiles.append(tmp_wav)
            self.write(tmp_wav.name)
            print(self)
            player = None
            for cand, args in (
                ("ffplay", ["-nodisp", "-autoexit", "-hide_banner", "-loglevel", "error"]),
                ("aplay", []),
            ):
                if shutil.which(cand):
                    player = [cand] + args
                    break
            if player is None:
                raise RuntimeError(
                    "No audio player found (need ffplay or aplay on PATH)."
                )
            subprocess.call(player + [tmp_wav.name])
        return self
