"""Display / playback / whisper surface tests (mirror of reference
tests/core/test_display.py and test_playback.py)."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from tests.fixtures import speech_like


def _sig():
    return AudioSignal(speech_like(0, 1.0)[None, None], 44100)


def test_specshow_variants(tmp_path):
    import matplotlib.pyplot as plt

    sig = _sig()
    for kwargs in [
        {},
        {"preemphasis": True},
        {"y_axis": "mel"},
        {"y_axis": "log"},
        {"title": "hello"},
        {"format": False},
    ]:
        plt.figure()
        sig.specshow(**kwargs)
        plt.close("all")


def test_waveplot_wavespec(tmp_path):
    import matplotlib.pyplot as plt

    sig = _sig()
    plt.figure()
    sig.waveplot()
    plt.close("all")
    plt.figure()
    sig.wavespec()
    plt.close("all")


def test_save_image(tmp_path):
    sig = _sig()
    out = tmp_path / "spec.png"
    sig.save_image(str(out))
    assert out.exists() and out.stat().st_size > 0
    sig.save_image(str(out), plot_fn="waveplot")


def test_write_audio_to_tb(tmp_path):
    from torch.utils.tensorboard import SummaryWriter

    sig = _sig()
    writer = SummaryWriter(str(tmp_path / "tb"))
    sig.write_audio_to_tb("test/sample_0.wav", writer, step=0)
    writer.close()
    assert any((tmp_path / "tb").iterdir())


def test_embed_html():
    sig = _sig()
    html = sig.embed(display=False, return_html=True)
    assert "<audio" in html and "src=" in html


def test_widget_html():
    sig = _sig()
    html = sig.widget("Test", return_html=True)
    assert "at-player" in html
    assert "data:image/png;base64" in html
    # second embed without headers
    html2 = sig.widget("Again", add_headers=False, return_html=True)
    assert "at-player" in html2


def _parse_dom(html):
    """Collect (tag, attrs) for every element in the markup."""
    from html.parser import HTMLParser

    elements = []

    class Collector(HTMLParser):
        def handle_starttag(self, tag, attrs):
            elements.append((tag, dict(attrs)))

    Collector().feed(html)
    return elements


def test_widget_dom_feature_set():
    """DOM-level checklist of the player's interaction surface (parity
    with the reference widget's feature set: play/pause, synced cursor,
    seek, levels bars, download)."""
    sig = _sig()
    html = sig.widget("Test", return_html=True)
    dom = _parse_dom(html)

    def find(tag, cls):
        return [
            a for t, a in dom
            if t == tag and cls in a.get("class", "").split()
        ]

    # one player root with a resolved max-width in pixels
    (root,) = find("div", "at-player")
    assert root["id"].startswith("at") and "max-width" in root["style"]
    # spectrogram stage: image + played-region shade + moving cursor
    (stage,) = find("div", "at-stage")
    assert "height" in stage["style"]
    (img,) = find("img", "at-image")
    assert img["src"].startswith("data:image/png;base64")
    assert find("div", "at-shade") and find("div", "at-cursor")
    # controls: play/pause button, levels canvas, time readout, download
    assert find("button", "at-playpause")
    assert find("canvas", "at-response")
    assert find("span", "at-time")
    assert find("button", "at-download")
    # hidden levels-strip source image for the bar analysis
    (strip,) = find("img", "at-levels-src")
    assert strip["src"].startswith("data:image/png;base64")
    # audio element wired to an inline wav payload
    audios = [a for t, a in dom if t == "audio"]
    assert audios and audios[0]["src"].startswith("data:audio")

    # the shared header JS implements the interactions the widget binds to
    for feature in (
        "atSetupPlayer",          # per-widget hookup entry point
        "pointerdown",            # click-to-seek ...
        "pointermove",            # ... and drag-to-scrub
        "requestAnimationFrame",  # cursor synced while playing
        "getImageData",           # levels bars sampled from the strip
    ):
        assert feature in html, feature


def test_widget_headers_shared_across_players():
    """Headers (CSS + JS) are emitted once and reused by later widgets."""
    sig = _sig()
    first = sig.widget("A", return_html=True)
    again = sig.widget("B", add_headers=False, return_html=True)
    assert "atSetupPlayer(" in again  # the call site ...
    assert "function atSetupPlayer" not in again  # ... but not the definition
    assert "function atSetupPlayer" in first
    # distinct widgets get distinct DOM ids
    id_a = [a["id"] for t, a in _parse_dom(first) if t == "div" and "at-player" in a.get("class", "")]
    id_b = [a["id"] for t, a in _parse_dom(again) if t == "div" and "at-player" in a.get("class", "")]
    assert id_a and id_b and id_a != id_b


def test_play_requires_player():
    import shutil

    sig = _sig()
    if shutil.which("ffplay") or shutil.which("aplay"):
        pytest.skip("player available; don't actually play audio in tests")
    with pytest.raises(RuntimeError):
        sig.play()


def test_whisper_gated():
    """Whisper requires downloading weights (no network here); ensure the
    surface exists and degrades cleanly."""
    sig = _sig()
    assert hasattr(sig, "get_whisper_transcript")
    try:
        sig.setup_whisper()
    except Exception:
        pytest.skip("whisper weights unavailable (no network)")
