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
