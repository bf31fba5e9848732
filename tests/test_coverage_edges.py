"""Edge-branch coverage for host-side helpers: notebook display paths,
the Meter convenience surface, io format dispatch errors, and
Experiment snapshots."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from audiotools_tpu import AudioSignal, post
from tests.fixtures import speech_like


def _sig():
    return AudioSignal(speech_like(0, 0.5)[None, None], 44100)


# ---------------------------------------------------------------------------
# post.py: terminal-side display paths
# ---------------------------------------------------------------------------


def test_in_notebook_is_false_here():
    assert post.in_notebook() is False


def test_disp_signal_and_dict_print(capsys):
    sig = _sig()
    assert post.disp(sig) is None
    out = capsys.readouterr().out
    assert "<audio" in out

    post.disp({"a": {"in": sig}})
    out = capsys.readouterr().out
    assert "| in" in out or "| a |" in out


def test_disp_figure():
    import matplotlib.pyplot as plt

    fig = plt.figure()
    post.disp(fig)  # plt.show() under Agg: no-op, covered
    plt.close(fig)


def test_markdown_table_to_html_and_empty_table():
    assert post._markdown_table_to_html("") == ""
    html = post._markdown_table_to_html("a | b\n|---|:-:\n| 1 | 2 |")
    assert html.startswith("<table>") and "<td>" in html
    assert post.audio_table({}) == "\n"


def test_audio_table_default_format_fn_values():
    import jax.numpy as jnp

    table = post.audio_table(
        {"row": {"arr": jnp.asarray([1.0, 2.0]), "none": None, "s": "x"}}
    )
    assert "." in table and "x" in table and "[1.0, 2.0]" in table


# ---------------------------------------------------------------------------
# core/loudness.py: Meter convenience surface
# ---------------------------------------------------------------------------


def test_meter_surface():
    from audiotools_tpu.core.loudness import Meter

    meter = Meter(44100)
    filts = meter.filters
    assert len(filts) >= 2
    b, a, gain = filts[0]
    assert len(b) == 3 and len(a) == 3 and gain > 0

    data = np.random.RandomState(0).randn(22050, 1).astype(np.float32) * 0.1
    weighted = meter.apply_filter(data)  # 2-D input branch
    assert weighted.shape[-2:] == (22050, 1)
    lufs = meter(data)  # __call__ == integrated_loudness
    assert np.isfinite(float(lufs))
    assert float(meter.forward(data)) == pytest.approx(float(lufs))


# ---------------------------------------------------------------------------
# io/__init__.py: format dispatch
# ---------------------------------------------------------------------------


def test_audio_info_mp3_ogg(tmp_path):
    from audiotools_tpu import io as aio

    sig = _sig()
    for ext in (".mp3", ".ogg"):
        p = tmp_path / f"t{ext}"
        aio.save_audio(str(p), np.asarray(sig.audio_data[0]), 44100)
        info = aio.audio_info(str(p))
        assert info.sample_rate > 0 and info.num_frames > 0


def test_unsupported_format_errors(tmp_path, monkeypatch):
    from audiotools_tpu import io as aio
    from audiotools_tpu import native

    monkeypatch.setattr(native, "av_available", lambda: False)
    bogus = tmp_path / "x.xyz"
    bogus.write_bytes(b"\x00" * 16)
    with pytest.raises(ValueError, match="Unsupported audio format"):
        aio.load_audio(str(bogus))
    with pytest.raises(ValueError, match="Unsupported"):
        aio.save_audio(str(tmp_path / "y.xyz"), np.zeros((1, 8)), 8000)


# ---------------------------------------------------------------------------
# ml/experiment.py: snapshot + non-git fallback
# ---------------------------------------------------------------------------


def test_experiment_snapshot(tmp_path):
    import subprocess

    from audiotools_tpu import ml
    from audiotools_tpu.core.util import chdir

    repo = tmp_path / "proj"
    repo.mkdir()
    (repo / "keep.txt").write_text("tracked")
    (repo / "skip.txt").write_text("filtered out")
    subprocess.run(["git", "init", "-q"], cwd=repo, check=True)
    subprocess.run(["git", "add", "."], cwd=repo, check=True)
    subprocess.run(
        ["git", "-c", "user.email=t@t", "-c", "user.name=t",
         "commit", "-q", "-m", "init"],
        cwd=repo, check=True,
    )

    with chdir(repo):
        exp = ml.Experiment(exp_name="snaptest")
        assert set(exp.git_tracked_files) == {"keep.txt", "skip.txt"}
        with exp:
            exp.snapshot(filter_fn=lambda f: f.startswith("keep"))
        assert (exp.exp_dir / "keep.txt").read_text() == "tracked"
        assert not (exp.exp_dir / "skip.txt").exists()


def test_experiment_outside_git(tmp_path):
    from audiotools_tpu import ml
    from audiotools_tpu.core.util import chdir

    with chdir(tmp_path):
        exp = ml.Experiment(exp_name="nogit")
        assert exp.git_tracked_files == []
