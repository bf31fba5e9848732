"""post.py + preference.py tests (mirroring reference test_post.py /
test_preference.py, minus the gradio-only app driving)."""
import csv
from pathlib import Path

import numpy as np
import pytest

from audiotools_tpu import AudioSignal, post, preference as pr
from audiotools_tpu.io import write_wav


def test_audio_table_structure():
    sig = AudioSignal(np.random.RandomState(0).randn(1, 1, 8000).astype(np.float32) * 0.1, 8000)
    audio_dict = {
        0: {"input": sig, "output": sig.clone(), "label": 3},
        1: {"input": sig.clone(), "output": None, "label": "x"},
    }
    table = post.audio_table(audio_dict)
    lines = table.strip().split("\n")
    assert lines[0].startswith(". | input | output")
    assert lines[1].startswith("|---")
    assert "<audio" in table  # embedded players
    assert " . " in lines[3] or "| . |" in lines[3].replace("  ", " ")
    assert "3" in lines[2]


def test_audio_table_flat_values():
    sig = AudioSignal(np.zeros((1, 1, 4000), np.float32), 8000)
    table = post.audio_table({"a": sig})
    assert "Audio" in table


def test_markdown_table_to_html():
    html = post._markdown_table_to_html("a | b\n|---|:-:\n| 1 | 2 |")
    assert "<table>" in html and "<th>a</th>" in html and "<td>2</td>" in html


def test_in_notebook_false():
    assert post.in_notebook() is False


def test_disp_terminal(capsys):
    sig = AudioSignal(np.zeros((1, 1, 4000), np.float32), 8000)
    post.disp(sig)
    out = capsys.readouterr().out
    assert "<audio" in out
    post.disp({"a": sig})
    out = capsys.readouterr().out
    assert "| a |" in out or "Audio" in out


def _make_pref_tree(root: Path, conditions=("cond_a", "cond_b", "ref"), n=3):
    for c in conditions:
        for j in range(n):
            p = root / c / f"sample_{j}.wav"
            p.parent.mkdir(parents=True, exist_ok=True)
            x = np.sin(
                2 * np.pi * (110 * (j + 1)) * np.arange(8000) / 8000
            ).astype(np.float32)
            write_wav(p, x[None, :] * 0.1, 8000)
    return root


def test_samples_discovery_and_progress(tmp_path):
    _make_pref_tree(tmp_path)
    s = pr.Samples(str(tmp_path), shuffle=False)
    assert len(s) == 3
    assert set(s.samples["sample_0.wav"].keys()) == {"cond_a", "cond_b", "ref"}

    updates, done, pbar = s.get_next_sample("ref", ["cond_a", "cond_b"])
    assert len(updates) == 3
    assert s.order[0] == "ref"
    assert s.current == 1
    assert "1 / 3" in pbar["value"]

    # exhaust
    s.get_next_sample("ref", ["cond_a", "cond_b"])
    s.get_next_sample("ref", ["cond_a", "cond_b"])
    updates, done, pbar = s.get_next_sample("ref", ["cond_a", "cond_b"])
    assert done.get("interactive") is False


def test_samples_filter_completed(tmp_path):
    _make_pref_tree(tmp_path)
    save_path = tmp_path / "results.csv"
    pr.save_result({"sample": "sample_1.wav", "user": "u1", "cond_a": 80}, save_path)
    pr.save_result({"sample": "sample_0.wav", "user": "other", "cond_a": 10}, save_path)

    s = pr.Samples(str(tmp_path), shuffle=False)
    s.filter_completed("u1", str(save_path))
    assert "sample_1.wav" not in s.names
    assert "sample_0.wav" in s.names  # other user's result doesn't count
    # filtering is once-per-session
    s.filter_completed("u1", str(save_path))


def test_save_result_appends(tmp_path):
    save_path = tmp_path / "r.csv"
    pr.save_result({"sample": "a.wav", "user": "x", "score": 10}, save_path)
    pr.save_result({"sample": "b.wav", "user": "x", "score": 90}, save_path)
    with open(save_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert rows[1]["sample"] == "b.wav"


def test_slider_html():
    assert "Prefer A" in pr.slider_abx
    assert "excellent" in pr.slider_mushra
    assert "{PROGRESS}" in pr.progress_template


def test_player_requires_gradio():
    try:
        import gradio  # noqa

        pytest.skip("gradio installed; app path exercised elsewhere")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="gradio"):
        pr.Player(app=None)


def test_examples_importable(tmp_path):
    """The example scripts parse/compile and their data helpers work."""
    import importlib.util
    import sys

    for name in ("mushra", "abx"):
        path = Path("examples") / f"{name}.py"
        spec = importlib.util.spec_from_file_location(f"example_{name}", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        assert hasattr(mod, "main")

    # abx's create_data builds a valid tree
    spec = importlib.util.spec_from_file_location("example_abx", Path("examples/abx.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.create_data(tmp_path / "audio")
    s = pr.Samples(str(tmp_path / "audio"), shuffle=False)
    assert len(s) == 3
