"""Core utility tests (mirror of reference tests/core/test_util.py)."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from audiotools_tpu.core import util


def test_ensure_tensor():
    x = util.ensure_tensor(3.0)
    assert isinstance(x, jnp.ndarray)
    x = util.ensure_tensor(np.ones((4,)), ndim=3)
    assert x.shape == (4, 1, 1)
    x = util.ensure_tensor(np.ones((1, 2)), batch_size=5)
    assert x.shape == (5, 2)
    x = util.ensure_tensor(np.ones(3, dtype=np.float64))
    assert x.dtype == jnp.float32


def test_flatten_unflatten():
    d = {"a": 1, "b": {"c": 2, "d": {"e": 3}}, "empty": {}}
    flat = util.flatten(d)
    assert flat[("a",)] == 1
    assert flat[("b", "d", "e")] == 3
    round_trip = util.unflatten(flat)
    assert round_trip["b"]["d"]["e"] == 3


def test_random_state_and_seed():
    s = util.random_state(42)
    assert isinstance(s, np.random.RandomState)
    assert util.random_state(s) is s
    assert util.random_state(None) is np.random.mtrand._rand
    with pytest.raises(ValueError):
        util.random_state("nope")
    util.seed(123)
    a = np.random.rand()
    util.seed(123)
    assert np.random.rand() == a


def test_sample_from_dist():
    state = util.random_state(0)
    assert util.sample_from_dist(("const", 5)) == 5
    v = util.sample_from_dist(("uniform", 0.0, 1.0), state)
    assert 0 <= v <= 1
    v = util.sample_from_dist(("choice", [1, 2, 3]), state)
    assert v in (1, 2, 3)
    v = util.sample_from_dist(("normal", 0.0, 0.1), state)
    assert np.isfinite(v)


def test_hz_to_bin():
    bins = util.hz_to_bin(jnp.asarray([0.0, 11025.0, 22050.0, 99999.0]), 2048, 44100)
    assert int(bins[0]) == 0
    assert int(bins[1]) in (512, 513)  # nearest bin to mid-nyquist
    assert int(bins[2]) == 1025
    assert int(bins[3]) == 1025  # clamped to nyquist


def test_find_audio_and_read_sources(audio_dir):
    files = util.find_audio(audio_dir / "spk", ext=[".wav"])
    assert len(files) == 3
    # direct file path
    out = util.find_audio(str(files[0]))
    assert len(out) == 1
    # glob
    out = util.find_audio(str(audio_dir / "spk" / "*.wav"))
    assert len(out) == 3

    sources = util.read_sources([str(audio_dir / "spk.csv"), str(audio_dir / "nz")])
    assert len(sources) == 2
    assert len(sources[0]) == 3
    assert all("path" in row for row in sources[0])

    empty = util.read_sources([str(audio_dir / "empty.csv")])
    assert empty == [[]]
    kept = util.read_sources([str(audio_dir / "empty.csv")], remove_empty=False)
    assert kept[0][0]["path"] == ""


def test_choose_from_list_of_lists():
    state = util.random_state(0)
    lol = [[1, 2], [3, 4, 5]]
    item, src, idx = util.choose_from_list_of_lists(state, lol)
    assert item in (1, 2, 3, 4, 5)
    item, src, idx = util.choose_from_list_of_lists(state, lol, p=[1.0, 0.0])
    assert src == 0


def test_chdir(tmp_path):
    cwd = Path.cwd()
    with util.chdir(tmp_path):
        assert Path.cwd() == tmp_path
    assert Path.cwd() == cwd


def test_prepare_batch():
    batch = {"a": np.ones((2, 3)), "nested": {"b": jnp.zeros(4)}, "s": "keep"}
    out = util.prepare_batch(batch)
    assert out["s"] == "keep"
    out = util.prepare_batch([np.ones(2), "x"])
    assert out[1] == "x"
    out = util.prepare_batch(jnp.ones(3))
    assert out.shape == (3,)


def test_collate():
    sig = AudioSignal(np.random.RandomState(0).randn(1, 1, 1000).astype(np.float32), 44100)
    items = [
        {"signal": sig.clone(), "idx": i, "meta": {"x": float(i)}} for i in range(4)
    ]
    batch = util.collate(items)
    assert batch["signal"].batch_size == 4
    assert batch["idx"].tolist() == [0, 1, 2, 3]
    assert batch["meta"]["x"].tolist() == [0.0, 1.0, 2.0, 3.0]

    splits = util.collate(items, n_splits=2)
    assert len(splits) == 2
    assert splits[0]["signal"].batch_size == 2


def test_format_figure_smoke():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure()
    plt.plot([0, 1], [0, 1])
    util.format_figure(title="test")
    plt.close("all")
    util.format_figure(format=False)


def test_note_midi_hz():
    assert util.note_to_midi("A4") == 69
    assert util.note_to_midi("C4") == 60
    assert util.note_to_midi("C#4") == 61
    assert util.note_to_midi("Db4") == 61
    assert abs(util.midi_to_hz(69) - 440.0) < 1e-9


def test_generate_chord_dataset(tmp_path):
    with util.chdir(tmp_path):
        out = util.generate_chord_dataset(
            max_voices=2, num_items=2, duration=0.3, output_dir="chords"
        )
        csvs = list(Path(out).glob("voice_*.csv"))
        assert len(csvs) >= 1
        wavs = list(Path(out).glob("track_*/*.wav"))
        assert len(wavs) >= 2
