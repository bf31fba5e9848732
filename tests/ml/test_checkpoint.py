"""Checkpoint/resume bundle tests."""
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiotools_tpu.ml.checkpoint import Checkpointer
from audiotools_tpu.ml.decorators import Tracker


def test_checkpoint_roundtrip(tmp_path):
    params = {"w": jnp.arange(16.0).reshape(4, 4), "b": jnp.zeros((4,))}
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    tracker = Tracker()
    tracker.history = {"train": {"loss": [1.0, 0.5]}}
    tracker.step = 2

    ck = Checkpointer(tmp_path / "ckpt", max_to_keep=2)
    ck.save(2, params, opt_state, tracker, data_idx=128)
    assert ck.latest_step() == 2

    state, meta = ck.restore(template={"params": params, "opt_state": opt_state})
    assert np.allclose(np.asarray(state["params"]["w"]), np.arange(16).reshape(4, 4))
    assert meta["data_idx"] == 128
    assert meta["tracker"]["step"] == 2

    # resume into a fresh tracker
    t2 = Tracker()
    t2.load_state_dict(meta["tracker"])
    assert t2.history["train"]["loss"] == [1.0, 0.5]
    ck.close()


def test_checkpoint_retention(tmp_path):
    params = {"w": jnp.ones((2,))}
    ck = Checkpointer(tmp_path / "ckpt", max_to_keep=2)
    for step in (1, 2, 3):
        ck.save(step, params)
    ck.manager.wait_until_finished()
    kept = sorted(int(p.name) for p in (tmp_path / "ckpt").iterdir() if p.name.isdigit())
    assert kept == [2, 3]
    ck.close()


def test_restore_missing_raises(tmp_path):
    ck = Checkpointer(tmp_path / "empty")
    with pytest.raises(FileNotFoundError):
        ck.restore()
    ck.close()
