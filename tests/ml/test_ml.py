"""ML harness tests (mirroring reference tests/ml/): decorators driven by
a fake training loop, model save/load round-trips, accelerator on the
virtual 8-device mesh, experiment dirs."""
import os
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiotools_tpu import ml
from audiotools_tpu.ml.decorators import Mean, Tracker, timer, when


# ---------------------------------------------------------------------------
# decorators (reference tests/ml/test_decorators.py:11-89)
# ---------------------------------------------------------------------------


def test_mean():
    m = Mean()
    assert m() == 0
    m.update(2.0)
    m.update(4.0)
    assert m() == 3.0
    m.update(float("nan"))
    assert m() == 3.0
    m.reset()
    assert m() == 0


def test_when():
    i = 0
    calls = []

    @when(lambda: i % 2 == 0)
    def fn():
        calls.append(i)

    for i in range(5):
        fn()
    assert calls == [0, 2, 4]


def test_timer():
    @timer()
    def fn():
        return {"loss": 1.0}

    out = fn()
    assert "time/fn" in out


def test_tracker_end_to_end(tmp_path):
    from torch.utils.tensorboard import SummaryWriter

    writer = SummaryWriter(str(tmp_path / "tb"))
    tracker = Tracker(writer=writer, log_file=str(tmp_path / "log.txt"))

    @tracker.log("train", "value")
    @tracker.track("train", 10, multihost_average=False)
    @timer()
    def train_step(step):
        tracker.step = step
        return {"loss": jnp.asarray(1.0 / (step + 1)), "acc": 0.5}

    @tracker.track("val", 5, multihost_average=False)
    def val_step():
        return {"vloss": np.float32(0.1)}

    with tracker.live:
        for step in range(10):
            out = train_step(step)
            assert isinstance(out["loss"], float)
        for _ in range(5):
            val_step()
        tracker.done("train", "epoch 0")

    assert len(tracker.history["train"]["loss"]) == 10
    assert tracker.is_best("train", "loss")  # monotonically decreasing

    sd = tracker.state_dict()
    t2 = Tracker()
    t2.load_state_dict(sd)
    assert t2.history == tracker.history
    assert (tmp_path / "log.txt").exists()


def test_tracker_closes_log_file(tmp_path):
    """The log-file handle is flushed on print and closed by close() /
    the context manager (no leaked handle over a long run)."""
    log = tmp_path / "log.txt"
    with Tracker(log_file=str(log)) as tracker:
        tracker.print("hello from the run")
        # flushed immediately, before close
        assert "hello from the run" in log.read_text()
        handle = tracker._log_handle
        assert not handle.closed
    assert handle.closed
    tracker.close()  # idempotent

    t2 = Tracker()  # no log file: close is a no-op
    t2.close()


def test_tracker_non_dict_output():
    tracker = Tracker()

    @tracker.track("x", 2, multihost_average=False)
    def fn():
        return 42

    with tracker.live:
        assert fn() == 42


# ---------------------------------------------------------------------------
# BaseModel (reference tests/ml/test_model.py:36-85)
# ---------------------------------------------------------------------------


class TinyModel(ml.BaseModel):
    hidden: int = 4

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.hidden)(x)


def test_model_save_load_roundtrip(tmp_path):
    model = TinyModel(hidden=3)
    x = jnp.ones((2, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    out1 = model.apply(params, x)

    path = tmp_path / "model.pth"
    model.save(str(path), params)

    model2, params2 = TinyModel.load(str(path))
    assert model2.hidden == 3
    out2 = model2.apply(params2, x)
    assert np.allclose(np.asarray(out1), np.asarray(out2))
    assert model2.metadata["kwargs"]["hidden"] == 3


def test_model_save_weights_only(tmp_path):
    model = TinyModel()
    x = jnp.ones((1, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    path = tmp_path / "w.pth"
    model.save(str(path), params, package=False)
    model2, params2 = TinyModel.load(str(path))
    assert np.allclose(
        np.asarray(model.apply(params, x)), np.asarray(model2.apply(params2, x))
    )


def test_model_save_to_folder_roundtrip(tmp_path):
    model = TinyModel()
    x = jnp.ones((1, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    opt_state = optax.adam(1e-3).init(params)

    target = model.save_to_folder(
        tmp_path, params, {"optimizer.pth": opt_state, "tracker.pth": {"step": 5}}
    )
    assert (target / "package.pth").exists()
    assert (target / "weights.pth").exists()

    model2, params2, extra = TinyModel.load_from_folder(tmp_path)
    assert "optimizer.pth" in extra
    assert extra["tracker.pth"]["step"] == 5
    assert np.allclose(
        np.asarray(model.apply(params, x)), np.asarray(model2.apply(params2, x))
    )


def test_model_package_resolves_class_without_import(tmp_path):
    """Packaged source re-materializes the class (the torch.package
    equivalence, reference base.py:188-235)."""
    import pickle

    model = TinyModel(hidden=2)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 5)))
    path = tmp_path / "m.pth"
    model.save(str(path), params, package=True)

    with open(path, "rb") as f:
        blob = pickle.load(f)
    assert blob["source"] is not None and "TinyModel" in blob["source"]

    # generic load through the base class resolves the subclass
    model2, params2 = ml.BaseModel.load(str(path))
    assert type(model2).__name__ == "TinyModel"


# ---------------------------------------------------------------------------
# Accelerator on the virtual 8-device mesh
# ---------------------------------------------------------------------------


def test_accelerator_dp_training_step():
    accel = ml.Accelerator()
    assert accel.world_size == 8

    model = TinyModel(hidden=1)
    x_host = np.random.RandomState(0).randn(16, 5).astype(np.float32)
    y_host = (x_host.sum(axis=1, keepdims=True) * 0.1).astype(np.float32)

    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_host))
    params = accel.prepare_model(params)
    opt = optax.sgd(0.1)
    opt_state = jax.device_put(opt.init(params), accel.replicated)

    batch = accel.prepare_batch({"x": jnp.asarray(x_host), "y": jnp.asarray(y_host)})
    assert batch["x"].sharding.spec == jax.sharding.PartitionSpec("dp")

    @accel.jit_step
    def step(params, opt_state, batch):
        def loss_fn(p):
            pred = model.apply(p, batch["x"])
            return ((pred - batch["y"]) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5  # actually learns
    # params stay replicated across the mesh
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.sharding.is_fully_replicated


def test_accelerator_sharded_matches_single_device():
    """The SPMD step gives the same numbers as unsharded execution."""
    accel = ml.Accelerator()
    model = TinyModel(hidden=2)
    x = np.random.RandomState(1).randn(8, 5).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def loss_fn(p, xb):
        return (model.apply(p, xb) ** 2).mean()

    g_single = jax.grad(loss_fn)(params, jnp.asarray(x))

    params_r = accel.prepare_model(params)
    x_s = accel.prepare_batch(jnp.asarray(x))
    g_spmd = jax.jit(jax.grad(loss_fn))(params_r, x_s)

    for a, b in zip(jax.tree_util.tree_leaves(g_single), jax.tree_util.tree_leaves(g_spmd)):
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_accelerator_prepare_dataloader(audio_dir):
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader

    accel = ml.Accelerator()
    ds = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=8,
        duration=0.25,
    )
    dl = accel.prepare_dataloader(ds, start_idx=2, batch_size=2)
    batches = list(dl)
    assert len(batches) == 3  # 6 remaining / 2


def test_accelerator_multiprocess_dataloader_branch(audio_dir):
    """The multi-process prepare_dataloader branch (sharded resumable
    sampler + per-host batch/worker division), driven in-process by
    faking the process topology — the real 2-process path is the
    slow-marked cluster test."""
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader

    ds = AudioDataset(
        AudioLoader(sources=[str(audio_dir / "spk.csv")]),
        sample_rate=44100,
        n_examples=8,
        duration=0.25,
    )

    seen = {}
    for rank in (0, 1):
        accel = ml.Accelerator()
        accel.num_processes = 2  # fake a 2-host topology
        accel.local_rank = rank
        dl = accel.prepare_dataloader(ds, batch_size=4, num_workers=4)
        # global batch 4 and 4 workers are divided per host
        assert dl.batch_size == 2
        assert dl.num_workers == 2
        seen[rank] = [idx for idx in dl.sampler]
    # the two ranks partition the dataset without overlap
    assert set(seen[0]).isdisjoint(seen[1])
    assert len(seen[0]) + len(seen[1]) == 8

    # resume from a global start_idx skips already-consumed items
    accel = ml.Accelerator()
    accel.num_processes = 2
    accel.local_rank = 0
    dl = accel.prepare_dataloader(ds, start_idx=4, batch_size=4)
    assert len(list(dl.sampler)) == 2  # half of the remaining 4

    # worker/batch floors: never divided below 1
    accel.num_processes = 16
    dl = accel.prepare_dataloader(ds, batch_size=4, num_workers=4)
    assert dl.batch_size == 1 and dl.num_workers == 1


def test_accelerator_mesh_context_and_scaler():
    """Mesh context manager + the API-parity scaler surface."""
    accel = ml.Accelerator()
    with accel:
        # inside the context the mesh is active for pjit-style code
        pass
    # DummyScaler API parity (reference accelerator.py:53-69)
    calls = []
    assert accel.step(lambda x: calls.append(x) or "ok", 1) == "ok"
    assert calls == [1]
    assert accel.scaler.unscale_("opt") == "opt"


def test_accelerator_prepare_model_rules():
    """prepare_model with partition rules shards matching leaves and
    replicates the rest."""
    from jax.sharding import PartitionSpec as P

    accel = ml.Accelerator()
    params = {
        "Dense_0": {"kernel": jnp.ones((8, 8)), "bias": jnp.ones((8,))},
        "Other": {"w": jnp.ones((4, 4))},
    }
    placed = accel.prepare_model(params, rules={"kernel": P(None, "dp")})
    assert placed["Dense_0"]["kernel"].sharding.spec == P(None, "dp")
    assert placed["Other"]["w"].sharding.is_fully_replicated
    assert placed["Dense_0"]["bias"].sharding.is_fully_replicated


def test_accelerator_amp_helpers():
    accel = ml.Accelerator(amp=True)
    tree = {"a": jnp.ones((2, 2)), "b": jnp.ones((2,), dtype=jnp.int32)}
    cast = accel.cast_for_compute(tree)
    assert cast["a"].dtype == jnp.bfloat16
    assert cast["b"].dtype == jnp.int32
    with accel.autocast():
        pass
    assert accel.backward(jnp.asarray(1.0)) == 1.0
    accel.update()
    assert ml.Accelerator.unwrap("model") == "model"


# ---------------------------------------------------------------------------
# Experiment
# ---------------------------------------------------------------------------


def test_experiment(tmp_path):
    from audiotools_tpu.core.util import chdir

    with chdir(tmp_path):
        exp = ml.Experiment()
        assert exp.exp_dir.exists()
        expected = exp.exp_dir.absolute()
        with exp:
            assert Path.cwd() == expected
        name = ml.Experiment.generate_exp_name()
        assert len(name.split("-")) == 3


def test_spectral_gate_denoises():
    from audiotools_tpu import AudioSignal
    from audiotools_tpu.ml.layers import SpectralGate
    from tests.fixtures import speech_like

    clean = AudioSignal(speech_like(0, 2.0)[None, None], 44100)
    nz = AudioSignal(
        np.random.RandomState(1).randn(1, 1, 88200).astype(np.float32) * 0.01, 44100
    )
    noisy = clean.clone().mix(nz.clone(), snr=15)
    gate = SpectralGate()
    out = gate(noisy.clone(), nz.clone(), denoise_amount=1.0)
    assert out.shape == clean.shape
    assert not np.allclose(out.numpy(), noisy.numpy())
    # gating the noise signal against its own statistics nearly silences it
    nz_out = gate(nz.clone(), nz.clone(), denoise_amount=1.0)
    assert (np.asarray(nz_out.numpy()) ** 2).mean() < 0.01 * (nz.numpy() ** 2).mean()


def test_basemodel_device():
    """BaseModel.device(params) mirrors the reference's device property
    (base.py:131-137) in functional form."""
    import jax

    model = TinyModel()
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 4)))
    dev = ml.BaseModel.device(params)
    assert dev in jax.devices()
    assert ml.BaseModel.device({}) in jax.devices()
