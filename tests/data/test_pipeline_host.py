"""Host input-pipeline tests: numpy-backed data path, int16 wire
staging, batched salient-excerpt metering, and the host-cost profiler.

The reference treats dataloader cost as a first-class profiled quantity
(reference tests/profilers/profile_load.py:62-103); these tests pin the
TPU build's equivalents: the host path must never touch the device, the
wire quantization must stay inside the augmentation parity budget, and
the profiler's exclusive accounting must sum to wall clock.
"""
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiotools_tpu import AudioSignal
from audiotools_tpu import _hostprof as hostprof
from audiotools_tpu.core import util
from audiotools_tpu.io import write_wav


def _write_noise(path, seconds=2.0, sr=44100, seed=0, scale=0.1):
    x = (np.random.RandomState(seed).randn(int(sr * seconds)) * scale).astype(
        np.float32
    )
    write_wav(path, x[None], sr)
    return x


# ---------------------------------------------------------------- wire


def test_quantize_wire_roundtrip_error_bound():
    x = np.random.RandomState(0).uniform(-1, 1, (2, 1, 4096)).astype(np.float32)
    sig = AudioSignal(x.copy(), 44100)
    sig.quantize_wire()
    assert sig.audio_data.dtype == np.int16
    sig.dequantize_wire()
    assert sig.audio_data.dtype == np.float32
    assert np.abs(np.asarray(sig.audio_data) - x).max() <= 1.5625e-5 + 1e-9


def test_quantize_wire_clips_out_of_range():
    sig = AudioSignal(np.asarray([[[-2.0, 2.0, 1.0, -1.0]]], np.float32), 8000)
    sig.quantize_wire()
    q = np.asarray(sig.audio_data)
    assert q.min() == -32768 and q.max() == 32767
    with pytest.raises(ValueError):
        AudioSignal(np.zeros((1, 1, 4), np.float32), 8000).quantize_wire("int8")


def test_dequantize_wire_noop_on_float_and_in_jit():
    x = np.random.RandomState(1).randn(1, 1, 256).astype(np.float32) * 0.1
    sig = AudioSignal(x.copy(), 16000)
    sig.dequantize_wire()  # no-op on float audio
    assert np.abs(np.asarray(sig.audio_data) - x).max() == 0

    # the dtype branch is static under trace: dequantize inside a jitted
    # step folds into the program (no error, correct value)
    sig_q = AudioSignal(x.copy(), 16000).quantize_wire()

    @jax.jit
    def step(s):
        s = s.clone().dequantize_wire()
        return jnp.sum(s.audio_data**2)

    got = float(step(jax.device_put(sig_q)))
    want = float(np.sum(x.astype(np.float64) ** 2))
    assert abs(got - want) / max(want, 1e-12) < 1e-3


# ------------------------------------------------------- host data path


def test_file_load_and_collate_stay_numpy(tmp_path):
    """The host data path (decode -> signal -> collate) must be
    numpy-backed: per-item device round trips through the tunneled TPU
    cost ~ms each; the batch crosses to HBM once at the jit boundary."""
    p = tmp_path / "x.wav"
    _write_noise(p)
    sig = AudioSignal(p, duration=1.0)
    assert isinstance(sig.audio_data, np.ndarray)

    ex = AudioSignal.excerpt(p, duration=0.5, state=0)
    assert isinstance(ex.audio_data, np.ndarray)

    sal = AudioSignal.salient_excerpt(p, loudness_cutoff=-50, duration=0.5, state=0)
    assert isinstance(sal.audio_data, np.ndarray)
    assert isinstance(sal._loudness, np.ndarray)

    z = AudioSignal.zeros(0.5, 44100)
    assert isinstance(z.audio_data, np.ndarray)

    batched = AudioSignal.batch([sig.clone(), sig.clone()])
    assert isinstance(batched.audio_data, np.ndarray)

    # any device signal in the batch promotes the stack to the device
    dev = sig.clone()
    dev.audio_data = jnp.asarray(np.asarray(sig.audio_data))
    mixed = AudioSignal.batch([sig.clone(), dev])
    assert isinstance(mixed.audio_data, jnp.ndarray)

    # collate: all-host columns stay numpy, device columns go to jnp
    out = util.collate([{"i": 1, "f": 2.0, "b": True}, {"i": 3, "f": 4.0, "b": False}])
    assert isinstance(out["i"], np.ndarray) and out["i"].dtype == np.int32
    assert isinstance(out["f"], np.ndarray) and out["f"].dtype == np.float32
    assert isinstance(out["b"], np.ndarray) and out["b"].dtype == bool


def test_numpy_backed_signal_ops(tmp_path):
    """zero_pad / setitem / getitem work on numpy-backed signals."""
    x = np.random.RandomState(3).randn(2, 1, 100).astype(np.float32) * 0.1
    sig = AudioSignal(x.copy(), 8000)
    sig.zero_pad(3, 5)
    assert isinstance(sig.audio_data, np.ndarray)
    assert sig.shape == (2, 1, 108)

    sig = AudioSignal(x.copy(), 8000)
    sig[0] = AudioSignal(np.zeros((1, 1, 100), np.float32), 8000)
    assert isinstance(sig.audio_data, np.ndarray)
    assert np.abs(np.asarray(sig.audio_data[0])).max() == 0
    assert np.abs(np.asarray(sig.audio_data[1]) - x[1]).max() == 0

    sub = sig[1]
    assert sub.shape == (1, 1, 100)

    sig2 = AudioSignal(x.copy(), 8000)
    sig2[0] = 0.5
    assert isinstance(sig2.audio_data, np.ndarray)
    assert np.all(np.asarray(sig2.audio_data[0]) == 0.5)


def test_host_resample_matches_device(tmp_path):
    from audiotools_tpu.ops.resample import resample

    x = (np.random.RandomState(5).randn(2, 1, 44100) * 0.1).astype(np.float32)
    host = resample(x, 44100, 16000)
    assert isinstance(host, np.ndarray)
    dev = np.asarray(resample(jnp.asarray(x), 44100, 16000))
    assert host.shape == dev.shape
    assert np.abs(host - dev).max() <= 2e-5

    # through the signal surface: numpy-backed stays numpy-backed
    sig = AudioSignal(x.copy(), 44100).resample(16000)
    assert sig.sample_rate == 16000
    assert np.abs(np.asarray(sig.audio_data) - dev).max() <= 2e-5


# ------------------------------------------------- batched salient meter


def test_salient_excerpt_batched_meter_semantics(tmp_path):
    """Candidate batching must keep reference semantics
    (reference audio_signal.py:227-286): first passing candidate in draw
    order wins; all-fail returns the LAST candidate; num_tries=1 never
    draws extras."""
    from audiotools_tpu.ops.loudness import host_loudness

    sr = 44100
    rng = np.random.RandomState(0)
    x = np.zeros((1, sr * 10), np.float32)
    x[0, sr * 4 : sr * 6] = rng.randn(sr * 2).astype(np.float32) * 0.3
    p = tmp_path / "sparse.wav"
    write_wav(p, x, sr)

    # sequential oracle: same state stream, meter one at a time
    def sequential(state_seed, num_tries, cutoff):
        state = util.random_state(state_seed)
        chosen = None
        for t in range(num_tries):
            ex = AudioSignal.excerpt(p, state=state, duration=0.5)
            loud = float(
                np.asarray(host_loudness(np.asarray(ex.audio_data), sr)).max()
            )
            if chosen is None:
                chosen = ex  # last-resort fallback
            if loud > cutoff:
                return ex, t
            chosen = ex
        return chosen, num_tries - 1

    for seed in range(4):
        got = AudioSignal.salient_excerpt(
            p, loudness_cutoff=-30, duration=0.5, state=seed, num_tries=8
        )
        want, _ = sequential(seed, 8, -30.0)
        # the batched path draws ALL num_tries candidates when try 1
        # misses, so the chosen offset must match the sequential scan's
        # first-passing offset
        assert got.metadata["offset"] == want.metadata["offset"]
        assert np.abs(
            np.asarray(got.audio_data) - np.asarray(want.audio_data)
        ).max() == 0

    # impossible cutoff: falls back to the final candidate (reference
    # returns whatever the last try produced)
    got = AudioSignal.salient_excerpt(
        p, loudness_cutoff=200.0, duration=0.5, state=1, num_tries=4
    )
    want, _ = sequential(1, 4, 200.0)
    assert got.metadata["offset"] == want.metadata["offset"]

    # num_tries=1: one draw, no batch
    got = AudioSignal.salient_excerpt(
        p, loudness_cutoff=200.0, duration=0.5, state=2, num_tries=1
    )
    want, _ = sequential(2, 1, 200.0)
    assert got.metadata["offset"] == want.metadata["offset"]


def test_salient_excerpt_unbounded_batches(tmp_path):
    """num_tries=None keeps trying in batches until a candidate passes
    (reference's unbounded retry loop)."""
    sr = 44100
    rng = np.random.RandomState(0)
    x = np.zeros((1, sr * 30), np.float32)
    # one loud second near the end: early draws mostly miss
    x[0, sr * 28 : sr * 29] = rng.randn(sr).astype(np.float32) * 0.5
    p = tmp_path / "mostly_silent.wav"
    write_wav(p, x, sr)
    got = AudioSignal.salient_excerpt(
        p, loudness_cutoff=-35, duration=0.25, state=0, num_tries=None
    )
    assert float(np.asarray(got._loudness).max()) > -35


# --------------------------------------------------- loader device stage


def test_loader_to_device_wire_int16(tmp_path):
    from tests.fixtures import build_fixture_tree

    from audiotools_tpu.data import transforms as tfm
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
    from audiotools_tpu.data.loader import DataLoader

    build_fixture_tree(tmp_path)
    ds = AudioDataset(
        AudioLoader(sources=[str(tmp_path / "spk.csv")]),
        sample_rate=44100,
        n_examples=8,
        duration=0.5,
        transform=tfm.VolumeNorm(),
    )
    # host-only loader: everything numpy
    b_host = next(iter(DataLoader(ds, batch_size=4, num_workers=0)))
    assert isinstance(b_host["signal"].audio_data, np.ndarray)

    # device-staged loader with int16 wire
    dl = DataLoader(
        ds, batch_size=4, num_workers=2, to_device=True, wire_dtype="int16"
    )
    batches = list(dl)
    assert len(batches) == 2
    b = batches[0]
    assert isinstance(b["signal"].audio_data, jnp.ndarray)
    assert b["signal"].audio_data.dtype == jnp.int16
    # string metadata survives staging untouched
    assert isinstance(b["path"][0], str)

    # consumer dequantizes in-jit; parity with the host f32 batch
    @jax.jit
    def consume(sig):
        sig = sig.clone().dequantize_wire()
        return sig.audio_data

    got = np.asarray(consume(b["signal"]))
    want = np.asarray(b_host["signal"].audio_data)
    assert got.shape == want.shape
    assert np.abs(got - want).max() <= 1.5625e-5 + 1e-9

    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=4, wire_dtype="int8")


def test_wire_quantizes_and_dequantizes_nested_signals(tmp_path):
    """transform_args carry AudioSignals (BackgroundNoise's noise): the
    wire must quantize them too, and util.dequantize_batch must restore
    EVERY signal in the tree inside one jitted program — a consumer that
    misses a nested signal would feed int16 into the transform math."""
    from tests.fixtures import build_fixture_tree

    from audiotools_tpu.data import transforms as tfm
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
    from audiotools_tpu.data.loader import DataLoader

    build_fixture_tree(tmp_path)
    ds = AudioDataset(
        AudioLoader(sources=[str(tmp_path / "spk.csv")]),
        sample_rate=44100,
        n_examples=4,
        duration=0.5,
        transform=tfm.Compose(
            tfm.BackgroundNoise(sources=[str(tmp_path / "nz.csv")])
        ),
    )
    b_host = next(iter(DataLoader(ds, batch_size=4, num_workers=0)))
    dl = DataLoader(
        ds, batch_size=4, num_workers=2, to_device=True, wire_dtype="int16"
    )
    b = next(iter(dl))
    from audiotools_tpu import AudioSignal

    flat = util.flatten(b["transform_args"])
    nested = [v for v in flat.values() if isinstance(v, AudioSignal)]
    assert nested, "expected a nested AudioSignal in transform_args"
    nested = nested[0]
    assert nested.audio_data.dtype == jnp.int16  # staged as wire int16

    @jax.jit
    def consume(batch):
        deq = util.dequantize_batch(batch)
        out = ds.transform(
            deq["signal"].clone(), **deq["transform_args"]
        )
        return out.audio_data

    got = np.asarray(consume({k: b[k] for k in ("signal", "transform_args")}))
    want = np.asarray(
        ds.transform(
            b_host["signal"].clone(), **b_host["transform_args"]
        ).audio_data
    )
    assert got.shape == want.shape
    # wire quantization error through the transform stays in budget
    assert np.abs(got - want).max() <= 5e-4


# ------------------------------------------------------------- profiler


def test_hostprof_exclusive_accounting():
    hostprof.reset()
    hostprof.disable()
    with hostprof.span("off"):
        time.sleep(0.01)
    assert hostprof.totals() == {}

    hostprof.enable()
    try:
        with hostprof.span("outer"):
            time.sleep(0.02)
            with hostprof.span("inner"):
                time.sleep(0.02)
    finally:
        hostprof.disable()
    t = hostprof.totals()
    # exclusive: outer's total excludes inner's time
    assert t["inner"] >= 0.018
    assert 0.015 <= t["outer"] <= 0.06
    hostprof.reset()
    assert hostprof.totals() == {}


def test_hostprof_spans_fire_on_pipeline(tmp_path):
    """decode / salient_meter / instantiate / collate spans accumulate
    when the profiler is armed over a real dataset pass."""
    from tests.fixtures import build_fixture_tree

    from audiotools_tpu.data import transforms as tfm
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
    from audiotools_tpu.data.loader import DataLoader

    build_fixture_tree(tmp_path)
    ds = AudioDataset(
        AudioLoader(sources=[str(tmp_path / "spk.csv")]),
        sample_rate=44100,
        n_examples=4,
        duration=0.5,
        transform=tfm.Compose(tfm.BackgroundNoise(sources=[str(tmp_path / "nz.csv")])),
    )
    hostprof.reset()
    hostprof.enable()
    try:
        for _ in DataLoader(ds, batch_size=2, num_workers=0):
            pass
    finally:
        hostprof.disable()
    t = hostprof.totals()
    hostprof.reset()
    for name in ("decode", "salient_meter", "instantiate", "collate"):
        assert name in t, f"span {name!r} never fired: {sorted(t)}"
        assert t[name] >= 0.0
