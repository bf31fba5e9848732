"""Transform framework + zoo tests (mirroring reference
tests/data/test_transforms.py: batch-vs-single consistency, determinism,
masked application, meta-transforms)."""
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

import audiotools_tpu
import audiotools_tpu.core.util
from audiotools_tpu import AudioSignal
from audiotools_tpu.data import transforms as tfm
from tests.fixtures import speech_like

SEED = 42

# transforms needing loader sources
LOADER_TFMS = {"BackgroundNoise", "CrossTalk", "RoomImpulseResponse"}
# transforms skipped from the generic sweep
SKIP = {
    "Compose",
    "Choose",
    "Repeat",
    "RepeatUpTo",
    "BaseTransform",
    "SpectralTransform",
    "Identity",
    "SpectralDenoising",  # covered separately (heavier)
}

ALL_TFMS = [
    x
    for x in dir(tfm)
    if isinstance(getattr(tfm, x), type)
    and issubclass(getattr(tfm, x), tfm.BaseTransform)
    and x not in SKIP
]


def _make_transform(name, audio_dir):
    cls = getattr(tfm, name)
    if name == "BackgroundNoise":
        return cls(sources=[str(audio_dir / "nz.csv")])
    if name == "CrossTalk":
        return cls(sources=[str(audio_dir / "spk.csv")])
    if name == "RoomImpulseResponse":
        return cls(sources=[str(audio_dir / "ir.csv")])
    return cls()


def _signal(seed=0, dur=2.0):
    sig = AudioSignal(speech_like(seed, dur)[None, None], 44100)
    sig.metadata["loudness"] = float(np.asarray(sig.loudness())[0])
    return sig


@pytest.mark.parametrize("name", ALL_TFMS)
def test_transform_applies_and_is_deterministic(name, audio_dir):
    transform = _make_transform(name, audio_dir)
    signal = _signal()
    kwargs = transform.instantiate(SEED, signal)
    out1 = transform(signal.clone(), **kwargs)
    out2 = transform(signal.clone(), **kwargs)
    # applying the same instantiated args twice is identical
    # (reference tests/data/test_transforms.py:78-85)
    assert np.allclose(out1.numpy(), out2.numpy(), atol=1e-6)
    assert out1.shape == signal.shape


@pytest.mark.parametrize("name", ALL_TFMS)
def test_batch_matches_single(name, audio_dir):
    """batch_instantiate on seeds [seed..seed+B) reproduces item i of the
    batched application (reference tests/data/test_transforms.py:66-85)."""
    batch_size = 4
    transform = _make_transform(name, audio_dir)
    signal = _signal()
    signal_batch = AudioSignal.batch([signal.clone() for _ in range(batch_size)])

    states = [SEED + idx for idx in range(batch_size)]
    kwargs = transform.batch_instantiate(states, signal)
    batch_output = transform(signal_batch, **kwargs)

    for i in [0, batch_size - 1]:
        single_kwargs = transform.instantiate(states[i], signal)
        single_output = transform(signal.clone(), **single_kwargs)
        assert np.allclose(
            np.asarray(batch_output.audio_data[i]),
            np.asarray(single_output.audio_data[0]),
            atol=1e-4,
        ), f"{name} batch item {i} != single"


def test_mask_false_is_identity(audio_dir):
    transform = tfm.VolumeChange(prob=0.0)
    signal = _signal()
    kwargs = transform.instantiate(SEED, signal)
    assert not bool(np.asarray(kwargs["VolumeChange"]["mask"]))
    out = transform(signal.clone(), **kwargs)
    assert np.allclose(out.numpy(), signal.numpy())


def test_prob_masks_partial_batch():
    transform = tfm.Silence(prob=0.5)
    batch_size = 16
    signal = _signal()
    batch = AudioSignal.batch([signal.clone() for _ in range(batch_size)])
    kwargs = transform.batch_instantiate(list(range(batch_size)), signal)
    mask = np.asarray(kwargs["Silence"]["mask"])
    assert 0 < mask.sum() < batch_size
    out = transform(batch, **kwargs)
    zeroed = np.abs(out.numpy()).max(axis=(1, 2)) == 0
    assert (zeroed == mask).all()


def test_compose(audio_dir):
    transform = tfm.Compose(
        [
            tfm.RoomImpulseResponse(sources=[str(audio_dir / "ir.csv")]),
            tfm.BackgroundNoise(sources=[str(audio_dir / "nz.csv")]),
        ],
    )
    signal = _signal()
    kwargs = transform.instantiate(SEED, signal)
    assert "0.RoomImpulseResponse" in kwargs["Compose"]
    assert "1.BackgroundNoise" in kwargs["Compose"]
    out = transform(signal.clone(), **kwargs)
    assert out.shape == signal.shape
    assert not np.allclose(out.numpy(), signal.numpy())
    assert len(transform) == 2
    assert [t for t in transform][0].name == "0.RoomImpulseResponse"
    assert transform[0] is transform.transforms[0]


def test_compose_filter(audio_dir):
    preprocess = tfm.Compose(tfm.VolumeChange(("const", -10.0)), name="preprocess")
    postprocess = tfm.Compose(tfm.RescaleAudio(), name="postprocess")
    transform = tfm.Compose(preprocess, postprocess)
    signal = _signal()
    kwargs = transform.instantiate(SEED, signal)

    with transform.filter("postprocess"):
        out = transform(signal.clone(), **kwargs)
    # only rescale ran; no volume change
    assert np.allclose(out.numpy(), signal.clone().ensure_max_of_audio().numpy(), atol=1e-6)

    full = transform(signal.clone(), **kwargs)
    assert not np.allclose(full.numpy(), out.numpy())


def test_nested_compose(audio_dir):
    transform = tfm.Compose(
        tfm.Compose(tfm.VolumeChange(), name="a"),
        tfm.Compose(tfm.RescaleAudio(), name="b"),
    )
    signal = _signal()
    kwargs = transform.instantiate(SEED, signal)
    out = transform(signal.clone(), **kwargs)
    assert out.shape == signal.shape


def test_choose_applies_one():
    transform = tfm.Choose(
        tfm.VolumeChange(("const", -20.0)), tfm.Silence(prob=1.0)
    )
    signal = _signal()
    picked = set()
    for seed in range(12):
        kwargs = transform.instantiate(seed, signal)
        masks = [
            bool(np.asarray(kwargs["Choose"][t.name]["mask"]))
            for t in transform.transforms
        ]
        assert sum(masks) <= 1
        if any(masks):
            picked.add(masks.index(True))
        out = transform(signal.clone(), **kwargs)
    assert picked == {0, 1}  # both children get chosen across seeds


def test_choose_weights():
    transform = tfm.Choose(
        tfm.VolumeChange(), tfm.Silence(prob=1.0), weights=[1.0, 0.0]
    )
    signal = _signal()
    for seed in range(8):
        kwargs = transform.instantiate(seed, signal)
        assert not bool(np.asarray(kwargs["Choose"]["1.Silence"]["mask"]))


def test_repeat():
    transform = tfm.Repeat(tfm.VolumeChange(("const", -3.0)), n_repeat=3)
    signal = _signal()
    kwargs = transform.instantiate(SEED, signal)
    out = transform(signal.clone(), **kwargs)
    # three applications of -3 dB = -9 dB
    ratio = np.abs(out.numpy()).max() / np.abs(signal.numpy()).max()
    assert abs(20 * np.log10(ratio) + 9.0) < 0.1


def test_repeat_up_to():
    transform = tfm.RepeatUpTo(tfm.VolumeChange(("const", -3.0)), max_repeat=4)
    signal = _signal()
    kwargs = transform.instantiate(SEED, signal)
    out = transform(signal.clone(), **kwargs)
    assert out.shape == signal.shape


def test_global_volume_norm_uses_metadata():
    signal = _signal()
    signal.metadata["loudness"] = -30.0
    transform = tfm.GlobalVolumeNorm(db=("const", -24.0))
    kwargs = transform.instantiate(SEED, signal)
    assert abs(float(np.asarray(kwargs["GlobalVolumeNorm"]["db"])) - 6.0) < 1e-6

    signal.metadata["loudness"] = float("-inf")
    kwargs = transform.instantiate(SEED, signal)
    assert float(np.asarray(kwargs["GlobalVolumeNorm"]["db"])) == 0.0


def test_spectral_denoising(audio_dir):
    transform = tfm.SpectralDenoising()
    signal = _signal()
    nz = AudioSignal(
        (speech_like(7, 2.0) * 0.01 + np.random.RandomState(3).randn(88200) * 0.02)[
            None, None
        ].astype(np.float32),
        44100,
    )
    noisy = signal.clone().mix(nz, snr=10)
    kwargs = transform.instantiate(SEED, noisy)
    out = transform(noisy.clone(), **kwargs)
    assert out.shape == signal.shape


def test_apply_mask_helper():
    batch = {"a": jnp.arange(4.0), "nested": {"b": jnp.ones((4, 2))}}
    mask = np.array([True, False, True, False])
    out = tfm.BaseTransform.apply_mask(batch, mask)
    assert out["a"].shape == (2,)
    assert out["nested"]["b"].shape == (2, 2)


def test_transform_chain_jits(audio_dir):
    """An entire Compose chain compiles to one jitted program over
    (signal, kwargs) pytrees — the core TPU design point."""
    import jax

    transform = tfm.Compose(
        tfm.RoomImpulseResponse(sources=[str(audio_dir / "ir.csv")]),
        tfm.BackgroundNoise(sources=[str(audio_dir / "nz.csv")]),
        tfm.VolumeNorm(),
    )
    signal = _signal()
    batch = AudioSignal.batch([signal.clone() for _ in range(4)])
    kwargs = transform.batch_instantiate(list(range(4)), signal)

    @jax.jit
    def apply(sig, kw):
        return transform(sig, **kw)

    out1 = apply(batch, kwargs)
    out0 = transform(batch.clone(), **kwargs)
    assert np.allclose(out1.numpy(), out0.numpy(), atol=1e-4)


def test_smoothing_all_zero_signal_stays_zero():
    """Reference test_smoothing_edge_case (tests/data/test_transforms.py:
    407-414): smoothing a silent signal must not produce NaNs from the
    max-normalization (our _transform guards both scales)."""
    transform = tfm.Smoothing()
    zeros = AudioSignal(np.zeros((1, 1, 44100), np.float32), 44100)
    kwargs = transform.instantiate(audiotools_tpu.core.util.random_state(0), zeros)
    out = transform(zeros.clone(), **kwargs)
    assert np.allclose(out.numpy(), 0.0)
    assert np.isfinite(out.numpy()).all()


def test_compose_with_duplicate_transforms():
    """Reference test (tests/data/test_transforms.py:127-140): Compose
    must disambiguate same-class children (index-prefixed names) and
    apply every copy."""
    dbs = [-6.0, -6.0, -6.0]
    transform = tfm.Compose(*[tfm.VolumeChange(("const", db)) for db in dbs])
    signal = _signal()
    kwargs = transform.instantiate(audiotools_tpu.core.util.random_state(SEED), signal)
    out = transform(signal.clone(), **kwargs)
    total_gain = 10 ** (sum(dbs) / 20.0)
    assert np.allclose(out.numpy(), signal.numpy() * total_gain, atol=1e-5)


def test_prob_one_shortcut_matches_masked_path():
    """The always-on (prob=1.0) shortcut must be output-identical to the
    generic where-merge path: where(True, transformed, original) ==
    transformed bitwise."""
    transform = tfm.VolumeChange(("const", -7.0))
    signal = _signal()
    kwargs = transform.instantiate(
        audiotools_tpu.core.util.random_state(SEED), signal
    )
    fast = transform(signal.clone(), **kwargs)

    transform._force_masked = True
    slow = transform(signal.clone(), **kwargs)
    del transform._force_masked
    assert np.array_equal(fast.numpy(), slow.numpy())


def test_prob_one_hand_edited_mask_honored_in_jit():
    """A prob=1.0 transform whose mask was hand-edited to a half-false
    array must take the masked path even inside jit, where the mask is
    traced and uninspectable: items with mask=False come back unchanged.
    (The always-on shortcut requires the static AlwaysTrue sentinel —
    replacing it with any real array clears the static evidence.)"""
    import jax

    transform = tfm.VolumeChange(("const", -12.0))
    batch = AudioSignal(
        np.stack([speech_like(s, 1.0)[None] for s in range(4)]), 44100
    )
    kwargs = transform.instantiate(
        audiotools_tpu.core.util.random_state(SEED), batch
    )
    name = transform.name
    assert isinstance(
        kwargs[name]["mask"], audiotools_tpu.core.util.AlwaysTrue
    )
    # hand-edit: disable the transform for items 1 and 3
    kwargs[name]["mask"] = jnp.asarray([True, False, True, False])
    kwargs[name]["db"] = jnp.full((4,), -12.0)

    def apply(sig, kw):
        return transform(sig, **kw).audio_data

    out = jax.jit(apply)(batch, kwargs)
    gain = 10 ** (-12.0 / 20.0)
    expected = np.where(
        np.asarray([True, False, True, False])[:, None, None],
        batch.numpy() * gain,
        batch.numpy(),
    )
    assert np.allclose(np.asarray(out), expected, atol=1e-6)
    # masked-off items must be bitwise untouched
    assert np.array_equal(np.asarray(out)[1], batch.numpy()[1])


def test_always_true_mask_survives_collate_and_pickle():
    """The static sentinel must survive batch_instantiate's collate and
    a pickle round trip (dataloader workers), staying statically
    inspectable so the jit fast path persists through the input
    pipeline."""
    import pickle

    transform = tfm.VolumeChange(("const", -6.0))
    sig = _signal()
    states = [audiotools_tpu.core.util.random_state(s) for s in range(4)]
    kwargs = transform.batch_instantiate(states, sig)
    mask = kwargs[transform.name]["mask"]
    assert isinstance(mask, audiotools_tpu.core.util.AlwaysTrue)
    restored = pickle.loads(pickle.dumps(kwargs))
    assert isinstance(
        restored[transform.name]["mask"], audiotools_tpu.core.util.AlwaysTrue
    )
    # device_put / tree_map treat it as structure, not data
    import jax

    moved = jax.device_put(restored)
    assert isinstance(
        moved[transform.name]["mask"], audiotools_tpu.core.util.AlwaysTrue
    )


def test_choose_children_honor_rewritten_masks():
    """A prob=1.0 child inside Choose must still respect the one-hot
    mask rewrite — exactly one child may alter the signal."""
    transform = tfm.Choose(
        tfm.VolumeChange(("const", -20.0)),
        tfm.VolumeChange(("const", +6.0)),
    )
    signal = _signal()
    gains = set()
    for seed in range(8):
        kwargs = transform.instantiate(
            audiotools_tpu.core.util.random_state(seed), signal
        )
        out = transform(signal.clone(), **kwargs)
        ratio = float(
            np.abs(out.numpy()).max() / np.abs(signal.numpy()).max()
        )
        gains.add(round(ratio, 3))
    # only the two single-child gains may ever appear — never their
    # product (which is what running both children would produce)
    expected = {round(10 ** (-20 / 20), 3), round(10 ** (6 / 20), 3)}
    assert gains <= expected, gains
    assert len(gains) == 2, gains


def test_prob_one_respects_concrete_false_mask():
    """A hand-edited concrete mask must still win over the prob=1.0
    shortcut (the shortcut only trusts prob when the mask is a traced
    value it cannot inspect)."""
    transform = tfm.VolumeChange(("const", -20.0))
    signal = _signal()
    kwargs = transform.instantiate(
        audiotools_tpu.core.util.random_state(SEED), signal
    )
    kwargs[transform.name]["mask"] = tfm.tt(False)
    out = transform(signal.clone(), **kwargs)
    assert np.array_equal(out.numpy(), signal.numpy())
