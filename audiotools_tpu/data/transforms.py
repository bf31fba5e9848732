"""Augmentation transforms (mirror of
`/root/reference/audiotools/data/transforms.py`).

Semantics preserved from the reference:

* ``instantiate(state, signal)`` draws parameters from distribution tuples
  with a numpy ``RandomState`` on host and a Bernoulli ``mask`` from
  ``prob`` (reference transforms.py:171-226);
* ``batch_instantiate`` collates per-item parameter dicts
  (transforms.py:228-265);
* ``transform(signal, **kwargs)`` applies the effect where the mask is
  true.

TPU-first difference: instead of boolean-mask *assignment*
(``signal[mask] = self._transform(signal[mask])``, transforms.py:158-164),
the effect is computed on the full batch and merged with
``AudioSignal.where`` — shape-stable, so an entire ``Compose`` chain
compiles to one jitted XLA program. Results are identical because every
transform is per-item independent.

Transforms that draw noise *during* application in the reference
(TimeNoise/FrequencyNoise via ``randn_like``, transforms.py:1487) draw it
at instantiate-time here, making them seed-deterministic (the reference
exempts them from reproducibility tests for exactly this reason,
tests/data/test_transforms.py:13).
"""
import copy
from contextlib import contextmanager
from inspect import signature
from typing import List

import jax.numpy as jnp
import numpy as np
from numpy.random import RandomState

from ..core import AudioSignal
from ..core import util
from ..core.util import flatten, unflatten
from .datasets import AudioLoader


def tt(x):
    """Convert a value to a jnp array (the reference's torch.tensor
    shorthand, transforms.py:17)."""
    if isinstance(x, jnp.ndarray):
        return x
    x = np.asarray(x)
    if x.dtype == np.float64:
        x = x.astype(np.float32)
    return jnp.asarray(x)


def _mask_statically_true(mask) -> bool:
    """True only when there is *static* evidence the mask is all-true:
    the ``AlwaysTrue`` sentinel (a leafless pytree node emitted by
    ``instantiate`` for prob=1.0, visible even under ``jit``) or a
    concrete value that verifiably holds no False. A traced array is
    never trusted — a hand-edited mask applied inside ``jit`` must take
    the masked path."""
    import jax

    if isinstance(mask, util.AlwaysTrue):
        return True
    if isinstance(mask, jax.core.Tracer):
        return False
    try:
        return bool(np.all(np.asarray(mask)))
    except Exception:
        return False


class BaseTransform:
    """Base class for all transforms (reference transforms.py:21-265).

    Parameters
    ----------
    keys : list, optional
        Extra keys expected in the transform kwargs.
    name : str, optional
        Name identifying this transform in instantiated dicts.
    prob : float, optional
        Probability of application, default 1.0.
    """

    def __init__(self, keys: list = [], name: str = None, prob: float = 1.0):
        tfm_keys = list(signature(self._transform).parameters.keys())

        # the signal itself and the catch-all **kwargs are not drawn params
        ignore_keys = ["signal", "kwargs"]
        tfm_keys = [k for k in tfm_keys if k not in ignore_keys]

        self.keys = keys + tfm_keys + ["mask"]

        self.prob = prob

        if name is None:
            name = self.__class__.__name__
        self.name = name

    def _prepare(self, batch: dict):
        sub_batch = batch[self.name]
        for k in self.keys:
            assert k in sub_batch.keys(), (
                f"transform '{self.name}' expected key '{k}' in its "
                f"instantiated kwargs, got {sorted(sub_batch.keys())}"
            )
        return sub_batch

    def _transform(self, signal):
        return signal

    def _instantiate(self, state: RandomState, signal: AudioSignal = None):
        return {}

    @staticmethod
    def apply_mask(batch: dict, mask):
        """Subset batch values where mask is true (reference
        transforms.py:114-131). Host-side only (boolean indexing)."""
        if isinstance(mask, util.AlwaysTrue):
            return batch
        mask = np.asarray(mask)
        masked_batch = {}
        for k, v in flatten(batch).items():
            if isinstance(v, (AudioSignal, jnp.ndarray, np.ndarray)):
                masked_batch[k] = v[mask]
            else:
                masked_batch[k] = v
        return unflatten(masked_batch)

    def transform(self, signal: AudioSignal, **kwargs):
        """Apply the transform where the mask is true
        (reference transforms.py:133-166; compute-all + select here).

        For ``prob == 1.0`` transforms, ``instantiate`` emits the static
        ``util.AlwaysTrue`` mask sentinel (its Bernoulli draw is true by
        construction), so the clone + ``where``-select (a full-signal
        copy each) is skipped entirely for always-on transforms — the
        common case in augmentation chains. The shortcut requires static
        evidence: the sentinel, or a concrete mask that is verifiably
        all-true. The moment a caller supplies any real mask array —
        even inside ``jit``, where it is traced and uninspectable — the
        masked path runs, so a hand-edited mask is never silently
        ignored. ``Choose`` rewrites child masks after instantiation
        (clearing the sentinel) and additionally opts its children back
        into the masked path via ``_force_masked``.
        """
        tfm_kwargs = self._prepare(kwargs)
        mask = tfm_kwargs["mask"]
        tfm_kwargs = {k: v for k, v in tfm_kwargs.items() if k != "mask"}

        if (
            not getattr(self, "_force_masked", False)
            and _mask_statically_true(mask)
        ):
            return self._transform(signal, **tfm_kwargs)

        original = signal.clone()
        transformed = self._transform(signal, **tfm_kwargs)
        return AudioSignal.where(tt(mask), transformed, original)

    def __call__(self, *args, **kwargs):
        return self.transform(*args, **kwargs)

    def instantiate(
        self,
        state: RandomState = None,
        signal: AudioSignal = None,
    ):
        """Draw parameters for this transform
        (reference transforms.py:171-226)."""
        state = util.random_state(state)

        needs_signal = "signal" in set(signature(self._instantiate).parameters.keys())
        kwargs = {}
        if needs_signal:
            kwargs = {"signal": signal}

        params = self._instantiate(state, **kwargs)
        for k in list(params.keys()):
            v = params[k]
            if isinstance(v, (AudioSignal, jnp.ndarray, dict)):
                params[k] = v
            else:
                params[k] = tt(v)
        if self.prob >= 1.0:
            # static sentinel: true by construction, survives collate /
            # device_put / jit as pytree structure rather than data
            params["mask"] = util.AlwaysTrue()
        else:
            params["mask"] = tt(bool(state.rand() <= self.prob))

        params = {self.name: params}
        return params

    def batch_instantiate(
        self,
        states: list = None,
        signal: AudioSignal = None,
    ):
        """Instantiate for every item in a batch and collate
        (reference transforms.py:228-265)."""
        kwargs = []
        for state in states:
            kwargs.append(self.instantiate(state, signal))
        kwargs = util.collate(kwargs)
        return kwargs


class Identity(BaseTransform):
    """Returns the original signal (reference transforms.py:268-271)."""

    pass


class SpectralTransform(BaseTransform):
    """Wraps stft/istft around the transform
    (reference transforms.py:274-287)."""

    def transform(self, signal, **kwargs):
        signal.stft()
        signal = super().transform(signal, **kwargs)
        signal.istft()
        return signal


class Compose(BaseTransform):
    """Applies transforms in sequence; children are addressed as
    ``{position}.{name}`` (reference transforms.py:289-424)."""

    def __init__(self, *transforms: list, name: str = None, prob: float = 1.0):
        if isinstance(transforms[0], list):
            transforms = transforms[0]

        for i, tfm in enumerate(transforms):
            tfm.name = f"{i}.{tfm.name}"

        keys = [tfm.name for tfm in transforms]
        super().__init__(keys=keys, name=name, prob=prob)

        self.transforms = transforms
        self.transforms_to_apply = keys

    @contextmanager
    def filter(self, *names: list):
        """Context manager restricting which named children run
        (reference transforms.py:359-402)."""
        old_transforms = self.transforms_to_apply
        self.transforms_to_apply = names
        yield
        self.transforms_to_apply = old_transforms

    def _transform(self, signal, **kwargs):
        for transform in self.transforms:
            if any([x in transform.name for x in self.transforms_to_apply]):
                signal = transform(signal, **kwargs)
        return signal

    def _instantiate(self, state: RandomState, signal: AudioSignal = None):
        parameters = {}
        for transform in self.transforms:
            parameters.update(transform.instantiate(state, signal=signal))
        return parameters

    def __getitem__(self, idx):
        return self.transforms[idx]

    def __len__(self):
        return len(self.transforms)

    def __iter__(self):
        for transform in self.transforms:
            yield transform


class Choose(Compose):
    """Applies exactly one child transform, chosen per item
    (reference transforms.py:427-475)."""

    def __init__(
        self,
        *transforms: list,
        weights: list = None,
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(*transforms, name=name, prob=prob)

        # _instantiate rewrites child masks into a one-hot selection, so
        # a prob=1.0 child must still honor its (rewritten) mask rather
        # than taking BaseTransform.transform's always-on shortcut.
        for tfm in self.transforms:
            tfm._force_masked = True

        if weights is None:
            _len = len(self.transforms)
            weights = [1 / _len for _ in range(_len)]
        self.weights = np.array(weights)

    def _instantiate(self, state: RandomState, signal: AudioSignal = None):
        kwargs = super()._instantiate(state, signal)
        tfm_idx = list(range(len(self.transforms)))
        tfm_idx = state.choice(tfm_idx, p=self.weights)
        one_hot = []
        for i, t in enumerate(self.transforms):
            mask = kwargs[t.name]["mask"]
            if bool(np.asarray(mask)):
                kwargs[t.name]["mask"] = tt(i == tfm_idx)
            one_hot.append(kwargs[t.name]["mask"])
        kwargs["one_hot"] = one_hot
        return kwargs


class Repeat(Compose):
    """Applies a transform ``n_repeat`` times (reference
    transforms.py:478-499)."""

    def __init__(
        self,
        transform,
        n_repeat: int = 1,
        name: str = None,
        prob: float = 1.0,
    ):
        transforms = [copy.copy(transform) for _ in range(n_repeat)]
        super().__init__(transforms, name=name, prob=prob)

        self.n_repeat = n_repeat


class RepeatUpTo(Choose):
    """Applies a transform up to ``max_repeat`` times
    (reference transforms.py:502-528)."""

    def __init__(
        self,
        transform,
        max_repeat: int = 5,
        weights: list = None,
        name: str = None,
        prob: float = 1.0,
    ):
        transforms = []
        for n in range(1, max_repeat):
            transforms.append(Repeat(transform, n_repeat=n))
        super().__init__(transforms, name=name, prob=prob, weights=weights)

        self.max_repeat = max_repeat


class ClippingDistortion(BaseTransform):
    """Percentile clipping (reference transforms.py:531-561)."""

    def __init__(
        self,
        perc: tuple = ("uniform", 0.0, 0.1),
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)
        self.perc = perc

    def _instantiate(self, state: RandomState):
        return {"perc": util.sample_from_dist(self.perc, state)}

    def _transform(self, signal, perc):
        return signal.clip_distortion(perc)


class Equalizer(BaseTransform):
    """Mel-spaced EQ curve (reference transforms.py:564-600)."""

    def __init__(
        self,
        eq_amount: tuple = ("const", 1.0),
        n_bands: int = 6,
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)
        self.eq_amount = eq_amount
        self.n_bands = n_bands

    def _instantiate(self, state: RandomState):
        eq_amount = util.sample_from_dist(self.eq_amount, state)
        eq = -eq_amount * state.rand(self.n_bands)
        return {"eq": eq.astype("float32")}

    def _transform(self, signal, eq):
        return signal.equalizer(eq)


class Quantization(BaseTransform):
    """Uniform quantization (reference transforms.py:603-633)."""

    def __init__(
        self,
        channels: tuple = ("choice", [8, 32, 128, 256, 1024]),
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)
        self.channels = channels

    def _instantiate(self, state: RandomState):
        return {"channels": util.sample_from_dist(self.channels, state)}

    def _transform(self, signal, channels):
        return signal.quantization(channels)


class MuLawQuantization(BaseTransform):
    """Mu-law quantization (reference transforms.py:636-666)."""

    def __init__(
        self,
        channels: tuple = ("choice", [8, 32, 128, 256, 1024]),
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)
        self.channels = channels

    def _instantiate(self, state: RandomState):
        return {"channels": util.sample_from_dist(self.channels, state)}

    def _transform(self, signal, channels):
        return signal.mulaw_quantization(channels)


class NoiseFloor(BaseTransform):
    """Gaussian noise floor at a given dB (reference transforms.py:669-704)."""

    def __init__(
        self,
        db: tuple = ("const", -50.0),
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _instantiate(self, state: RandomState, signal: AudioSignal):
        db = util.sample_from_dist(self.db, state)
        audio_data = state.randn(signal.num_channels, signal.signal_length)
        nz_signal = AudioSignal(audio_data.astype("float32"), signal.sample_rate)
        nz_signal.normalize(db)
        return {"nz_signal": nz_signal}

    def _transform(self, signal, nz_signal):
        # Clone so the transform can be applied repeatedly.
        return signal + nz_signal


class BackgroundNoise(BaseTransform):
    """Mix in background noise drawn from sources
    (reference transforms.py:707-792)."""

    def __init__(
        self,
        snr: tuple = ("uniform", 10.0, 30.0),
        sources: List[str] = None,
        weights: List[float] = None,
        eq_amount: tuple = ("const", 1.0),
        n_bands: int = 3,
        name: str = None,
        prob: float = 1.0,
        loudness_cutoff: float = None,
    ):
        super().__init__(name=name, prob=prob)

        self.snr = snr
        self.eq_amount = eq_amount
        self.n_bands = n_bands
        self.loader = AudioLoader(sources, weights)
        self.loudness_cutoff = loudness_cutoff

    def _instantiate(self, state: RandomState, signal: AudioSignal):
        eq_amount = util.sample_from_dist(self.eq_amount, state)
        eq = -eq_amount * state.rand(self.n_bands)
        snr = util.sample_from_dist(self.snr, state)

        bg_signal = self.loader(
            state,
            signal.sample_rate,
            duration=signal.signal_duration,
            loudness_cutoff=self.loudness_cutoff,
            num_channels=signal.num_channels,
        )["signal"]

        return {"eq": eq.astype("float32"), "bg_signal": bg_signal, "snr": snr}

    def _transform(self, signal, bg_signal, snr, eq):
        return signal.mix(bg_signal.clone(), snr, eq)


class CrossTalk(BaseTransform):
    """Crosstalk between speakers (reference transforms.py:795-854)."""

    def __init__(
        self,
        snr: tuple = ("uniform", 0.0, 10.0),
        sources: List[str] = None,
        weights: List[float] = None,
        name: str = None,
        prob: float = 1.0,
        loudness_cutoff: float = -40,
    ):
        super().__init__(name=name, prob=prob)

        self.snr = snr
        self.loader = AudioLoader(sources, weights)
        self.loudness_cutoff = loudness_cutoff

    def _instantiate(self, state: RandomState, signal: AudioSignal):
        snr = util.sample_from_dist(self.snr, state)
        crosstalk_signal = self.loader(
            state,
            signal.sample_rate,
            duration=signal.signal_duration,
            loudness_cutoff=self.loudness_cutoff,
            num_channels=signal.num_channels,
        )["signal"]

        return {"crosstalk_signal": crosstalk_signal, "snr": snr}

    def _transform(self, signal, crosstalk_signal, snr):
        loudness = signal.loudness()
        mix = signal.mix(crosstalk_signal.clone(), snr)
        mix.normalize(loudness)
        return mix


class RoomImpulseResponse(BaseTransform):
    """Reverb via IR convolution at a target DRR
    (reference transforms.py:857-938)."""

    def __init__(
        self,
        drr: tuple = ("uniform", 0.0, 30.0),
        sources: List[str] = None,
        weights: List[float] = None,
        eq_amount: tuple = ("const", 1.0),
        n_bands: int = 6,
        name: str = None,
        prob: float = 1.0,
        use_original_phase: bool = False,
        offset: float = 0.0,
        duration: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)

        self.drr = drr
        self.eq_amount = eq_amount
        self.n_bands = n_bands
        self.use_original_phase = use_original_phase

        self.loader = AudioLoader(sources, weights)
        self.offset = offset
        self.duration = duration

    def _instantiate(self, state: RandomState, signal: AudioSignal = None):
        eq_amount = util.sample_from_dist(self.eq_amount, state)
        eq = -eq_amount * state.rand(self.n_bands)
        drr = util.sample_from_dist(self.drr, state)

        ir_signal = self.loader(
            state,
            signal.sample_rate,
            offset=self.offset,
            duration=self.duration,
            loudness_cutoff=None,
            num_channels=signal.num_channels,
        )["signal"]
        ir_signal.zero_pad_to(signal.sample_rate)

        return {"eq": eq.astype("float32"), "ir_signal": ir_signal, "drr": drr}

    def _transform(self, signal, ir_signal, drr, eq):
        return signal.apply_ir(
            ir_signal.clone(), drr, eq, use_original_phase=self.use_original_phase
        )


class VolumeChange(BaseTransform):
    """Volume change in dB (reference transforms.py:941-970)."""

    def __init__(
        self,
        db: tuple = ("uniform", -12.0, 0.0),
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _instantiate(self, state: RandomState):
        return {"db": util.sample_from_dist(self.db, state)}

    def _transform(self, signal, db):
        return signal.volume_change(db)


class VolumeNorm(BaseTransform):
    """Loudness normalization (reference transforms.py:973-1003)."""

    def __init__(
        self,
        db: tuple = ("const", -24),
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _instantiate(self, state: RandomState):
        return {"db": util.sample_from_dist(self.db, state)}

    def _transform(self, signal, db):
        return signal.normalize(db)


class GlobalVolumeNorm(BaseTransform):
    """Normalize using the source file's global loudness from metadata
    (reference transforms.py:1006-1063)."""

    def __init__(
        self,
        db: tuple = ("const", -24),
        name: str = None,
        prob: float = 1.0,
    ):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _instantiate(self, state: RandomState, signal: AudioSignal):
        if "loudness" not in signal.metadata:
            db_change = 0.0
        elif float(signal.metadata["loudness"]) == float("-inf"):
            db_change = 0.0
        else:
            db = util.sample_from_dist(self.db, state)
            db_change = db - float(signal.metadata["loudness"])

        return {"db": db_change}

    def _transform(self, signal, db):
        return signal.volume_change(db)


class Silence(BaseTransform):
    """Zeros out the signal (reference transforms.py:1066-1092)."""

    def __init__(self, name: str = None, prob: float = 0.1):
        super().__init__(name=name, prob=prob)

    def _transform(self, signal):
        _loudness = signal._loudness
        signal = AudioSignal(
            jnp.zeros_like(signal.audio_data),
            sample_rate=signal.sample_rate,
            stft_params=signal.stft_params,
        )
        # keep the pre-silence LUFS on the zeroed signal: downstream
        # snr-relative mixes should dose noise against the original level
        signal._loudness = _loudness
        return signal


class LowPass(BaseTransform):
    """Low-pass filter (reference transforms.py:1095-1131)."""

    def __init__(
        self,
        cutoff: tuple = ("choice", [4000, 8000, 16000]),
        zeros: int = 51,
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(name=name, prob=prob)
        self.cutoff = cutoff
        self.zeros = zeros
        # the dist tuple's lower bound fixes the longest sinc kernel this
        # transform can need, keeping the jitted kernel support tight
        self._min_cutoff = util.dist_lower_bound(cutoff, default=40.0)

    def _instantiate(self, state: RandomState):
        return {"cutoff": util.sample_from_dist(self.cutoff, state)}

    def _transform(self, signal, cutoff):
        return signal.low_pass(
            cutoff, zeros=self.zeros, min_cutoff_hz=self._min_cutoff
        )


class HighPass(BaseTransform):
    """High-pass filter (reference transforms.py:1134-1170)."""

    def __init__(
        self,
        cutoff: tuple = ("choice", [50, 100, 250, 500, 1000]),
        zeros: int = 51,
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(name=name, prob=prob)
        self.cutoff = cutoff
        self.zeros = zeros
        self._min_cutoff = util.dist_lower_bound(cutoff, default=40.0)

    def _instantiate(self, state: RandomState):
        return {"cutoff": util.sample_from_dist(self.cutoff, state)}

    def _transform(self, signal, cutoff):
        return signal.high_pass(
            cutoff, zeros=self.zeros, min_cutoff_hz=self._min_cutoff
        )


class RescaleAudio(BaseTransform):
    """Peak-limit to ±val (reference transforms.py:1173-1197)."""

    def __init__(self, val: float = 1.0, name: str = None, prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.val = val

    def _transform(self, signal):
        return signal.ensure_max_of_audio(self.val)


class ShiftPhase(SpectralTransform):
    """Constant phase shift (reference transforms.py:1200-1229)."""

    def __init__(
        self,
        shift: tuple = ("uniform", -np.pi, np.pi),
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(name=name, prob=prob)
        self.shift = shift

    def _instantiate(self, state: RandomState):
        return {"shift": util.sample_from_dist(self.shift, state)}

    def _transform(self, signal, shift):
        return signal.shift_phase(shift)


class InvertPhase(ShiftPhase):
    """Phase inversion (reference transforms.py:1232-1247)."""

    def __init__(self, name: str = None, prob: float = 1):
        super().__init__(shift=("const", np.pi), name=name, prob=prob)


class CorruptPhase(SpectralTransform):
    """Random phase corruption (reference transforms.py:1250-1278)."""

    def __init__(
        self, scale: tuple = ("uniform", 0, np.pi), name: str = None, prob: float = 1
    ):
        super().__init__(name=name, prob=prob)
        self.scale = scale

    def _instantiate(self, state: RandomState, signal: AudioSignal = None):
        scale = util.sample_from_dist(self.scale, state)
        corruption = state.normal(scale=scale, size=signal.phase.shape[1:])
        return {"corruption": corruption.astype("float32")}

    def _transform(self, signal, corruption):
        return signal.shift_phase(shift=corruption)


class FrequencyMask(SpectralTransform):
    """SpecAug frequency band mask (reference transforms.py:1281-1324)."""

    def __init__(
        self,
        f_center: tuple = ("uniform", 0.0, 1.0),
        f_width: tuple = ("const", 0.1),
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(name=name, prob=prob)
        self.f_center = f_center
        self.f_width = f_width

    def _instantiate(self, state: RandomState, signal: AudioSignal):
        f_center = util.sample_from_dist(self.f_center, state)
        f_width = util.sample_from_dist(self.f_width, state)

        fmin = max(f_center - (f_width / 2), 0.0)
        fmax = min(f_center + (f_width / 2), 1.0)

        fmin_hz = (signal.sample_rate / 2) * fmin
        fmax_hz = (signal.sample_rate / 2) * fmax

        return {"fmin_hz": fmin_hz, "fmax_hz": fmax_hz}

    def _transform(self, signal, fmin_hz: float, fmax_hz: float):
        return signal.mask_frequencies(fmin_hz=fmin_hz, fmax_hz=fmax_hz)


class TimeMask(SpectralTransform):
    """SpecAug time mask (reference transforms.py:1327-1369)."""

    def __init__(
        self,
        t_center: tuple = ("uniform", 0.0, 1.0),
        t_width: tuple = ("const", 0.025),
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(name=name, prob=prob)
        self.t_center = t_center
        self.t_width = t_width

    def _instantiate(self, state: RandomState, signal: AudioSignal):
        t_center = util.sample_from_dist(self.t_center, state)
        t_width = util.sample_from_dist(self.t_width, state)

        tmin = max(t_center - (t_width / 2), 0.0)
        tmax = min(t_center + (t_width / 2), 1.0)

        tmin_s = signal.signal_duration * tmin
        tmax_s = signal.signal_duration * tmax
        return {"tmin_s": tmin_s, "tmax_s": tmax_s}

    def _transform(self, signal, tmin_s: float, tmax_s: float):
        return signal.mask_timesteps(tmin_s=tmin_s, tmax_s=tmax_s)


class MaskLowMagnitudes(SpectralTransform):
    """Mask low-magnitude spectrogram cells
    (reference transforms.py:1372-1402)."""

    def __init__(
        self,
        db_cutoff: tuple = ("uniform", -10, 10),
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(name=name, prob=prob)
        self.db_cutoff = db_cutoff

    def _instantiate(self, state: RandomState, signal: AudioSignal = None):
        return {"db_cutoff": util.sample_from_dist(self.db_cutoff, state)}

    def _transform(self, signal, db_cutoff: float):
        return signal.mask_low_magnitudes(db_cutoff)


class Smoothing(BaseTransform):
    """Convolve with a smoothing window (reference transforms.py:1405-1453)."""

    def __init__(
        self,
        window_type: tuple = ("const", "average"),
        window_length: tuple = ("choice", [8, 16, 32, 64, 128, 256, 512]),
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(name=name, prob=prob)
        self.window_type = window_type
        self.window_length = window_length

    def _instantiate(self, state: RandomState, signal: AudioSignal = None):
        window_type = util.sample_from_dist(self.window_type, state)
        window_length = util.sample_from_dist(self.window_length, state)
        window = signal.get_window(
            window_type=window_type, window_length=window_length
        )
        return {"window": AudioSignal(window, signal.sample_rate)}

    def _transform(self, signal, window):
        sscale = jnp.max(jnp.abs(signal.audio_data), axis=-1, keepdims=True)
        sscale = jnp.where(sscale == 0.0, 1.0, sscale)

        out = signal.convolve(window)

        oscale = jnp.max(jnp.abs(out.audio_data), axis=-1, keepdims=True)
        oscale = jnp.where(oscale == 0.0, 1.0, oscale)

        out = out * (sscale / oscale)
        return out


class TimeNoise(TimeMask):
    """Replace a time band with noise (reference transforms.py:1456-1495).

    Noise is drawn at instantiate time (seed-deterministic) rather than at
    transform time as the reference does.
    """

    def __init__(
        self,
        t_center: tuple = ("uniform", 0.0, 1.0),
        t_width: tuple = ("const", 0.025),
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(t_center=t_center, t_width=t_width, name=name, prob=prob)

    def _instantiate(self, state: RandomState, signal: AudioSignal):
        kwargs = super()._instantiate(state, signal)
        shape = signal.phase.shape[1:]
        kwargs["mag_noise"] = state.randn(*shape).astype("float32")
        kwargs["phase_noise"] = state.randn(*shape).astype("float32")
        return kwargs

    def _transform(self, signal, tmin_s, tmax_s, mag_noise, phase_noise):
        signal = signal.mask_timesteps(tmin_s=tmin_s, tmax_s=tmax_s, val=0.0)
        mag, phase = signal.magnitude, signal.phase

        mask = (mag == 0.0) & (phase == 0.0)
        mag = jnp.where(mask, mag_noise, mag)
        phase = jnp.where(mask, phase_noise, phase)

        signal.stft_data = mag * jnp.exp(1j * phase)
        return signal


class FrequencyNoise(FrequencyMask):
    """Replace a frequency band with noise
    (reference transforms.py:1498-1536). Noise drawn at instantiate time."""

    def __init__(
        self,
        f_center: tuple = ("uniform", 0.0, 1.0),
        f_width: tuple = ("const", 0.1),
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(f_center=f_center, f_width=f_width, name=name, prob=prob)

    def _instantiate(self, state: RandomState, signal: AudioSignal):
        kwargs = super()._instantiate(state, signal)
        shape = signal.phase.shape[1:]
        kwargs["mag_noise"] = state.randn(*shape).astype("float32")
        kwargs["phase_noise"] = state.randn(*shape).astype("float32")
        return kwargs

    def _transform(self, signal, fmin_hz, fmax_hz, mag_noise, phase_noise):
        signal = signal.mask_frequencies(fmin_hz=fmin_hz, fmax_hz=fmax_hz)
        mag, phase = signal.magnitude, signal.phase

        mask = (mag == 0.0) & (phase == 0.0)
        mag = jnp.where(mask, mag_noise, mag)
        phase = jnp.where(mask, phase_noise, phase)

        signal.stft_data = mag * jnp.exp(1j * phase)
        return signal


class SpectralDenoising(Equalizer):
    """Spectral-gate denoising with a random noise signal
    (reference transforms.py:1539-1592)."""

    def __init__(
        self,
        eq_amount: tuple = ("const", 1.0),
        denoise_amount: tuple = ("uniform", 0.8, 1.0),
        nz_volume: float = -40,
        n_bands: int = 6,
        n_freq: int = 3,
        n_time: int = 5,
        name: str = None,
        prob: float = 1,
    ):
        super().__init__(eq_amount=eq_amount, n_bands=n_bands, name=name, prob=prob)

        from ..ml import layers as ml_layers

        self.nz_volume = nz_volume
        self.denoise_amount = denoise_amount
        self.spectral_gate = ml_layers.SpectralGate(n_freq, n_time)

    def _transform(self, signal, nz, eq, denoise_amount):
        nz = nz.normalize(self.nz_volume).equalizer(eq)
        signal = self.spectral_gate(signal, nz, denoise_amount)
        return signal

    def _instantiate(self, state: RandomState):
        kwargs = super()._instantiate(state)
        kwargs["denoise_amount"] = util.sample_from_dist(self.denoise_amount, state)
        kwargs["nz"] = AudioSignal(state.randn(22050).astype("float32"), 44100)
        return kwargs
