"""Augmentation transforms (parity surface with
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

The draw ORDER inside every ``_instantiate`` is part of the public
contract (seeded states must reproduce committed regression outputs) —
keep it stable when editing.
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
    """Array-ify a value (the role the reference gives ``torch.tensor``,
    transforms.py:17). Host values become numpy — instantiate() runs in
    dataloader workers, which must never touch the device — and cross to
    HBM once per batch at the jit boundary; traced/device values pass
    through."""
    if isinstance(x, jnp.ndarray):
        return x
    x = np.asarray(x)
    if x.dtype == np.float64:
        x = x.astype(np.float32)
    return x


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
    """Base class for all transforms (parity surface with reference
    transforms.py:21-265): drawn parameter names are discovered by
    introspecting ``_transform``'s signature.

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
        drawn = [
            k for k in signature(self._transform).parameters
            if k not in ("signal", "kwargs")
        ]
        self.keys = keys + drawn + ["mask"]
        self.prob = prob
        self.name = self.__class__.__name__ if name is None else name

    def _prepare(self, batch: dict):
        sub_batch = batch[self.name]
        missing = [k for k in self.keys if k not in sub_batch]
        assert not missing, (
            f"transform '{self.name}' expected key(s) {missing} in its "
            f"instantiated kwargs, got {sorted(sub_batch.keys())}"
        )
        return sub_batch

    def _transform(self, signal):
        return signal

    def _instantiate(self, state, signal: AudioSignal = None):
        return {}

    @staticmethod
    def apply_mask(batch: dict, mask):
        """Subset batch values where mask is true (parity with reference
        transforms.py:114-131). Host-side only (boolean indexing)."""
        if isinstance(mask, util.AlwaysTrue):
            return batch
        mask = np.asarray(mask)
        indexable = (AudioSignal, jnp.ndarray, np.ndarray)
        picked = {
            k: (v[mask] if isinstance(v, indexable) else v)
            for k, v in flatten(batch).items()
        }
        return unflatten(picked)

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
        tfm_kwargs = dict(self._prepare(kwargs))
        mask = tfm_kwargs.pop("mask")

        skip_select = (
            _mask_statically_true(mask)
            and not getattr(self, "_force_masked", False)
        )
        if skip_select:
            return self._transform(signal, **tfm_kwargs)

        original = signal.clone()
        transformed = self._transform(signal, **tfm_kwargs)
        return AudioSignal.where(tt(mask), transformed, original)

    def __call__(self, *args, **kwargs):
        return self.transform(*args, **kwargs)

    def instantiate(self, state=None, signal: AudioSignal = None):
        """Draw parameters for this transform (parity with reference
        transforms.py:171-226). Values that are not already signals,
        arrays, or sub-dicts are converted with ``tt``; the Bernoulli
        mask is drawn AFTER the parameters (fixed draw order)."""
        from .._hostprof import span

        state = util.random_state(state)

        with span("instantiate"):
            if "signal" in signature(self._instantiate).parameters:
                params = self._instantiate(state, signal=signal)
            else:
                params = self._instantiate(state)

        passthrough = (AudioSignal, jnp.ndarray, dict)
        params = {
            k: (v if isinstance(v, passthrough) else tt(v))
            for k, v in params.items()
        }
        if self.prob >= 1.0:
            # static sentinel: true by construction, survives collate /
            # device_put / jit as pytree structure rather than data
            params["mask"] = util.AlwaysTrue()
        else:
            params["mask"] = tt(bool(state.rand() <= self.prob))
        return {self.name: params}

    def batch_instantiate(self, states: list = None, signal: AudioSignal = None):
        """Instantiate per batch item and collate (parity with reference
        transforms.py:228-265)."""
        return util.collate([self.instantiate(s, signal) for s in states])


class Identity(BaseTransform):
    """Returns the original signal (reference transforms.py:268-271)."""


class SpectralTransform(BaseTransform):
    """Wraps stft/istft around the transform
    (reference transforms.py:274-287)."""

    def transform(self, signal, **kwargs):
        signal.stft()
        out = super().transform(signal, **kwargs)
        out.istft()
        return out


class Compose(BaseTransform):
    """Applies transforms in sequence; children are addressed as
    ``{position}.{name}`` (parity surface with reference
    transforms.py:289-424)."""

    def __init__(self, *transforms: list, name: str = None, prob: float = 1.0):
        if isinstance(transforms[0], list):
            transforms = transforms[0]
        for position, tfm in enumerate(transforms):
            tfm.name = f"{position}.{tfm.name}"
        self.transforms = list(transforms)
        self.transforms_to_apply = [tfm.name for tfm in self.transforms]
        super().__init__(
            keys=list(self.transforms_to_apply), name=name, prob=prob
        )

    @contextmanager
    def filter(self, *names: list):
        """Context manager restricting which named children run
        (parity with reference transforms.py:359-402)."""
        previous = self.transforms_to_apply
        self.transforms_to_apply = names
        try:
            yield
        finally:
            self.transforms_to_apply = previous

    def _transform(self, signal, **kwargs):
        for tfm in self.transforms:
            if any(token in tfm.name for token in self.transforms_to_apply):
                signal = tfm(signal, **kwargs)
        return signal

    def _instantiate(self, state, signal: AudioSignal = None):
        drawn = {}
        for tfm in self.transforms:
            drawn.update(tfm.instantiate(state, signal=signal))
        return drawn

    def __getitem__(self, idx):
        return self.transforms[idx]

    def __len__(self):
        return len(self.transforms)

    def __iter__(self):
        return iter(self.transforms)


class Choose(Compose):
    """Applies exactly one child transform, chosen per item
    (parity with reference transforms.py:427-475)."""

    def __init__(
        self, *transforms: list, weights: list = None, name: str = None,
        prob: float = 1.0):
        super().__init__(*transforms, name=name, prob=prob)

        # _instantiate rewrites child masks into a one-hot selection, so
        # a prob=1.0 child must still honor its (rewritten) mask rather
        # than taking BaseTransform.transform's always-on shortcut.
        for tfm in self.transforms:
            tfm._force_masked = True

        n = len(self.transforms)
        self.weights = (
            np.full(n, 1.0 / n) if weights is None else np.array(weights)
        )

    def _instantiate(self, state, signal: AudioSignal = None):
        kwargs = super()._instantiate(state, signal)
        chosen = state.choice(list(range(len(self.transforms))), p=self.weights)
        one_hot = []
        for position, tfm in enumerate(self.transforms):
            mask = kwargs[tfm.name]["mask"]
            if bool(np.asarray(mask)):
                mask = tt(position == chosen)
                kwargs[tfm.name]["mask"] = mask
            one_hot.append(mask)
        kwargs["one_hot"] = one_hot
        return kwargs


class Repeat(Compose):
    """Applies a transform ``n_repeat`` times (reference
    transforms.py:478-499)."""

    def __init__(
        self, transform, n_repeat: int = 1, name: str = None, prob: float = 1.0
    ):
        super().__init__(
            [copy.copy(transform) for _ in range(n_repeat)],
            name=name, prob=prob,
        )
        self.n_repeat = n_repeat


class RepeatUpTo(Choose):
    """Applies a transform up to ``max_repeat`` times
    (reference transforms.py:502-528)."""

    def __init__(
        self, transform, max_repeat: int = 5, weights: list = None,
        name: str = None, prob: float = 1.0):
        super().__init__(
            [Repeat(transform, n_repeat=n) for n in range(1, max_repeat)],
            name=name, prob=prob, weights=weights,
        )
        self.max_repeat = max_repeat


# ---------------------------------------------------------------------------
# leaf transforms (reference transforms.py:531-1593)
# ---------------------------------------------------------------------------


class ClippingDistortion(BaseTransform):
    """Percentile clipping (reference transforms.py:531-561)."""

    def __init__(
        self, perc: tuple = ("uniform", 0.0, 0.1), name: str = None,
        prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.perc = perc

    def _instantiate(self, state):
        return {"perc": util.sample_from_dist(self.perc, state)}

    def _transform(self, signal, perc):
        return signal.clip_distortion(perc)


class Equalizer(BaseTransform):
    """Mel-spaced EQ curve (reference transforms.py:564-600)."""

    def __init__(
        self, eq_amount: tuple = ("const", 1.0), n_bands: int = 6,
        name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.eq_amount = eq_amount
        self.n_bands = n_bands

    def _draw_eq(self, state: RandomState) -> np.ndarray:
        # draw order: amount first, then the per-band attenuations
        amount = util.sample_from_dist(self.eq_amount, state)
        return (-amount * state.rand(self.n_bands)).astype("float32")

    def _instantiate(self, state):
        return {"eq": self._draw_eq(state)}

    def _transform(self, signal, eq):
        return signal.equalizer(eq)


class Quantization(BaseTransform):
    """Uniform quantization (reference transforms.py:603-633)."""

    def __init__(
        self, channels: tuple = ("choice", [8, 32, 128, 256, 1024]),
        name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.channels = channels

    def _instantiate(self, state):
        return {"channels": util.sample_from_dist(self.channels, state)}

    def _transform(self, signal, channels):
        return signal.quantization(channels)


class MuLawQuantization(BaseTransform):
    """Mu-law quantization (reference transforms.py:636-666)."""

    def __init__(
        self, channels: tuple = ("choice", [8, 32, 128, 256, 1024]),
        name: str = None, prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.channels = channels

    def _instantiate(self, state):
        return {"channels": util.sample_from_dist(self.channels, state)}

    def _transform(self, signal, channels):
        return signal.mulaw_quantization(channels)


class NoiseFloor(BaseTransform):
    """Gaussian noise floor at a given dB (reference transforms.py:669-704)."""

    def __init__(
        self, db: tuple = ("const", -50.0), name: str = None, prob: float = 1.0
    ):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _instantiate(self, state, signal: AudioSignal):
        db = util.sample_from_dist(self.db, state)
        noise = state.randn(signal.num_channels, signal.signal_length)
        nz_signal = AudioSignal(noise.astype("float32"), signal.sample_rate)
        nz_signal.normalize(db)
        return {"nz_signal": nz_signal}

    def _transform(self, signal, nz_signal):
        return signal + nz_signal


class BackgroundNoise(BaseTransform):
    """Mix in background noise drawn from sources
    (parity with reference transforms.py:707-792)."""

    def __init__(
        self, snr: tuple = ("uniform", 10.0, 30.0), sources: List[str] = None,
        weights: List[float] = None, eq_amount: tuple = ("const", 1.0),
        n_bands: int = 3, name: str = None, prob: float = 1.0,
        loudness_cutoff: float = None):
        super().__init__(name=name, prob=prob)
        self.snr = snr
        self.eq_amount = eq_amount
        self.n_bands = n_bands
        self.loader = AudioLoader(sources, weights)
        self.loudness_cutoff = loudness_cutoff

    def _instantiate(self, state, signal: AudioSignal):
        # draw order: eq amount, per-band eq, snr, then the loader's draws
        amount = util.sample_from_dist(self.eq_amount, state)
        eq = (-amount * state.rand(self.n_bands)).astype("float32")
        snr = util.sample_from_dist(self.snr, state)
        loaded = self.loader(
            state, signal.sample_rate, duration=signal.signal_duration,
            loudness_cutoff=self.loudness_cutoff,
            num_channels=signal.num_channels,
        )
        return {"eq": eq, "bg_signal": loaded["signal"], "snr": snr}

    def _transform(self, signal, bg_signal, snr, eq):
        return signal.mix(bg_signal.clone(), snr, eq)


class CrossTalk(BaseTransform):
    """Crosstalk between speakers (parity with reference
    transforms.py:795-854)."""

    def __init__(
        self, snr: tuple = ("uniform", 0.0, 10.0), sources: List[str] = None,
        weights: List[float] = None, name: str = None, prob: float = 1.0,
        loudness_cutoff: float = -40):
        super().__init__(name=name, prob=prob)
        self.snr = snr
        self.loader = AudioLoader(sources, weights)
        self.loudness_cutoff = loudness_cutoff

    def _instantiate(self, state, signal: AudioSignal):
        snr = util.sample_from_dist(self.snr, state)
        loaded = self.loader(
            state, signal.sample_rate, duration=signal.signal_duration,
            loudness_cutoff=self.loudness_cutoff,
            num_channels=signal.num_channels,
        )
        return {"crosstalk_signal": loaded["signal"], "snr": snr}

    def _transform(self, signal, crosstalk_signal, snr):
        # the mix is re-normalized back to the dry signal's loudness
        level = signal.loudness()
        mixed = signal.mix(crosstalk_signal.clone(), snr)
        return mixed.normalize(level)


class RoomImpulseResponse(BaseTransform):
    """Reverb via IR convolution at a target DRR
    (parity with reference transforms.py:857-938)."""

    def __init__(
        self, drr: tuple = ("uniform", 0.0, 30.0), sources: List[str] = None,
        weights: List[float] = None, eq_amount: tuple = ("const", 1.0),
        n_bands: int = 6, name: str = None, prob: float = 1.0,
        use_original_phase: bool = False, offset: float = 0.0,
        duration: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.loader = AudioLoader(sources, weights)
        self.offset, self.duration = offset, duration
        self.drr = drr
        self.eq_amount = eq_amount
        self.n_bands = n_bands
        self.use_original_phase = use_original_phase

    def _instantiate(self, state, signal: AudioSignal = None):
        # draw order: eq amount, per-band eq, drr, then the loader's draws
        amount = util.sample_from_dist(self.eq_amount, state)
        eq = (-amount * state.rand(self.n_bands)).astype("float32")
        drr = util.sample_from_dist(self.drr, state)
        ir_signal = self.loader(
            state, signal.sample_rate, offset=self.offset,
            duration=self.duration, loudness_cutoff=None,
            num_channels=signal.num_channels,
        )["signal"]
        ir_signal.zero_pad_to(signal.sample_rate)
        return {"eq": eq, "ir_signal": ir_signal, "drr": drr}

    def _transform(self, signal, ir_signal, drr, eq):
        return signal.apply_ir(
            ir_signal.clone(), drr, eq,
            use_original_phase=self.use_original_phase,
        )


class VolumeChange(BaseTransform):
    """Volume change in dB (reference transforms.py:941-970)."""

    def __init__(
        self, db: tuple = ("uniform", -12.0, 0.0), name: str = None,
        prob: float = 1.0):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _instantiate(self, state):
        return {"db": util.sample_from_dist(self.db, state)}

    def _transform(self, signal, db):
        return signal.volume_change(db)


class VolumeNorm(BaseTransform):
    """Loudness normalization (reference transforms.py:973-1003)."""

    def __init__(
        self, db: tuple = ("const", -24), name: str = None, prob: float = 1.0
    ):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _instantiate(self, state):
        return {"db": util.sample_from_dist(self.db, state)}

    def _transform(self, signal, db):
        return signal.normalize(db)


class GlobalVolumeNorm(BaseTransform):
    """Normalize using the source file's global loudness from metadata
    (parity with reference transforms.py:1006-1063): the whole file's
    LUFS (a CSV ``loudness`` column ride-along) stands in for the
    excerpt's, so quiet excerpts of loud files stay quiet."""

    def __init__(
        self, db: tuple = ("const", -24), name: str = None, prob: float = 1.0
    ):
        super().__init__(name=name, prob=prob)
        self.db = db

    def _instantiate(self, state, signal: AudioSignal):
        source_db = signal.metadata.get("loudness")
        if source_db is None or float(source_db) == float("-inf"):
            return {"db": 0.0}
        target = util.sample_from_dist(self.db, state)
        return {"db": target - float(source_db)}

    def _transform(self, signal, db):
        return signal.volume_change(db)


class Silence(BaseTransform):
    """Zeros out the signal (reference transforms.py:1066-1092)."""

    def __init__(self, name: str = None, prob: float = 0.1):
        super().__init__(name=name, prob=prob)

    def _transform(self, signal):
        silent = AudioSignal(
            jnp.zeros_like(signal.audio_data),
            sample_rate=signal.sample_rate,
            stft_params=signal.stft_params,
        )
        # keep the pre-silence LUFS on the zeroed signal: downstream
        # snr-relative mixes should dose noise against the original level
        silent._loudness = signal._loudness
        return silent


class LowPass(BaseTransform):
    """Low-pass filter (reference transforms.py:1095-1131)."""

    def __init__(
        self, cutoff: tuple = ("choice", [4000, 8000, 16000]),
        zeros: int = 51, name: str = None, prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.cutoff = cutoff
        self.zeros = zeros
        # the dist tuple's lower bound fixes the longest sinc kernel this
        # transform can need, keeping the jitted kernel support tight
        self._min_cutoff = util.dist_lower_bound(cutoff, default=40.0)

    def _instantiate(self, state):
        return {"cutoff": util.sample_from_dist(self.cutoff, state)}

    def _transform(self, signal, cutoff):
        return signal.low_pass(
            cutoff, zeros=self.zeros, min_cutoff_hz=self._min_cutoff
        )


class HighPass(BaseTransform):
    """High-pass filter (reference transforms.py:1134-1170)."""

    def __init__(
        self, cutoff: tuple = ("choice", [50, 100, 250, 500, 1000]),
        zeros: int = 51, name: str = None, prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.cutoff = cutoff
        self.zeros = zeros
        self._min_cutoff = util.dist_lower_bound(cutoff, default=40.0)

    def _instantiate(self, state):
        return {"cutoff": util.sample_from_dist(self.cutoff, state)}

    def _transform(self, signal, cutoff):
        return signal.high_pass(
            cutoff, zeros=self.zeros, min_cutoff_hz=self._min_cutoff
        )


class RescaleAudio(BaseTransform):
    """Peak-limit to ±val (reference transforms.py:1173-1197)."""

    def __init__(self, val: float = 1.0,
                 name: str = None, prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.val = val

    def _transform(self, signal):
        return signal.ensure_max_of_audio(self.val)


class ShiftPhase(SpectralTransform):
    """Constant phase shift (reference transforms.py:1200-1229)."""

    def __init__(
        self, shift: tuple = ("uniform", -np.pi, np.pi), name: str = None,
        prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.shift = shift

    def _instantiate(self, state):
        return {"shift": util.sample_from_dist(self.shift, state)}

    def _transform(self, signal, shift):
        return signal.shift_phase(shift)


class InvertPhase(ShiftPhase):
    """Phase inversion (reference transforms.py:1232-1247)."""

    def __init__(self, name: str = None, prob: float = 1):
        super().__init__(("const", np.pi), name=name, prob=prob)


class CorruptPhase(SpectralTransform):
    """Random phase corruption (reference transforms.py:1250-1278)."""

    def __init__(
        self, scale: tuple = ("uniform", 0, np.pi), name: str = None,
        prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.scale = scale

    def _instantiate(self, state, signal: AudioSignal = None):
        scale = util.sample_from_dist(self.scale, state)
        corruption = state.normal(scale=scale, size=signal.phase.shape[1:])
        return {"corruption": corruption.astype("float32")}

    def _transform(self, signal, corruption):
        return signal.shift_phase(shift=corruption)


class FrequencyMask(SpectralTransform):
    """SpecAug frequency band mask (parity with reference
    transforms.py:1281-1324)."""

    def __init__(
        self, f_center: tuple = ("uniform", 0.0, 1.0),
        f_width: tuple = ("const", 0.1), name: str = None, prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.f_center = f_center
        self.f_width = f_width

    def _instantiate(self, state, signal: AudioSignal):
        center = util.sample_from_dist(self.f_center, state)
        width = util.sample_from_dist(self.f_width, state)
        nyquist = signal.sample_rate / 2
        return {
            "fmin_hz": nyquist * max(center - width / 2, 0.0),
            "fmax_hz": nyquist * min(center + width / 2, 1.0),
        }

    def _transform(self, signal, fmin_hz: float, fmax_hz: float):
        return signal.mask_frequencies(fmin_hz=fmin_hz, fmax_hz=fmax_hz)


class TimeMask(SpectralTransform):
    """SpecAug time mask (parity with reference transforms.py:1327-1369)."""

    def __init__(
        self, t_center: tuple = ("uniform", 0.0, 1.0),
        t_width: tuple = ("const", 0.025), name: str = None, prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.t_center = t_center
        self.t_width = t_width

    def _instantiate(self, state, signal: AudioSignal):
        center = util.sample_from_dist(self.t_center, state)
        width = util.sample_from_dist(self.t_width, state)
        dur = signal.signal_duration
        return {
            "tmin_s": dur * max(center - width / 2, 0.0),
            "tmax_s": dur * min(center + width / 2, 1.0),
        }

    def _transform(self, signal, tmin_s: float, tmax_s: float):
        return signal.mask_timesteps(tmin_s=tmin_s, tmax_s=tmax_s)


class MaskLowMagnitudes(SpectralTransform):
    """Mask low-magnitude spectrogram cells
    (reference transforms.py:1372-1402)."""

    def __init__(
        self, db_cutoff: tuple = ("uniform", -10, 10), name: str = None,
        prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.db_cutoff = db_cutoff

    def _instantiate(self, state, signal: AudioSignal = None):
        return {"db_cutoff": util.sample_from_dist(self.db_cutoff, state)}

    def _transform(self, signal, db_cutoff: float):
        return signal.mask_low_magnitudes(db_cutoff)


class Smoothing(BaseTransform):
    """Convolve with a smoothing window (parity with reference
    transforms.py:1405-1453): the output is rescaled so its peak matches
    the input's."""

    def __init__(
        self, window_type: tuple = ("const", "average"),
        window_length: tuple = ("choice", [8, 16, 32, 64, 128, 256, 512]),
        name: str = None, prob: float = 1):
        super().__init__(name=name, prob=prob)
        self.window_type = window_type
        self.window_length = window_length

    def _instantiate(self, state, signal: AudioSignal = None):
        window = signal.get_window(
            window_type=util.sample_from_dist(self.window_type, state),
            window_length=util.sample_from_dist(self.window_length, state),
        )
        return {"window": AudioSignal(window, signal.sample_rate)}

    @staticmethod
    def _peak(x):
        peak = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
        return jnp.where(peak == 0.0, 1.0, peak)

    def _transform(self, signal, window):
        in_peak = self._peak(signal.audio_data)
        out = signal.convolve(window)
        return out * (in_peak / self._peak(out.audio_data))


def _draw_bin_noise(state: RandomState, signal: AudioSignal) -> dict:
    """Per-bin magnitude/phase noise planes, drawn at instantiate time
    (draw order: magnitude plane first)."""
    shape = signal.phase.shape[1:]
    return {
        "mag_noise": state.randn(*shape).astype("float32"),
        "phase_noise": state.randn(*shape).astype("float32"),
    }


def _refill_masked_bins(signal, mag_noise, phase_noise):
    """Replace exactly the cells a mask zeroed (mag == 0 AND phase == 0)
    with the pre-drawn noise planes."""
    mag, phase = signal.magnitude, signal.phase
    hole = (mag == 0.0) & (phase == 0.0)
    mag = jnp.where(hole, mag_noise, mag)
    phase = jnp.where(hole, phase_noise, phase)
    signal.stft_data = mag * jnp.exp(1j * phase)
    return signal


class TimeNoise(TimeMask):
    """Replace a time band with noise (reference transforms.py:1456-1495).

    Noise is drawn at instantiate time (seed-deterministic) rather than at
    transform time as the reference does.
    """

    def __init__(
        self, t_center: tuple = ("uniform", 0.0, 1.0),
        t_width: tuple = ("const", 0.025), name: str = None, prob: float = 1):
        super().__init__(
            t_center=t_center, t_width=t_width, name=name, prob=prob
        )

    def _instantiate(self, state, signal: AudioSignal):
        kwargs = super()._instantiate(state, signal)
        kwargs.update(_draw_bin_noise(state, signal))
        return kwargs

    def _transform(self, signal, tmin_s, tmax_s, mag_noise, phase_noise):
        signal = signal.mask_timesteps(tmin_s=tmin_s, tmax_s=tmax_s, val=0.0)
        return _refill_masked_bins(signal, mag_noise, phase_noise)


class FrequencyNoise(FrequencyMask):
    """Replace a frequency band with noise
    (reference transforms.py:1498-1536). Noise drawn at instantiate time."""

    def __init__(
        self, f_center: tuple = ("uniform", 0.0, 1.0),
        f_width: tuple = ("const", 0.1), name: str = None, prob: float = 1):
        super().__init__(
            f_center=f_center, f_width=f_width, name=name, prob=prob
        )

    def _instantiate(self, state, signal: AudioSignal):
        kwargs = super()._instantiate(state, signal)
        kwargs.update(_draw_bin_noise(state, signal))
        return kwargs

    def _transform(self, signal, fmin_hz, fmax_hz, mag_noise, phase_noise):
        signal = signal.mask_frequencies(fmin_hz=fmin_hz, fmax_hz=fmax_hz)
        return _refill_masked_bins(signal, mag_noise, phase_noise)


class SpectralDenoising(Equalizer):
    """Spectral-gate denoising with a random noise signal
    (parity with reference transforms.py:1539-1592)."""

    def __init__(
        self, eq_amount: tuple = ("const", 1.0),
        denoise_amount: tuple = ("uniform", 0.8, 1.0),
        nz_volume: float = -40, n_bands: int = 6, n_freq: int = 3,
        n_time: int = 5, name: str = None, prob: float = 1):
        super().__init__(
            eq_amount=eq_amount, n_bands=n_bands, name=name, prob=prob
        )
        from ..ml import layers as ml_layers

        self.nz_volume = nz_volume
        self.denoise_amount = denoise_amount
        self.spectral_gate = ml_layers.SpectralGate(n_freq, n_time)

    def _instantiate(self, state):
        kwargs = super()._instantiate(state)
        kwargs["denoise_amount"] = util.sample_from_dist(
            self.denoise_amount, state
        )
        kwargs["nz"] = AudioSignal(state.randn(22050).astype("float32"), 44100)
        return kwargs

    def _transform(self, signal, nz, eq, denoise_amount):
        nz = nz.normalize(self.nz_volume).equalizer(eq)
        return self.spectral_gate(signal, nz, denoise_amount)
