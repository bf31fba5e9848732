"""AudioSignal: the core batched audio container, as a JAX pytree.

Mirror of `/root/reference/audiotools/core/audio_signal.py`, redesigned
TPU-first:

* ``audio_data`` is always a ``(batch, channels, time)`` jnp array
  (reference audio_signal.py:913-921); ``stft_data`` (complex, (B,C,F,T))
  and the cached ``_loudness`` are optional leaves.
* The class is registered as a pytree, so AudioSignals flow through
  ``jax.jit`` / ``vmap`` / ``grad`` directly; static attributes
  (sample_rate, stft_params, lengths) are aux data, and host-side metadata
  rides along in a hash-stable box that never triggers recompilation.
* Methods keep the reference's fluent, in-place-returning API. Outside jit
  this behaves exactly like the reference; inside jit each traced call
  operates on a fresh unflattened wrapper, so purity is preserved.
"""
import copy
import functools
import hashlib
import pathlib
import tempfile
import typing
import warnings
from collections import namedtuple
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from . import util
from ._dsp import DSPMixin
from ._effects import EffectMixin, ImpulseResponseMixin
from .display import DisplayMixin
from .ffmpeg import FFMPEGMixin
from .loudness import LoudnessMixin
from .playback import PlayMixin
from .whisper import WhisperMixin
from ..ops import fft as _fft
from ..ops import resample as _resample

STFTParams = namedtuple(
    "STFTParams",
    ["window_length", "hop_length", "window_type", "match_stride", "padding_type"],
)
"""STFT parameter container (reference audio_signal.py:28-50). Unspecified
fields are inferred from the signal."""
STFTParams.__new__.__defaults__ = (None, None, None, None, None)


class _MetaBox:
    """Hash-stable wrapper for host metadata living in pytree aux data.

    Metadata never affects traced computation, so two signals differing
    only in metadata must map to the same jit cache entry.
    """

    __slots__ = ("value",)

    def __init__(self, value):
        self.value = value

    def __hash__(self):
        return 0

    def __eq__(self, other):
        return isinstance(other, _MetaBox)


class AudioSignal(
    EffectMixin, LoudnessMixin, PlayMixin, ImpulseResponseMixin,
    DSPMixin, DisplayMixin, FFMPEGMixin, WhisperMixin,
):
    """The core object of this library (reference audio_signal.py:53-120).

    Examples
    --------
    >>> signal = AudioSignal(jnp.zeros(5*44100), 44100)
    >>> signal = AudioSignal("audio.wav", offset=1.0, duration=5.0)
    >>> signal.low_pass(8000).normalize(-24).stft()
    """

    # valid-frame count stashed by stft(mesh=...) for istft(mesh=...);
    # class-level default so clones/unflattened instances read None
    _stft_valid_frames = None

    def __init__(
        self, audio_path_or_array, sample_rate: int = None,
        stft_params: STFTParams = None, offset: float = 0,
        duration: float = None, device: str = None,
    ):
        source = audio_path_or_array
        self.path_to_file = None
        self._audio_data = None
        self._stft_data = None
        self._loudness = None
        self.sources = None
        self.original_signal_length = None

        if isinstance(source, (list, tuple)):
            source = np.asarray(source)
        elif hasattr(source, "numpy") and not isinstance(
            source, (np.ndarray, jnp.ndarray)
        ):  # torch tensor interop
            source = source.detach().cpu().numpy()

        if isinstance(source, (str, pathlib.Path)):
            self.load_from_file(
                source, offset=offset, duration=duration, device=device
            )
        elif isinstance(source, (np.ndarray, jnp.ndarray)):
            assert sample_rate is not None, (
                "sample_rate is required when constructing from an array"
            )
            self.load_from_array(source, sample_rate, device=device)
        else:
            raise ValueError(
                "Cannot build an AudioSignal from "
                f"{type(audio_path_or_array).__name__}: expected a path "
                "(str/Path), a numpy/jax array, or a list/tuple of samples."
            )

        self.stft_params = stft_params

        self.metadata = {
            "offset": offset,
            "duration": duration,
        }

    # ------------------------------------------------------------------
    # pytree protocol
    # ------------------------------------------------------------------

    def tree_flatten(self):
        leaves = []
        mask = []
        for attr in ("_audio_data", "_stft_data", "_loudness"):
            v = getattr(self, attr)
            present = v is not None
            mask.append(present)
            if present:
                leaves.append(v)
        aux = (
            tuple(mask),
            self.sample_rate,
            self.stft_params,
            self.original_signal_length,
            # windowing bookkeeping set by collect_windows: static ints
            # derived from shapes, so they belong in aux (a change means
            # different downstream shapes — retracing is correct) and
            # must survive a jit boundary for overlap_and_add to work
            (
                self._original_batch_size,
                self._original_num_channels,
                self._padded_signal_length,
            ),
            _MetaBox(
                {
                    "metadata": self.metadata,
                    "path_to_file": self.path_to_file,
                    "sources": self.sources,
                }
            ),
        )
        return tuple(leaves), aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        mask, sample_rate, stft_params, original_signal_length, win, box = aux
        obj = cls.__new__(cls)
        it = iter(leaves)
        for attr, present in zip(("_audio_data", "_stft_data", "_loudness"), mask):
            setattr(obj, attr, next(it) if present else None)
        obj.sample_rate = sample_rate
        obj._stft_params = stft_params
        obj.original_signal_length = original_signal_length
        (
            obj._original_batch_size,
            obj._original_num_channels,
            obj._padded_signal_length,
        ) = win
        obj.metadata = box.value.get("metadata", {})
        obj.path_to_file = box.value.get("path_to_file")
        obj.sources = box.value.get("sources")
        return obj

    # ------------------------------------------------------------------
    # constructors (reference audio_signal.py:179-470)
    # ------------------------------------------------------------------

    @property
    def path_to_input_file(self):
        """Alias of ``path_to_file`` (reference audio_signal.py:169-177)."""
        return self.path_to_file

    @classmethod
    def excerpt(cls, audio_path, offset=None, duration=None, state=None, **kwargs):
        """Random excerpt of ``duration`` seconds
        (reference audio_signal.py:179-225): the start offset is drawn
        uniformly from [offset or 0, file_duration - duration]."""
        total = util.info(audio_path).duration
        state = util.random_state(state)
        offset = state.uniform(offset or 0, max(total - duration, 0))

        signal = cls(audio_path, offset=offset, duration=duration, **kwargs)
        signal.metadata.update(offset=offset, duration=duration)
        return signal

    @classmethod
    def salient_excerpt(
        cls, audio_path, loudness_cutoff=None, num_tries=8, state=None, **kwargs
    ):
        """Excerpt whose loudness is above a cutoff
        (reference audio_signal.py:227-286)."""
        state = util.random_state(state)
        if loudness_cutoff is None:
            excerpt = cls.excerpt(audio_path, state=state, **kwargs)
        else:
            from ..ops.loudness import host_loudness

            # scipy/numpy meter: this path runs in dataloader workers on
            # host, where the jittable meter is ~150x slower
            # (profilers/profile_load.py); numerics match to ~4e-6.
            # Try 1 is metered alone (the common case: one draw, one
            # meter call, identical state consumption to the sequential
            # loop). Only if it misses the cutoff are the REMAINING
            # candidates drawn up front and metered in ONE batched call
            # — num_tries-1 candidates cost one lfilter pass instead of
            # up to num_tries-1 (reference profiles salient_excerpt as
            # the dominant loader cost, profilers/profile_load.py:62-74).
            excerpt = cls.excerpt(audio_path, state=state, **kwargs)
            loudness = host_loudness(
                np.asarray(excerpt.audio_data), excerpt.sample_rate,
                dtype=np.float32,  # 1.7x; 0.004 mdB vs float64
            )
            # num_tries=None reproduces the reference's unbounded retry
            # loop (audio_signal.py:227-286): batches of 7 until a pass.
            while np.asarray(loudness).max() <= loudness_cutoff:
                n_rest = 7 if num_tries is None else max(int(num_tries) - 1, 0)
                if n_rest == 0:
                    break
                cands = [
                    cls.excerpt(audio_path, state=state, **kwargs)
                    for _ in range(n_rest)
                ]
                stack = np.concatenate(
                    [np.asarray(c.audio_data) for c in cands], axis=0
                )
                louds = np.atleast_1d(
                    np.asarray(host_loudness(
                        stack, cands[0].sample_rate, dtype=np.float32
                    ))
                )
                passing = np.flatnonzero(louds > loudness_cutoff)
                pick = int(passing[0]) if passing.size else n_rest - 1
                excerpt, loudness = cands[pick], louds[pick]
                if num_tries is not None:
                    break
            # cache, as LoudnessMixin.loudness would (loudness.py:314-318)
            excerpt._loudness = np.asarray(loudness, dtype=np.float32)
        return excerpt

    @classmethod
    def zeros(cls, duration, sample_rate, num_channels=1, batch_size=1, **kwargs):
        """All-zero AudioSignal (reference audio_signal.py:288-324).

        Host-backed (numpy): ``zeros`` feeds the data path (silent tracks
        in aligned multitrack loading), which must not touch the device."""
        n_samples = int(duration * sample_rate)
        return cls(
            np.zeros((batch_size, num_channels, n_samples), dtype=np.float32),
            sample_rate,
            **kwargs,
        )

    @classmethod
    def wave(
        cls, frequency, duration, sample_rate, num_channels=1, shape="sine", **kwargs
    ):
        """Waveform generator (reference audio_signal.py:326-378)."""
        import scipy.signal as sps

        t = np.linspace(0, duration, int(duration * sample_rate))

        def triangle(phase):
            # folding with abs() halves the period, so drive sawtooth at
            # pi*f instead of 2*pi*f to land on the requested frequency
            return 1.0 - 2.0 * np.abs(sps.sawtooth(phase / 2, 0.5))

        generators = {
            "sawtooth": lambda ph: sps.sawtooth(ph, 0.5),
            "square": sps.square,
            "sine": np.sin,
            "triangle": triangle,
        }
        if shape not in generators:
            raise ValueError(f"Invalid shape {shape}")
        wave_data = generators[shape](2 * np.pi * frequency * t)

        wave_data = np.tile(
            wave_data.astype(np.float32)[None, None, :], (1, num_channels, 1)
        )
        return cls(wave_data, sample_rate, **kwargs)

    @classmethod
    def batch(
        cls, audio_signals: list, pad_signals: bool = False,
        truncate_signals: bool = False, resample: bool = False, dim: int = 0,
    ):
        """Batch a list of AudioSignals (reference audio_signal.py:380-470):
        mixed sample rates / lengths must be explicitly reconciled via
        ``resample`` / ``pad_signals`` / ``truncate_signals``."""
        rates = {x.sample_rate for x in audio_signals}
        if len(rates) > 1:
            if not resample:
                raise RuntimeError(
                    f"Cannot batch signals with mixed sample rates "
                    f"{sorted(rates)}; pass resample=True to unify them."
                )
            for x in audio_signals:
                x.resample(audio_signals[0].sample_rate)

        lengths = [x.signal_length for x in audio_signals]
        if len(set(lengths)) > 1:
            if pad_signals:
                target = max(lengths)
                for x in audio_signals:
                    x.zero_pad(0, target - x.signal_length)
            elif truncate_signals:
                target = min(lengths)
                for x in audio_signals:
                    x.truncate_samples(target)
            else:
                raise RuntimeError(
                    f"Cannot batch signals of differing lengths "
                    f"{lengths}; pass pad_signals=True or "
                    f"truncate_signals=True to reconcile them."
                )

        # keep host-backed batches on host: one numpy concat beats B eager
        # device concats, and the batch crosses to HBM once, in prepare_batch
        xp = (
            np
            if all(isinstance(x.audio_data, np.ndarray) for x in audio_signals)
            else jnp
        )
        stacked = cls(
            xp.concatenate([x.audio_data for x in audio_signals], axis=dim),
            sample_rate=audio_signals[0].sample_rate,
        )
        stacked.path_to_file = [x.path_to_file for x in audio_signals]
        return stacked

    # ------------------------------------------------------------------
    # I/O (reference audio_signal.py:472-605)
    # ------------------------------------------------------------------

    def load_from_file(self, audio_path, offset, duration, device=None):
        """Load from file via the native host decoder
        (reference audio_signal.py:473-524)."""
        from ..io import load_audio

        data, sample_rate = load_audio(audio_path, offset=offset, duration=duration)
        if data.shape[-1] == 0:
            raise RuntimeError(
                f"Audio file {audio_path} with offset {offset} and "
                f"duration {duration} is empty!"
            )
        # stay numpy: file-loaded signals are host-side until an explicit
        # device_put / jit boundary (one transfer per BATCH, not per item)
        data = np.asarray(data, dtype=np.float32)
        if data.ndim < 2:
            data = data[None, :]
        if data.ndim < 3:
            data = data[None, ...]
        self.audio_data = data

        self.original_signal_length = self.signal_length
        self.sample_rate = sample_rate
        self.path_to_file = audio_path
        return self.to(device)

    def load_from_array(self, audio_array, sample_rate, device=None):
        """Load from an array, reshaping to (B, C, T)
        (reference audio_signal.py:526-564). numpy input stays
        numpy-backed (host side); jax input stays on its device."""
        if isinstance(audio_array, np.ndarray):
            audio_data = audio_array
        else:
            audio_data = util.ensure_tensor(audio_array)
        if audio_data.dtype == jnp.float64:
            audio_data = audio_data.astype(jnp.float32)
        if audio_data.ndim < 2:
            audio_data = audio_data[None, :]
        if audio_data.ndim < 3:
            audio_data = audio_data[None, ...]
        self.audio_data = audio_data

        self.original_signal_length = self.signal_length
        self.sample_rate = sample_rate
        return self.to(device)

    def write(self, audio_path, subtype: str = "PCM_16"):
        """Write the first batch item to disk
        (reference audio_signal.py:566-605)."""
        from ..io import save_audio

        data = np.asarray(self.audio_data[0])
        if np.abs(data).max() > 1:
            warnings.warn("Audio amplitude > 1 clipped when saving")
        save_audio(str(audio_path), data, self.sample_rate, subtype=subtype)
        self.path_to_file = audio_path
        return self

    def copy(self):
        """Shallow copy (reference audio_signal.py:617-625)."""
        return copy.copy(self)

    def deepcopy(self):
        """Deep copy (reference audio_signal.py:607-615)."""
        return copy.deepcopy(self)

    def clone(self):
        """Copy with fresh array references (reference audio_signal.py:627-652)."""
        clone = type(self)(
            self.audio_data,
            self.sample_rate,
            stft_params=self.stft_params,
        )
        if self.stft_data is not None:
            clone.stft_data = self.stft_data
        if self._loudness is not None:
            clone._loudness = self._loudness
        clone.path_to_file = copy.deepcopy(self.path_to_file)
        clone.metadata = copy.deepcopy(self.metadata)
        clone.original_signal_length = self.original_signal_length
        return clone

    def detach(self):
        """Stop gradients on all tensors (reference audio_signal.py:654-671)."""
        if self._loudness is not None:
            self._loudness = jax.lax.stop_gradient(self._loudness)
        if self.stft_data is not None:
            self._stft_data = jax.lax.stop_gradient(self.stft_data)
        self._audio_data = jax.lax.stop_gradient(self.audio_data)
        return self

    def hash(self):
        """Content hash of the audio (reference audio_signal.py:673-701)."""
        with tempfile.NamedTemporaryFile(suffix=".wav") as f:
            self.write(f.name)
            h = hashlib.sha256()
            b = bytearray(128 * 1024)
            mv = memoryview(b)
            with open(f.name, "rb", buffering=0) as g:
                for n in iter(lambda: g.readinto(mv), 0):
                    h.update(mv[:n])
            file_hash = h.hexdigest()
        return file_hash

    # ------------------------------------------------------------------
    # signal ops (reference audio_signal.py:703-890)
    # ------------------------------------------------------------------

    def to_mono(self):
        """Mean over channels (reference audio_signal.py:704-714)."""
        self.audio_data = self.audio_data.mean(axis=1, keepdims=True)
        return self

    def resample(self, sample_rate: int, mesh=None, axis_name: str = "sp"):
        """Sinc-interpolation resampling (reference audio_signal.py:716-736).

        ``mesh``: a ``jax.sharding.Mesh`` routes through the
        sequence-parallel polyphase resampler
        (``parallel.timeshard.sharded_resample``) for audio time-sharded
        over ``mesh[axis_name]`` (docs/tutorials/long_signals.md).
        """
        if sample_rate == self.sample_rate:
            return self
        if mesh is not None:
            from ..parallel.timeshard import sharded_resample

            self.audio_data = sharded_resample(
                self.audio_data,
                self.sample_rate,
                sample_rate,
                mesh,
                axis_name=axis_name,
            )
        else:
            self.audio_data = _resample.resample(
                self.audio_data, self.sample_rate, sample_rate
            )
        self.sample_rate = sample_rate
        return self

    def to(self, device=None):
        """Move all arrays to a jax device or sharding
        (reference audio_signal.py:739-759)."""
        if device is None or (isinstance(device, str) and device in ("cpu", "cuda")):
            # string devices are accepted for reference compat; arrays stay
            # wherever jax's default placement puts them.
            return self
        if self._loudness is not None:
            self._loudness = jax.device_put(self._loudness, device)
        if self._stft_data is not None:
            self._stft_data = jax.device_put(self._stft_data, device)
        if self._audio_data is not None:
            self._audio_data = jax.device_put(self._audio_data, device)
        return self

    def float(self):
        """Cast audio to float32 (reference audio_signal.py:761-769)."""
        self.audio_data = self.audio_data.astype(jnp.float32)
        return self

    def quantize_wire(self, dtype: str = "int16"):
        """Quantize audio for the host->device wire (data/loader.py):
        symmetric ``round(x*32768)`` into int16 — half the transfer
        bytes, error <= 1.5e-5. Keeps the cached loudness (quantization
        noise is ~91 dB down). Pair with :meth:`dequantize_wire`."""
        if dtype != "int16":
            raise ValueError(f"unsupported wire dtype {dtype!r}")
        x = self.audio_data
        xp = np if isinstance(x, np.ndarray) else jnp
        self._audio_data = xp.clip(
            xp.round(x * 32768.0), -32768, 32767
        ).astype(xp.int16)
        return self

    def dequantize_wire(self):
        """Invert :meth:`quantize_wire` (no-op on float audio). The dtype
        test is static under trace, so calling this first inside a jitted
        step folds dequantization into the step's program — no extra
        dispatch."""
        if self.audio_data.dtype == jnp.int16:
            self._audio_data = self.audio_data.astype(jnp.float32) / 32768.0
        return self

    def cpu(self):
        return self.to("cpu")

    def cuda(self):  # compat no-op
        return self.to("cuda")

    def numpy(self):
        """Audio data as a numpy array (reference audio_signal.py:789-797)."""
        return np.asarray(jax.lax.stop_gradient(self.audio_data))

    def zero_pad(self, before: int, after: int):
        """Zero pad along time (reference audio_signal.py:799-815)."""
        xp = np if isinstance(self.audio_data, np.ndarray) else jnp
        self.audio_data = xp.pad(
            self.audio_data, ((0, 0), (0, 0), (before, after))
        )
        return self

    def zero_pad_to(self, length: int, mode: str = "after"):
        """Pad to a target length (reference audio_signal.py:817-837)."""
        shortfall = max(length - self.signal_length, 0)
        if mode == "before":
            self.zero_pad(shortfall, 0)
        elif mode == "after":
            self.zero_pad(0, shortfall)
        return self

    def trim(self, before: int, after: int):
        """Trim samples off both ends (reference audio_signal.py:839-858)."""
        stop = self.signal_length - after
        self.audio_data = self.audio_data[..., before:stop]
        return self

    def truncate_samples(self, length_in_samples: int):
        """Truncate to a length (reference audio_signal.py:860-874)."""
        self.audio_data = self.audio_data[..., :length_in_samples]
        return self

    @property
    def device(self):
        """Device of the underlying arrays (reference audio_signal.py:876-889)."""
        v = self._audio_data if self._audio_data is not None else self._stft_data
        try:
            return next(iter(v.devices()))
        except Exception:
            return None

    # ------------------------------------------------------------------
    # properties (reference audio_signal.py:891-1006)
    # ------------------------------------------------------------------

    @property
    def audio_data(self):
        """(B, C, T) audio samples (reference audio_signal.py:892-921)."""
        return self._audio_data

    @audio_data.setter
    def audio_data(self, data):
        if data is not None:
            # numpy arrays are kept as-is: the host data path (file decode,
            # salient excerpt, collate) stays numpy-backed so it never pays
            # per-item device round trips (the tunneled TPU charges ~ms per
            # transfer); any jnp op converts lazily at the device boundary.
            if not isinstance(data, (jnp.ndarray, np.ndarray)):
                data = jnp.asarray(data)
            assert data.ndim == 3, "audio_data should be 3-dim (B, C, T)"
        self._audio_data = data
        # new samples invalidate the cached LUFS measurement
        self._loudness = None

    samples = audio_data

    @property
    def stft_data(self):
        """(B, C, F, T) complex spectrogram (reference audio_signal.py:926-945)."""
        return self._stft_data

    @stft_data.setter
    def stft_data(self, data):
        if data is not None:
            if not isinstance(data, jnp.ndarray):
                data = jnp.asarray(data)
            assert jnp.iscomplexobj(data), "stft_data must be complex"
            if self._stft_data is not None and self._stft_data.shape != data.shape:
                warnings.warn("stft_data changed shape")
        self._stft_data = data

    @property
    def shape(self):
        return self.audio_data.shape

    @property
    def batch_size(self):
        return self.shape[0]

    @property
    def num_channels(self):
        return self.shape[1]

    @property
    def signal_length(self):
        return self.shape[-1]

    @property
    def signal_duration(self):
        return self.signal_length / self.sample_rate

    # reference aliases (audio_signal.py:958-1006)
    length = signal_length
    duration = signal_duration

    # ------------------------------------------------------------------
    # STFT (reference audio_signal.py:1008-1516)
    # ------------------------------------------------------------------

    @staticmethod
    def get_window(window_type: str, window_length: int, device=None):
        """Window array (reference audio_signal.py:1009-1039)."""
        return jnp.asarray(_fft.get_window(window_type, window_length))

    @property
    def stft_params(self):
        """STFT parameters, with unspecified fields inferred
        (reference audio_signal.py:1041-1087)."""
        return self._stft_params

    @stft_params.setter
    def stft_params(self, value: STFTParams):
        default_win_len = _fft.default_win_length(self.sample_rate)
        default_stft_params = STFTParams(
            window_length=default_win_len,
            hop_length=default_win_len // 4,
            window_type="hann",
            match_stride=False,
            padding_type="reflect",
        )._asdict()

        value = value._asdict() if value else default_stft_params

        for key in default_stft_params:
            if value[key] is None:
                value[key] = default_stft_params[key]

        self._stft_params = STFTParams(**value)
        self._stft_data = None

    def compute_stft_padding(
        self, window_length: int, hop_length: int, match_stride: bool
    ):
        """(right_pad, pad) for the STFT (reference audio_signal.py:1089-1121)."""
        return _fft.compute_stft_padding(
            self.signal_length, window_length, hop_length, match_stride
        )

    def _fill_stft_args(self, window_length, hop_length, window_type,
                        match_stride, padding_type=None):
        """Resolve unspecified STFT arguments from ``self.stft_params``."""
        p = self.stft_params
        return (
            p.window_length if window_length is None else int(window_length),
            p.hop_length if hop_length is None else int(hop_length),
            p.window_type if window_type is None else window_type,
            p.match_stride if match_stride is None else match_stride,
            p.padding_type if padding_type is None else padding_type,
        )

    def stft(
        self, window_length: int = None, hop_length: int = None,
        window_type: str = None, match_stride: bool = None,
        padding_type: str = None, method: str = "fft",
        mesh=None, axis_name: str = "sp",
    ):
        """Compute and cache the STFT (reference audio_signal.py:1123-1212).

        ``method="matmul"`` evaluates the windowed DFT as MXU matmuls —
        ~1.5x faster than the VPU FFT on TPU at ~1e-5 relative accuracy
        (hardware-measured); the spectral losses default to it.

        ``mesh``: a ``jax.sharding.Mesh`` routes through the
        sequence-parallel STFT (``parallel.timeshard.sharded_stft``) for
        audio time-sharded over ``mesh[axis_name]`` — frames come back
        sharded along the frame axis, padded to a per-device-uniform
        count with the valid count stashed for ``istft(mesh=...)``
        (requires ``match_stride=False``, reflect padding; see
        docs/tutorials/long_signals.md).
        """
        (window_length, hop_length, window_type, match_stride,
         padding_type) = self._fill_stft_args(
            window_length, hop_length, window_type, match_stride, padding_type
        )

        if mesh is not None:
            if match_stride:
                raise ValueError(
                    "the sequence-parallel STFT implements "
                    "match_stride=False (torch.stft center=True) only"
                )
            if padding_type not in (None, "reflect"):
                raise ValueError(
                    "the sequence-parallel STFT implements reflect "
                    f"center padding only, got {padding_type!r}"
                )
            from ..parallel.timeshard import sharded_stft

            nb, nch, nt = self.audio_data.shape
            spec, n_valid = sharded_stft(
                self.audio_data.reshape(nb * nch, nt),
                window_length,
                hop_length,
                mesh,
                window_type=window_type,
                axis_name=axis_name,
                method=method,
            )
            self._stft_data = spec.reshape(
                nb, nch, spec.shape[-2], spec.shape[-1]
            )
            self._stft_valid_frames = n_valid
            return self._stft_data

        stft_data = _fft.stft(
            self.audio_data,
            window_length,
            hop_length,
            window_type,
            match_stride,
            padding_type,
            method,
        )
        self._stft_data = stft_data
        self._stft_valid_frames = None
        return stft_data

    def istft(
        self, window_length: int = None, hop_length: int = None,
        window_type: str = None, match_stride: bool = None,
        length: int = None, mesh=None, axis_name: str = "sp",
    ):
        """Inverse STFT into ``audio_data`` (reference audio_signal.py:1214-1296).

        ``mesh``: inverts a spectrogram produced by ``stft(mesh=...)``
        via the sequence-parallel OLA (``timeshard.sharded_istft``),
        using the valid-frame count that call stashed; the audio comes
        back time-sharded (docs/tutorials/long_signals.md).
        """
        if self.stft_data is None:
            raise RuntimeError("Cannot do inverse STFT without self.stft_data!")

        window_length, hop_length, window_type, match_stride, _ = (
            self._fill_stft_args(
                window_length, hop_length, window_type, match_stride
            )
        )

        if mesh is not None:
            if match_stride:
                raise ValueError(
                    "the sequence-parallel ISTFT implements "
                    "match_stride=False only"
                )
            from ..parallel.timeshard import sharded_istft

            nb, nch, nf, nt = self.stft_data.shape
            audio = sharded_istft(
                self.stft_data.reshape(nb * nch, nf, nt),
                window_length,
                hop_length,
                mesh,
                window_type=window_type,
                axis_name=axis_name,
                n_valid=self._stft_valid_frames,
            )
            audio = audio.reshape(nb, nch, audio.shape[-1])
            if length is not None:
                audio = audio[..., :length]
            self.audio_data = audio
            return self

        original_length = None
        if length is None:
            original_length = self.original_signal_length

        audio_data = _fft.istft(
            self.stft_data,
            window_length,
            hop_length,
            window_type,
            match_stride,
            length=length,
            original_length=original_length,
        )
        self.audio_data = audio_data
        return self

    @staticmethod
    def get_mel_filters(sr, n_fft, n_mels, fmin=0.0, fmax=None):
        """Mel filterbank matrix (reference audio_signal.py:1298-1331)."""
        return jnp.asarray(_fft.mel_filters(sr, n_fft, n_mels, fmin, fmax))

    def mel_spectrogram(self, n_mels=80, mel_fmin=0.0, mel_fmax=None, **kwargs):
        """Mel spectrogram (B, C, n_mels, T) (reference audio_signal.py:1333-1369)."""
        stft = self.stft(**kwargs)
        magnitude = jnp.abs(stft)

        n_fft = 2 * (magnitude.shape[2] - 1)
        mel_basis = self.get_mel_filters(
            self.sample_rate, n_fft, n_mels, fmin=mel_fmin, fmax=mel_fmax
        )
        mel = jnp.einsum(
            "bcft,mf->bcmt",
            magnitude,
            mel_basis,
            precision=jax.lax.Precision.HIGHEST,
        )
        return mel

    @staticmethod
    def get_dct(n_mfcc, n_mels, norm="ortho", device=None):
        """DCT matrix (reference audio_signal.py:1371-1396)."""
        return jnp.asarray(_fft.dct_matrix(n_mfcc, n_mels, norm))

    def mfcc(self, n_mfcc=40, n_mels=80, log_offset=1e-6, **kwargs):
        """MFCCs (B, C, n_mfcc, T) (reference audio_signal.py:1398-1426)."""
        mel = self.mel_spectrogram(n_mels, **kwargs)
        mel = jnp.log(mel + log_offset)
        dct_mat = self.get_dct(n_mfcc, n_mels, "ortho")
        out = jnp.einsum(
            "bcmt,mk->bckt", mel, dct_mat, precision=jax.lax.Precision.HIGHEST
        )
        return out

    @property
    def magnitude(self):
        """|STFT| (computes stft if needed; reference audio_signal.py:1428-1450)."""
        if self.stft_data is None:
            self.stft()
        return jnp.abs(self.stft_data)

    @magnitude.setter
    def magnitude(self, value):
        self.stft_data = value * jnp.exp(1j * self.phase)

    def log_magnitude(self, ref_value=1.0, amin=1e-5, top_db=80.0):
        """Log-magnitude in dB (reference audio_signal.py:1457-1487)."""
        return _fft.log_magnitude(self.magnitude, ref_value, amin, top_db)

    @property
    def phase(self):
        """STFT phase (reference audio_signal.py:1489-1511)."""
        if self.stft_data is None:
            self.stft()
        return jnp.angle(self.stft_data)

    @phase.setter
    def phase(self, value):
        self.stft_data = self.magnitude * jnp.exp(1j * value)

    # ------------------------------------------------------------------
    # operators (reference audio_signal.py:1518-1550)
    # ------------------------------------------------------------------

    def __add__(self, other):
        new_signal = self.clone()
        new_signal.audio_data = new_signal.audio_data + util._get_value(other)
        return new_signal

    def __iadd__(self, other):
        self.audio_data = self.audio_data + util._get_value(other)
        return self

    def __radd__(self, other):
        return self + other

    def __sub__(self, other):
        new_signal = self.clone()
        new_signal.audio_data = new_signal.audio_data - util._get_value(other)
        return new_signal

    def __isub__(self, other):
        self.audio_data = self.audio_data - util._get_value(other)
        return self

    def __mul__(self, other):
        new_signal = self.clone()
        new_signal.audio_data = new_signal.audio_data * util._get_value(other)
        return new_signal

    def __imul__(self, other):
        self.audio_data = self.audio_data * util._get_value(other)
        return self

    def __rmul__(self, other):
        return self * other

    # ------------------------------------------------------------------
    # representation (reference audio_signal.py:1552-1618)
    # ------------------------------------------------------------------

    def _info(self):
        """(key, value) description rows shared by markdown/str/rich
        reprs; row set and wording match the reference
        (audio_signal.py:1552-1566)."""
        dur = (
            f"{self.signal_duration:0.3f}"
            if self.signal_duration else "[unknown]"
        )
        return {
            "duration": f"{dur} seconds",
            "batch_size": self.batch_size,
            "path": self.path_to_file or "path unknown",
            "sample_rate": self.sample_rate,
            "num_channels": self.num_channels or "[unknown]",
            "audio_data.shape": self.audio_data.shape,
            "stft_params": self.stft_params,
            "device": self.device,
        }

    def markdown(self):
        """Markdown table representation (reference audio_signal.py:1568-1597)."""
        rows = "".join(f"| {k} | {v} |\n" for k, v in self._info().items())
        return "| Key | Value \n|---|--- \n" + rows

    def __str__(self):
        return "".join(f"{k}: {v}\n" for k, v in self._info().items())

    def __rich__(self):
        from rich.table import Table

        table = Table(title=f"{self.__class__.__name__}")
        table.add_column("Key", style="green")
        table.add_column("Value", style="cyan")
        for key, value in self._info().items():
            table.add_row(key, str(value))
        return table

    # ------------------------------------------------------------------
    # comparison & indexing (reference audio_signal.py:1620-1683)
    # ------------------------------------------------------------------

    def __eq__(self, other):
        def host(a):
            # complex device arrays can't cross the axon tunnel in one
            # piece (UNIMPLEMENTED) — fetch real/imag planes separately
            if jnp.iscomplexobj(a):
                return np.asarray(a.real) + 1j * np.asarray(a.imag)
            return np.asarray(a)

        for k, v in list(self.__dict__.items()):
            if isinstance(v, (jnp.ndarray, np.ndarray)):
                ov = other.__dict__[k]
                if ov is None or not np.allclose(host(v), host(ov), atol=1e-6):
                    max_error = (
                        float("inf")
                        if ov is None
                        else np.abs(host(v) - host(ov)).max()
                    )
                    print(f"Max abs error for {k}: {max_error}")
                    return False
        return True

    def __ne__(self, other):
        return not self == other

    def __getitem__(self, key):
        if isinstance(key, list):
            key = np.asarray(key)
        if (
            isinstance(key, (np.ndarray, jnp.ndarray))
            and getattr(key, "ndim", None) == 0
            and bool(key) is True
        ):
            assert self.batch_size == 1
            audio_data = self.audio_data
            _loudness = self._loudness
            stft_data = self.stft_data
        elif isinstance(key, (bool, int, list, slice, tuple)) or (
            isinstance(key, (np.ndarray, jnp.ndarray)) and key.ndim <= 1
        ):
            # Indexing on the batch dimension; co-index stft/loudness.
            audio_data = self.audio_data[key]
            _loudness = self._loudness[key] if self._loudness is not None else None
            stft_data = self.stft_data[key] if self.stft_data is not None else None
        else:
            raise ValueError(f"Unsupported key type: {type(key)}")

        if isinstance(audio_data, (jnp.ndarray, np.ndarray)):
            while audio_data.ndim < 3:
                audio_data = audio_data[None, ...]

        copy_ = type(self)(audio_data, self.sample_rate, stft_params=self.stft_params)
        copy_._loudness = _loudness
        copy_._stft_data = stft_data
        copy_.sources = None
        copy_.original_signal_length = self.original_signal_length
        return copy_

    def __setitem__(self, key, value):
        # Functional update: jnp arrays are immutable, so we rebuild the
        # leaves with `.at[key].set`. Boolean-mask keys work outside jit;
        # inside jit use `AudioSignal.where`.
        if isinstance(key, list):
            key = np.asarray(key)

        def _assign(dst, src):
            # functional update on either backing: numpy copies + assigns,
            # jnp rebuilds via .at[] (immutable)
            if isinstance(dst, np.ndarray):
                out = dst.copy()
                out[key] = np.asarray(src)
                return out
            return dst.at[key].set(src)

        if not isinstance(value, type(self)):
            self._audio_data = _assign(self.audio_data, value)
            return

        if (
            isinstance(key, (np.ndarray, jnp.ndarray))
            and getattr(key, "ndim", None) == 0
            and bool(key) is True
        ):
            assert self.batch_size == 1
            self._audio_data = value.audio_data
            self._loudness = value._loudness
            self._stft_data = value.stft_data
            return

        elif isinstance(key, (bool, int, list, slice, tuple)) or (
            isinstance(key, (np.ndarray, jnp.ndarray)) and key.ndim <= 1
        ):

            def _set(dst, src):
                return _assign(dst, src.reshape(dst[key].shape))

            if self.audio_data is not None and value.audio_data is not None:
                self._audio_data = _set(self.audio_data, value.audio_data)
            if self._loudness is not None and value._loudness is not None:
                self._loudness = _set(self._loudness, value._loudness)
            if self.stft_data is not None and value.stft_data is not None:
                self._stft_data = _set(self.stft_data, value.stft_data)
            return

    @classmethod
    def where(cls, mask, if_true: "AudioSignal", if_false: "AudioSignal"):
        """Per-item select between two signals (jit-safe replacement for
        boolean-mask assignment; the TPU-idiomatic form of the reference's
        ``signal[mask] = transformed`` pattern, transforms.py:158-164)."""
        mask = jnp.asarray(mask).reshape(-1)

        def sel(ndim):
            return mask.reshape((-1,) + (1,) * (ndim - 1))

        out = if_true.clone()
        out.audio_data = jnp.where(
            sel(if_true.audio_data.ndim), if_true.audio_data, if_false.audio_data
        )
        if if_true._stft_data is not None and if_false._stft_data is not None:
            if if_true._stft_data.shape == if_false._stft_data.shape:
                out._stft_data = jnp.where(
                    sel(if_true._stft_data.ndim),
                    if_true._stft_data,
                    if_false._stft_data,
                )
            else:
                # shapes disagree: a per-item select is impossible and
                # keeping if_true's cache would misrepresent the mix
                out._stft_data = None
        else:
            out._stft_data = None
        if if_true._loudness is not None and if_false._loudness is not None:
            out._loudness = jnp.where(mask, if_true._loudness, if_false._loudness)
        else:
            out._loudness = None
        return out


jax.tree_util.register_pytree_node(
    AudioSignal, AudioSignal.tree_flatten, AudioSignal.tree_unflatten
)
