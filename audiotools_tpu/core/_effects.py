"""Effects mixin: mixing, convolution/reverb, loudness ops, EQ,
quantization, codecs, and the Bryan (ICASSP 2020) impulse-response
augmentations.

Mirror of `/root/reference/audiotools/core/effects.py`, fully batched and
jittable. The sox-based ``pitch_shift``/``time_stretch`` (effects.py:247-309,
CPU-only and non-differentiable there) are replaced with an on-device,
differentiable phase vocoder (``ops/stretch.py``).
"""
import jax
import jax.numpy as jnp
import numpy as np

from . import util
from ..ops import filters as _filters
from ..ops.loudness import GAIN_FACTOR


class EffectMixin:
    GAIN_FACTOR = GAIN_FACTOR
    """Amplitude <-> decibel conversion factor."""
    CODEC_PRESETS = {
        "8-bit": {"format": "wav", "encoding": "ULAW", "bits_per_sample": 8},
        "GSM-FR": {"format": "gsm"},
        "MP3": {"format": "mp3", "compression": -9},
        "Vorbis": {"format": "vorbis", "compression": -1},
        "Ogg": {"format": "ogg", "compression": -1},
        "Amr-nb": {"format": "amr-nb"},
    }
    """Codec presets (reference effects.py:14-25). All presets run
    natively here; see ``apply_codec``. Amr-nb runs through this
    package's own ACELP implementation (``io/amrnb.py``)."""

    def mix(self, other, snr=10, other_eq=None):
        """Mix ``other`` into self at the given SNR
        (reference effects.py:27-64)."""
        snr = util.ensure_tensor(snr)

        pad_len = max(0, self.signal_length - other.signal_length)
        other.zero_pad(0, pad_len)
        other.truncate_samples(self.signal_length)
        if other_eq is not None:
            other = other.equalizer(other_eq)

        # The SNR gain needs both loudnesses (self's, and other's after
        # EQ). When neither is cached and the shapes line up, run ONE
        # meter over the stacked batch instead of two: gating is
        # per-item, so the result is bit-identical, and the fixed
        # per-call cost (K-weighting setup, block framing) is paid once.
        if (
            self._loudness is None
            and other._loudness is None
            and other.audio_data.shape == self.audio_data.shape
            and other.sample_rate == self.sample_rate
        ):
            from ..ops import loudness as loudness_ops

            stacked = loudness_ops.loudness(
                jnp.concatenate([self.audio_data, other.audio_data], axis=0),
                self.sample_rate,
            )
            nb = self.audio_data.shape[0]
            self._loudness = stacked[:nb]
            other._loudness = stacked[nb:]

        tgt_loudness = self.loudness() - snr
        other = other.normalize(tgt_loudness)

        self.audio_data = self.audio_data + other.audio_data
        return self

    def convolve(self, other, start_at_max: bool = True):
        """FFT convolution with delta-renormalization
        (reference effects.py:66-123).

        The reference computes a circular convolution of period ``length``
        via ``rfft(n=length)`` after zero-padding the IR to the signal
        (effects.py:105-114). Arbitrary-length FFTs lower to an O(T^2) DFT
        matmul on TPU, so both paths here compute a pow2 *linear* conv and
        fold the tail back mod ``length`` — numerically identical to the
        length-L circular convolution.

        When the IR's static support ``K`` is much shorter than the signal
        (the RoomImpulseResponse case: 1 s IR against a 5 s clip), padding
        it to L would force 2^ceil(log2(2L)) FFTs. Instead the linear conv
        runs against the *unpadded* IR in pow2 overlap-save blocks sized by
        K, and the reference's IR pre-roll (effects.py:92-100) is applied
        to the *output*: a circular shift commutes with circular
        convolution, so rolling the result is sample-exact equal to
        convolving with the rolled IR — and keeps the IR compact.
        """
        length = self.signal_length
        K = other.signal_length
        if K > length:
            other.truncate_samples(length)
            K = length

        ir = other.audio_data  # (B, C_ir, K)

        if start_at_max:
            # Shift so each item's IR peak lands at t=0, like the
            # reference's per-item torch.roll — realized as a roll of the
            # conv *output* below (commutes with circular conv).
            idx = jnp.argmax(jnp.abs(ir), axis=-1)  # (B, C)
            shift = idx.max(axis=1) if idx.ndim > 1 else idx  # (B,)

        n = 1 << (length - 1).bit_length()  # next_pow2(L)
        m = length + K - 1 - n  # samples of the pow2 conv aliased by wrap
        if K < length and 0 < m <= n // 4:
            # Compact-IR aliasing-corrected path (the RoomImpulseResponse
            # case: 1 s IR against a 5 s clip). The pow2-n circular conv
            # wraps the linear conv's last m samples onto its head; those
            # m samples depend only on the last m taps of the IR against
            # the last m samples of the signal, so a tiny auxiliary conv
            # recovers them exactly — one 2^18 FFT instead of 2^19
            # (v5e: 21 ms vs 34 ms for batch-64 x 5 s with a 1 s IR).
            x = self.audio_data
            Y = jnp.fft.irfft(
                jnp.fft.rfft(x, n=n) * jnp.fft.rfft(ir, n=n), n=n
            )
            # lin[n+j] = full(x[-m:], ir[-m:])[m-1+j] for j in [0, m)
            p = 1 << (2 * m - 2).bit_length() if m > 1 else 1
            small = jnp.fft.irfft(
                jnp.fft.rfft(x[..., -m:], n=p) * jnp.fft.rfft(ir[..., -m:], n=p),
                n=p,
            )
            alias = small[..., m - 1 : 2 * m - 1]  # = lin[n : n+m]
            # fold mod L: y[t] = lin[t] + lin[t+L] for t < K-1, where
            # lin[:m] = Y[:m] - alias and lin[L:] = concat(Y[L:n], alias)
            y = Y[..., :length]
            y = y.at[..., :m].add(-alias)
            wrap = jnp.concatenate([Y[..., length:n], alias], axis=-1)
            convolved_audio = y.at[..., : K - 1].add(wrap)
        elif K < length and m <= 0:
            # linear conv already fits in the pow2-n transform
            x = self.audio_data
            lin = jnp.fft.irfft(
                jnp.fft.rfft(x, n=n) * jnp.fft.rfft(ir, n=n), n=n
            )[..., : length + K - 1]
            convolved_audio = lin[..., :length]
            convolved_audio = convolved_audio.at[..., : K - 1].add(
                lin[..., length:]
            )
        else:
            if K < length:
                other.zero_pad(0, length - K)
                ir = other.audio_data
            n2 = 1 << (2 * length - 1).bit_length()
            ir_fft = jnp.fft.rfft(ir, n=n2)
            self_fft = jnp.fft.rfft(self.audio_data, n=n2)
            lin = jnp.fft.irfft(ir_fft * self_fft, n=n2)[..., : 2 * length - 1]
            convolved_audio = lin[..., :length]
            convolved_audio = convolved_audio.at[..., : length - 1].add(
                lin[..., length:]
            )

        if start_at_max:
            doubled = jnp.concatenate([convolved_audio, convolved_audio], axis=-1)

            def roll_one(d, s):
                return jax.lax.dynamic_slice_in_dim(d, s, length, axis=-1)

            convolved_audio = jax.vmap(roll_one)(doubled, shift)

        # The reference rescales by the peak of (delta * ir) — the circular
        # convolution of a unit delta with the rolled IR is the rolled IR
        # itself, so the delta FFT pass collapses to the IR's peak
        # (effects.py:102-119).
        delta_max = jnp.max(jnp.abs(ir), axis=-1, keepdims=True)
        scale = 1 / jnp.maximum(delta_max, 1e-5)
        convolved_audio = convolved_audio * scale

        self.audio_data = convolved_audio
        return self

    def apply_ir(self, ir, drr=None, ir_eq=None, use_original_phase: bool = False):
        """Apply an impulse response, optionally altering DRR and EQ
        (reference effects.py:125-179)."""
        if ir_eq is not None:
            ir = ir.equalizer(ir_eq)
        if drr is not None:
            ir = ir.alter_drr(drr)

        # remember the dry peak so the wet mix can be rescaled to it
        max_spk = jnp.max(jnp.abs(self.audio_data), axis=-1, keepdims=True)

        # The reference computes the phase unconditionally (effects.py:158)
        # but only consumes it under use_original_phase; XLA dead-code
        # eliminates it inside jit, but eager callers would pay a full
        # STFT — compute it only when used.
        phase = self.phase if use_original_phase else None
        self.convolve(ir)

        if use_original_phase:
            self.stft()
            self.stft_data = self.magnitude * jnp.exp(1j * phase)
            self.istft()

        max_transformed = jnp.max(jnp.abs(self.audio_data), axis=-1, keepdims=True)
        scale_factor = jnp.maximum(max_spk, 1e-8) / jnp.maximum(
            max_transformed, 1e-8
        )
        self.audio_data = self.audio_data * scale_factor
        return self

    def ensure_max_of_audio(self, max: float = 1.0):
        """Peak-limit to ±max (reference effects.py:181-198)."""
        peak = jnp.max(jnp.abs(self.audio_data), axis=-1, keepdims=True)
        peak_gain = jnp.where(peak > max, max / jnp.maximum(peak, 1e-12), 1.0)
        self.audio_data = self.audio_data * peak_gain
        return self

    def normalize(self, db=-24.0):
        """Normalize loudness to the target LUFS
        (reference effects.py:200-220)."""
        db = util.ensure_tensor(db)
        ref_db = self.loudness()
        gain = db - ref_db
        gain = jnp.exp(gain * self.GAIN_FACTOR)
        self.audio_data = self.audio_data * gain[:, None, None]
        return self

    def volume_change(self, db):
        """Change volume by db (reference effects.py:222-238)."""
        db = util.ensure_tensor(db, ndim=1)
        gain = jnp.exp(db * self.GAIN_FACTOR)
        self.audio_data = self.audio_data * gain[:, None, None]
        return self

    def pitch_shift(self, n_semitones: float, quick: bool = True):
        """Pitch shift via on-device phase vocoder + resample
        (replaces the reference's sox path, effects.py:247-277; ours is
        batched, TPU-resident, and differentiable)."""
        from ..ops import stretch as _stretch

        self.audio_data = _stretch.pitch_shift(
            self.audio_data, n_semitones, self.sample_rate
        )
        self.stft_data = None
        return self

    def time_stretch(self, factor: float, quick: bool = True):
        """Time stretch via on-device phase vocoder (replaces the
        reference's sox path, effects.py:279-309)."""
        from ..ops import stretch as _stretch

        self.audio_data = _stretch.time_stretch(self.audio_data, factor)
        self.stft_data = None
        return self

    def apply_codec(
        self, preset: str = None, format: str = "wav", encoding: str = None,
        bits_per_sample: int = None, compression: int = None,
    ):
        """Apply an audio codec (reference effects.py:311-384).

        ``wav``/``ULAW``-style presets run natively on device (mu-law
        round-trip at the requested bit depth); compressed formats require
        codec libraries unavailable in this environment and raise.
        """
        if preset is None:
            kwargs = dict(
                format=format, encoding=encoding,
                bits_per_sample=bits_per_sample, compression=compression,
            )
        elif preset in self.CODEC_PRESETS:
            kwargs = dict(self.CODEC_PRESETS[preset])
        else:
            raise ValueError(
                f"Unknown preset: {preset}. "
                f"Known presets: {list(self.CODEC_PRESETS.keys())}"
            )

        fmt = kwargs.get("format", "wav")
        if fmt == "wav":
            if kwargs.get("encoding") == "ULAW":
                bits = kwargs.get("bits_per_sample") or 8
                return self.mulaw_quantization(2**bits)
            bits = kwargs.get("bits_per_sample") or 16
            return self.quantization(2**bits)
        if fmt == "mp3":
            # Real encode/decode round trip through libmp3lame/libmpg123
            # (host-side, per item — as the reference loops compressed
            # formats per item, effects.py:366-376). Not jittable.
            import tempfile

            from ..io import codecs

            if not codecs.mp3_available():
                raise RuntimeError("MP3 codec libraries not available")
            out = []
            T = self.signal_length
            # one device->host transfer for the whole batch (per-item
            # fetches pay one tunneled round trip each)
            host = np.asarray(self.audio_data)
            # sox compression semantics for mp3 (what the reference's
            # torchaudio path forwards, effects.py:366-376): negative =
            # LAME VBR quality -0..-9.999 (integer part, 9 = worst — the
            # "MP3" preset's -9 means heavy artifacts), positive = CBR
            # bitrate in kbps, None = encoder default
            compression = kwargs.get("compression")
            enc_kwargs = {}
            if compression is not None:
                c = float(compression)
                if c < 0:
                    enc_kwargs["vbr_quality"] = min(9, int(-c))
                else:
                    enc_kwargs["bitrate"] = max(8, int(round(c)))
            for i in range(self.batch_size):
                orig = host[i]
                with tempfile.NamedTemporaryFile(suffix=".mp3") as f:
                    codecs.write_mp3(f.name, orig, self.sample_rate, **enc_kwargs)
                    dec, _ = codecs.read_mp3(f.name)
                # lame+mpg123 introduce a codec delay; align by
                # cross-correlation and trim it so the augmentation is
                # time-aligned with the input
                n = 1 << int(np.ceil(np.log2(dec.shape[-1] + T)))
                xc = np.fft.irfft(
                    np.fft.rfft(dec[0], n) * np.conj(np.fft.rfft(orig[0], n)), n
                )
                lag = int(np.argmax(xc[: dec.shape[-1] - T + 1])) if dec.shape[-1] > T else 0
                dec = dec[:, lag:]
                if dec.shape[-1] < T:
                    dec = np.pad(dec, ((0, 0), (0, T - dec.shape[-1])))
                out.append(dec[:, :T])
            self.audio_data = jnp.asarray(np.stack(out))
            return self
        if fmt == "gsm":
            # GSM 06.10 full-rate through libgsm — the same
            # telephone-channel simulation the reference gets from sox's
            # gsm format (effects.py:370-384).
            from ..io import codecs

            if not codecs.gsm_available():
                raise RuntimeError("GSM codec library not available")
            return self._telephone_codec_roundtrip(codecs.gsm_roundtrip)
        if fmt in ("vorbis", "ogg"):
            # Vorbis is granulepos-aligned: the decode is sample-accurate
            # with no codec delay, so no realignment is needed.
            import tempfile

            from ..io import codecs

            if not (codecs.vorbis_encode_available() and codecs.vorbis_available()):
                raise RuntimeError("Vorbis codec libraries not available")
            # The reference maps the preset's `compression` to sox/vorbis
            # VBR quality (effects.py:366-376; presets use -1 = lowest
            # quality, heavy artifacts). libvorbisenc quality is the same
            # scale divided by 10, clamped to its [-0.1, 1.0] range.
            # No preset leaves compression=None in kwargs -> sox default 3.
            compression = kwargs.get("compression")
            if compression is None:
                compression = 3.0
            quality = float(np.clip(compression / 10.0, -0.1, 1.0))
            out = []
            T = self.signal_length
            host = np.asarray(self.audio_data)
            for i in range(self.batch_size):
                orig = host[i]
                with tempfile.NamedTemporaryFile(suffix=".ogg") as f:
                    codecs.write_ogg(f.name, orig, self.sample_rate, quality)
                    dec, _ = codecs.read_ogg(f.name)
                if dec.shape[-1] < T:
                    dec = np.pad(dec, ((0, 0), (0, T - dec.shape[-1])))
                out.append(dec[:, :T])
            self.audio_data = jnp.asarray(np.stack(out))
            return self
        if fmt == "amr-nb":
            # AMR-NB-class ACELP codec, implemented in this package
            # (io/amrnb.py) — the same telephone-channel simulation the
            # reference gets from torchaudio's amr-nb path
            # (effects.py:370-384).
            from ..io import amrnb

            return self._telephone_codec_roundtrip(
                amrnb.amrnb_roundtrip, batch_roundtrip=amrnb.amrnb_roundtrip_batch
            )
        raise RuntimeError(
            f"Codec format '{fmt}' requires external codec libraries that "
            "are not available; native support: wav (PCM/ULAW), mp3, "
            "ogg/vorbis, gsm, amr-nb."
        )

    def _telephone_codec_roundtrip(self, roundtrip, batch_roundtrip=None):
        """Shared scaffolding for 8 kHz mono telephone codecs (GSM-FR,
        AMR-NB): resample down, run the host ``roundtrip`` on a single
        device->host transfer, resample back, and restore the original
        length. A codec that can process the whole (B, C, T) batch in
        one lockstep pass supplies ``batch_roundtrip`` (the in-package
        ACELP coder); C-library codecs (libgsm) stay per-item."""
        orig_sr, T = self.sample_rate, self.signal_length
        self.resample(8000)
        host = np.asarray(self.audio_data)
        if batch_roundtrip is not None:
            out = batch_roundtrip(host)
        else:
            out = np.stack([roundtrip(host[i]) for i in range(self.batch_size)])
        self.audio_data = jnp.asarray(out)
        self.resample(orig_sr)
        if self.signal_length < T:
            self.zero_pad(0, T - self.signal_length)
        self.truncate_samples(T)
        return self

    def mel_filterbank(self, n_bands: int):
        """Split into mel bands, last axis indexes bands
        (reference effects.py:386-403)."""
        return _filters.split_bands(self.audio_data, self.sample_rate, n_bands)

    def equalizer(self, db):
        """Mel-spaced graphic EQ (reference effects.py:405-433)."""
        db = util.ensure_tensor(db)
        if db.ndim == 2 and db.shape[0] not in (1, self.batch_size):
            raise ValueError("EQ batch dim must be 1 or match the signal")
        self.audio_data = _filters.equalizer(
            self.audio_data, db, self.sample_rate
        )
        return self

    def clip_distortion(self, clip_percentile):
        """Percentile clipping (reference effects.py:435-461)."""
        clip_percentile = util.ensure_tensor(clip_percentile, ndim=1)
        clip_percentile = jnp.broadcast_to(
            clip_percentile.reshape(-1), (self.batch_size,)
        )

        def _clip(x, perc):  # x: (C, T)
            lo = jnp.quantile(x, perc / 2, axis=-1, keepdims=True)
            hi = jnp.quantile(x, 1 - perc / 2, axis=-1, keepdims=True)
            return jnp.clip(x, lo, hi)

        self.audio_data = jax.vmap(_clip)(self.audio_data, clip_percentile)
        return self

    def quantization(self, quantization_channels):
        """Uniform quantization with straight-through gradients
        (reference effects.py:463-490)."""
        quantization_channels = util.ensure_tensor(quantization_channels, ndim=3)

        x = self.audio_data
        x = (x + 1) / 2
        x = x * quantization_channels
        x = jnp.floor(x)
        x = x / quantization_channels
        x = 2 * x - 1

        residual = jax.lax.stop_gradient(self.audio_data - x)
        self.audio_data = self.audio_data - residual
        return self

    def mulaw_quantization(self, quantization_channels):
        """Mu-law quantization with straight-through gradients
        (reference effects.py:492-523)."""
        mu = quantization_channels - 1.0
        mu = util.ensure_tensor(mu, ndim=3).astype(jnp.float32)

        x = self.audio_data

        # quantize
        x = jnp.sign(x) * jnp.log1p(mu * jnp.abs(x)) / jnp.log1p(mu)
        x = ((x + 1) / 2 * mu + 0.5).astype(jnp.int32).astype(jnp.float32)

        # unquantize
        x = (x / mu) * 2 - 1.0
        x = jnp.sign(x) * (jnp.exp(jnp.abs(x) * jnp.log1p(mu)) - 1.0) / mu

        residual = jax.lax.stop_gradient(self.audio_data - x)
        self.audio_data = self.audio_data - residual
        return self

    def __matmul__(self, other):
        return self.convolve(other)


class ImpulseResponseMixin:
    """Bryan (ICASSP 2020) IR augmentation: early/late decomposition and
    DRR alteration (reference effects.py:529-647)."""

    def decompose_ir(self):
        """Early response / late field / window decomposition
        (reference effects.py:540-574)."""
        data = self.audio_data
        td = jnp.argmax(data, axis=-1, keepdims=True)
        t0 = int(self.sample_rate * 0.0025)

        idx = jnp.arange(data.shape[-1])[None, None, :]
        early_idx = (idx >= td - t0) & (idx <= td + t0)

        early_response = jnp.where(early_idx, data, 0.0)
        late_field = jnp.where(early_idx, 0.0, data)

        # Windowed direct path: periodic hann over each item's early span
        # (the reference places scipy's periodic hann over the nonzero span
        # per item, effects.py:568-573).
        span = jnp.sum(early_idx, axis=-1, keepdims=True)  # (B, C, 1)
        start = jnp.maximum(td - t0, 0)
        k = idx - start
        hann = 0.5 - 0.5 * jnp.cos(2 * jnp.pi * k / jnp.maximum(span, 1))
        window = jnp.where(early_idx, hann, 0.0)
        return early_response, late_field, window

    def measure_drr(self):
        """Direct-to-reverberant ratio (reference effects.py:576-589)."""
        early_response, late_field, _ = self.decompose_ir()
        num = jnp.sum(early_response**2, axis=-1)
        den = jnp.sum(late_field**2, axis=-1)
        drr = 10 * jnp.log10(num / den)
        return drr

    @staticmethod
    def solve_alpha(early_response, late_field, wd, target_drr):
        """Quadratic solve for the DRR scaling factor
        (reference effects.py:591-615)."""
        wd_sq = wd**2
        wd_sq_1 = (1 - wd) ** 2
        e_sq = early_response**2
        l_sq = late_field**2
        a = jnp.sum(wd_sq * e_sq, axis=-1)
        b = jnp.sum(2 * (1 - wd) * wd * e_sq, axis=-1)
        c = jnp.sum(wd_sq_1 * e_sq, axis=-1) - jnp.power(
            10, target_drr / 10
        ) * jnp.sum(l_sq, axis=-1)

        expr = jnp.sqrt((b**2) - 4 * a * c)
        alpha = jnp.maximum(
            (-b - expr) / (2 * a),
            (-b + expr) / (2 * a),
        )
        return alpha

    def alter_drr(self, drr):
        """Alter the DRR of the impulse response
        (reference effects.py:617-647)."""
        drr = util.ensure_tensor(drr, 2, self.batch_size)

        early_response, late_field, window = self.decompose_ir()
        alpha = self.solve_alpha(early_response, late_field, window, drr)
        min_alpha = jnp.max(jnp.abs(late_field), axis=-1) / jnp.maximum(
            jnp.max(jnp.abs(early_response), axis=-1), 1e-12
        )
        alpha = jnp.maximum(alpha, min_alpha)[..., None]

        # blend: the early response is scaled by alpha inside the window
        # and kept as-is outside it, then the late field is restored
        scaled_early = early_response * (1 + (alpha - 1) * window)
        self.audio_data = scaled_early + late_field
        self.ensure_max_of_audio()
        return self
