"""Quality metrics (mirror of
`/root/reference/audiotools/metrics/quality.py`).

STOI is implemented natively (the reference wraps ``pystoi``, which is
not available here) in two forms: the host float64 reference loop
(``stoi``, matching the reference's per-item wrapper shape) and a
batched jitted device path (``stoi_device``, see ``ops/stoi.py``) that
the reference has no equivalent of. PESQ runs natively too: a full
P.862-architecture implementation (``_pesq.py``) backs ``pesq`` whenever
the ITU-wrapping ``pesq`` C extension is absent, so the metric works in
any environment (the reference's wrapper simply crashes without the
lib). ViSQOL uses Google's C++ library when installed and otherwise
falls back to an in-package device NSIM backend (``ops/nsim.py``) —
ViSQOL's similarity core as one batched jitted program.

Calibration status of the in-package backends
---------------------------------------------

The reference's scores come from the *certified* ITU/Google libraries
(``/root/reference/audiotools/metrics/quality.py:47,88,126``). The
in-package backends reproduce the architectures, not the certified
absolute scales, and warn once per process at call time. Known envelope
from the CI ladder suites (tests/metrics/):

- **STOI** (host and device): fully native but pinned against an
  independent float64 implementation of Taal et al. at 1.2e-7 — treat as
  exact. No warning.
- **PESQ native** (``backend="native"``, ``pesq_device``): P.862
  pipeline with re-derived tables. Guaranteed properties: output range
  [1.0, 5.0]; identical signals > 4.3 (nb > 4.4); strictly monotone on
  AWGN / clipping / quantization ladders; 10 dB SNR scores < 2.5;
  40 dB SNR scores > 3.5. Absolute bias vs the ITU tool is unbounded by
  any test in this environment — expect agreement within a few tenths of
  a MOS point on broadband material, and do not publish absolute MOS
  from this backend without a one-time cross-check against the ITU lib
  (see VALIDATION.md).
- **ViSQOL NSIM** (``backend="nsim"``): raw NSIM is the stable metric
  (identical -> exactly 1.0, strictly monotone on ladders). The
  NSIM->MOS-LQO logistic map is anchored to ViSQOL's published ceiling
  (identical -> ~4.73) and calibrated on noise/codec ladders only; its
  absolute scale is an uncertified estimate.
"""
import os
import warnings

import numpy as np

from ..core import AudioSignal

__all__ = ["stoi", "stoi_device", "pesq", "pesq_device", "visqol"]

# once-per-process flags for the uncertified-scale warnings (the
# WhisperMixin pattern, core/whisper.py): the reference's pesq/visqol
# scores come from the certified ITU/Google libraries
# (/root/reference/audiotools/metrics/quality.py:47,88,126); the
# in-package backends reproduce the *architecture* but not the certified
# absolute scale, and users must see that at call time, not only in docs.
_warned_uncertified = set()


def _warn_uncertified(key: str, message: str):
    if key in _warned_uncertified:
        return
    _warned_uncertified.add(key)
    warnings.warn(message, UserWarning, stacklevel=3)


_PESQ_NATIVE_WARNING = (
    "pesq() is using the in-package P.862-architecture backend, not the "
    "certified ITU `pesq` C extension. Scores are on the right range "
    "(1.0-5.0 MOS-LQO), track degradation ladders monotonically, and sit "
    "within a few tenths of a MOS point of the ITU tool on broadband "
    "material, but the absolute calibration is NOT certified "
    "(re-derived tables; see docs/api/audiotools_tpu_metrics_quality.md). "
    "Install the `pesq` package or pass backend='itu' on a host that has "
    "it for certified numbers."
)

_VISQOL_NSIM_WARNING = (
    "visqol() is using the in-package device NSIM backend, not Google's "
    "ViSQOL C++ library. The NSIM similarity core ranks degradations "
    "like ViSQOL, but the NSIM->MOS-LQO map is an uncertified logistic "
    "fit (the trained SVR/lattice models are unavailable offline; see "
    "docs/api/audiotools_tpu_metrics_quality.md). Install google/visqol "
    "or pass backend='google' on a host that has it for certified "
    "MOS-LQO."
)

# --- native STOI (Taal et al. 2010/2011) -----------------------------------

# single source of truth for the algorithm constants: the host loop here
# is the float64 oracle for the device program, so they must never drift
from ..ops.stoi import (
    BETA as _BETA,
    DYN_RANGE as _DYN_RANGE,
    FS as _FS,
    MINFREQ as _MINFREQ,
    N as _N,
    N_FRAME as _N_FRAME,
    NFFT as _NFFT,
    NUMBAND as _NUMBAND,
)


def _thirdoct(fs, nfft, num_bands, min_freq):
    # shared table with the device path (0/1 selection matrix, so the
    # float32 storage there is exact in float64 math here)
    from ..ops.stoi import thirdoct

    obm, cf = thirdoct(fs, nfft, num_bands, min_freq)
    return obm.astype(np.float64), cf


def _stft_frames(x):
    w = np.hanning(_N_FRAME + 2)[1:-1]
    n = 1 + (len(x) - _N_FRAME) // (_N_FRAME // 2)
    frames = np.stack(
        [x[i * (_N_FRAME // 2) : i * (_N_FRAME // 2) + _N_FRAME] for i in range(n)]
    )
    return np.fft.rfft(frames * w, n=_NFFT)


def _remove_silent(x, y):
    w = np.hanning(_N_FRAME + 2)[1:-1]
    hop = _N_FRAME // 2
    n = 1 + (len(x) - _N_FRAME) // hop
    xf = np.stack([x[i * hop : i * hop + _N_FRAME] * w for i in range(n)])
    yf = np.stack([y[i * hop : i * hop + _N_FRAME] * w for i in range(n)])
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    mask = energies > energies.max() - _DYN_RANGE
    xf, yf = xf[mask], yf[mask]
    # overlap-add back
    out_len = (len(xf) - 1) * hop + _N_FRAME if len(xf) else 0
    xs = np.zeros(out_len)
    ys = np.zeros(out_len)
    for i in range(len(xf)):
        xs[i * hop : i * hop + _N_FRAME] += xf[i]
        ys[i * hop : i * hop + _N_FRAME] += yf[i]
    return xs, ys


def _row_col_normalize(Z):
    """eSTOI's double normalization of a (J, N) segment (Jensen & Taal
    2016 eq. 3-4 / estoi.m): zero-mean/unit-norm each band's row across
    the N frames, THEN each frame's column across the J bands. The final
    column step leaves N unit-norm frame vectors, so the /N in the score
    makes identical signals score exactly 1."""
    Z = Z - Z.mean(axis=1, keepdims=True)
    Z = Z / (np.linalg.norm(Z, axis=1, keepdims=True) + 1e-12)
    Z = Z - Z.mean(axis=0, keepdims=True)
    Z = Z / (np.linalg.norm(Z, axis=0, keepdims=True) + 1e-12)
    return Z


def _stoi_single(x, y, extended=False):
    obm, _ = _thirdoct(_FS, _NFFT, _NUMBAND, _MINFREQ)
    x, y = _remove_silent(x, y)
    if len(x) < _N_FRAME * _N:
        return np.nan
    X = np.sqrt(np.maximum(obm @ (np.abs(_stft_frames(x).T) ** 2), 1e-15))
    Y = np.sqrt(np.maximum(obm @ (np.abs(_stft_frames(y).T) ** 2), 1e-15))

    corrs = []
    for m in range(_N, X.shape[1] + 1):
        Xs = X[:, m - _N : m]
        Ys = Y[:, m - _N : m]
        if extended:
            # eSTOI (Jensen & Taal 2016): doubly-normalized segments,
            # inner products averaged over the N frames (the reference
            # delegates to pystoi's extended branch; its random EPS
            # dither is replaced by deterministic epsilons)
            corrs.append(
                (_row_col_normalize(Xs) * _row_col_normalize(Ys)).sum() / _N
            )
        else:
            alpha = np.linalg.norm(Xs, axis=1, keepdims=True) / (
                np.linalg.norm(Ys, axis=1, keepdims=True) + 1e-12
            )
            aY = Ys * alpha
            aY = np.minimum(aY, Xs * (1 + 10 ** (-_BETA / 20)))
            xm = Xs - Xs.mean(axis=1, keepdims=True)
            ym = aY - aY.mean(axis=1, keepdims=True)
            num = (xm * ym).sum(axis=1)
            den = np.linalg.norm(xm, axis=1) * np.linalg.norm(ym, axis=1) + 1e-12
            corrs.append((num / den).mean())
    return float(np.mean(corrs))


def stoi(
    estimates: AudioSignal,
    references: AudioSignal,
    extended: bool = False,
):
    """Short-term objective intelligibility (reference quality.py:9-61).

    Native implementation of Taal et al.'s STOI; returns one score per
    batch item.
    """
    import jax.numpy as jnp

    estimates = estimates.clone().to_mono().resample(_FS)
    references = references.clone().to_mono().resample(_FS)

    stois = []
    for i in range(estimates.batch_size):
        _stoi = _stoi_single(
            np.asarray(references.audio_data[i, 0], dtype=np.float64),
            np.asarray(estimates.audio_data[i, 0], dtype=np.float64),
            extended=extended,
        )
        stois.append(_stoi)
    return jnp.asarray(np.array(stois))


def stoi_device(
    estimates: AudioSignal,
    references: AudioSignal,
    extended: bool = False,
):
    """Batched STOI as one jitted device program — no per-item host
    loop (the reference's pystoi wrapper, quality.py:9-61, is host-only
    and sequential). Matches ``stoi`` to float32 precision; returns one
    score per batch item."""
    from ..ops import stoi as _ops_stoi

    estimates = estimates.clone().to_mono().resample(_ops_stoi.FS)
    references = references.clone().to_mono().resample(_ops_stoi.FS)
    return _ops_stoi.stoi_batch(
        references.audio_data[:, 0, :],
        estimates.audio_data[:, 0, :],
        extended=extended,
    )


def pesq(
    estimates: AudioSignal,
    references: AudioSignal,
    mode: str = "wb",
    target_sr: float = 16000,
    backend: str = "auto",
):
    """PESQ MOS-LQO (reference quality.py:64-102).

    ``backend``:

    - ``"auto"`` (default): the ITU-wrapping ``pesq`` C extension when
      installed, else the in-package P.862-architecture implementation.
    - ``"itu"``: require the C extension (bit-certified P.862 numbers).
    - ``"native"``: force the in-package implementation
      (:mod:`audiotools_tpu.metrics._pesq`) — same pipeline and output
      range as P.862/P.862.2 but re-derived tables, so scores can differ
      from the ITU tool by a few tenths of a MOS point.

    ``target_sr`` is honored for the ITU backend (it accepts 8 or
    16 kHz for nb); the native backend resamples to each mode's defining
    rate (nb: 8 kHz, wb: 16 kHz).
    """
    import jax.numpy as jnp

    pesq_fn = None
    if backend in ("auto", "itu"):
        try:
            from pesq import pesq as pesq_fn
        except ImportError as e:
            if backend == "itu":
                raise RuntimeError(
                    "backend='itu' requires the `pesq` C extension, which "
                    "is not installed in this environment."
                ) from e
    elif backend != "native":
        raise ValueError(f"backend must be auto/itu/native, got {backend!r}")
    if mode not in ("nb", "wb"):
        raise ValueError(f"mode must be 'nb' or 'wb', got {mode!r}")

    if pesq_fn is None:
        from ._pesq import _MODES, pesq_native

        _warn_uncertified("pesq_native", _PESQ_NATIVE_WARNING)
        target_sr = _MODES[mode].fs

    estimates = estimates.clone().to_mono().resample(target_sr)
    references = references.clone().to_mono().resample(target_sr)

    pesqs = []
    for i in range(estimates.batch_size):
        ref_i = np.asarray(references.audio_data[i, 0], dtype=np.float64)
        est_i = np.asarray(estimates.audio_data[i, 0], dtype=np.float64)
        if pesq_fn is not None:
            _pesq = pesq_fn(estimates.sample_rate, ref_i, est_i, mode)
        else:
            _pesq = pesq_native(ref_i, est_i, int(estimates.sample_rate), mode)
        pesqs.append(_pesq)
    return jnp.asarray(np.array(pesqs))


def pesq_device(
    estimates: AudioSignal,
    references: AudioSignal,
    mode: str = "wb",
):
    """Batched PESQ as one jitted device program — no per-item host loop
    (the reference's ``pesq`` wrapper, quality.py:64-102, is host-only
    and sequential; this repo's ``pesq`` host mirror too). Runs the
    P.862-architecture pipeline of :mod:`audiotools_tpu.metrics._pesq`
    on device (see :mod:`audiotools_tpu.ops.pesq`); matches
    ``pesq(..., backend="native")`` to float32 precision for zero-delay
    pairs. Returns one MOS-LQO estimate per batch item."""
    from ..ops import pesq as _ops_pesq
    from ._pesq import _MODES

    _warn_uncertified("pesq_native", _PESQ_NATIVE_WARNING)
    if mode not in _MODES:
        raise ValueError(f"mode must be 'nb' or 'wb', got {mode!r}")
    target_sr = _MODES[mode].fs
    estimates = estimates.clone().to_mono().resample(target_sr)
    references = references.clone().to_mono().resample(target_sr)
    return _ops_pesq.pesq_batch(
        references.audio_data[:, 0, :],
        estimates.audio_data[:, 0, :],
        mode=mode,
    )


def visqol(
    estimates: AudioSignal,
    references: AudioSignal,
    mode: str = "audio",
    backend: str = "auto",
):
    """ViSQOL MOS-LQO (reference quality.py:105-159).

    ``backend``:

    - ``"auto"`` (default): Google's C++ ViSQOL library when installed,
      else the in-package device NSIM backend.
    - ``"google"``: require the C++ library (certified ViSQOL numbers).
    - ``"nsim"``: force the in-package backend
      (:mod:`audiotools_tpu.ops.nsim`) — ViSQOL's NSIM similarity core
      over gammatone spectrograms as one batched jitted program, mapped
      to the ViSQOL output range by a calibrated monotone curve instead
      of the (offline-unavailable) trained SVR/lattice models. Scores
      rank degradations like ViSQOL but are not certified MOS-LQO.
    """
    import jax.numpy as jnp

    if backend not in ("auto", "google", "nsim"):
        raise ValueError(f"backend must be auto/google/nsim, got {backend!r}")
    if backend in ("auto", "google"):
        try:
            from visqol import visqol_lib_py
            from visqol.pb2 import visqol_config_pb2
        except ImportError as e:
            if backend == "google":
                raise RuntimeError(
                    "backend='google' requires google/visqol, which is not "
                    "installed in this environment."
                ) from e
            backend = "nsim"
        else:
            backend = "google"

    if backend == "nsim":
        from ..ops import nsim as _nsim

        _warn_uncertified("visqol_nsim", _VISQOL_NSIM_WARNING)
        if mode not in _nsim.MODES:
            raise ValueError(f"Unrecognized mode: {mode}")
        target_sr = _nsim.MODES[mode]["fs"]
        estimates = estimates.clone().to_mono().resample(target_sr)
        references = references.clone().to_mono().resample(target_sr)
        scores = _nsim.nsim_batch(
            references.audio_data[:, 0, :],
            estimates.audio_data[:, 0, :],
            mode=mode,
        )
        return _nsim.nsim_to_moslqo(scores)

    # (sample rate, speech scoring flag, bundled SVR model) per mode —
    # values pinned by the ViSQOL library's own configuration
    mode_settings = {
        "audio": (48000, False, "libsvm_nu_svr_model.txt"),
        "speech": (
            16000, True,
            "lattice_tcditugenmeetpackhref_ls2_nl60_lr12_bs2048_"
            "learn.005_ep2400_train1_7_raw.tflite",
        ),
    }
    if mode not in mode_settings:
        raise ValueError(f"Unrecognized mode: {mode}")
    target_sr, speech_scoring, svr_model = mode_settings[mode]

    config = visqol_config_pb2.VisqolConfig()
    config.audio.sample_rate = target_sr
    config.options.use_speech_scoring = speech_scoring
    config.options.svr_model_path = os.path.join(
        os.path.dirname(visqol_lib_py.__file__), "model", svr_model
    )
    api = visqol_lib_py.VisqolApi()
    api.Create(config)

    estimates = estimates.clone().to_mono().resample(target_sr)
    references = references.clone().to_mono().resample(target_sr)

    def measure(i):
        ref = np.asarray(references.audio_data[i, 0]).astype(float)
        est = np.asarray(estimates.audio_data[i, 0]).astype(float)
        return api.Measure(ref, est).moslqo

    scores = [measure(i) for i in range(estimates.batch_size)]
    return jnp.asarray(np.array(scores))
