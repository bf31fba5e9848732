"""Compact codec artifacts: compress a signal to stored integer codes and
back (the user-facing counterpart of ``DAC.encode``/``decode_from_codes``).

The reference library ships no codec (SURVEY §2), but its ecosystem's
codec (descript-audio-codec) persists compressed audio as code arrays +
metadata; this module provides that workflow for the flagship model:

>>> art = compress(model, params, signal)
>>> save_artifact("clip.dacz", art)
>>> recon = decompress(model, params, load_artifact("clip.dacz"))
"""
import numpy as np

import jax.numpy as jnp

from ..core import AudioSignal

__all__ = ["compress", "decompress", "save_artifact", "load_artifact"]


def compress(model, params, signal, n_quantizers: int = None) -> dict:
    """Encode an :class:`AudioSignal` (or ``(B, 1, T)`` array) into a
    compact artifact dict: uint16 codes + the metadata needed to invert.

    The signal is resampled to the model's rate if needed. Codes are
    ``(B, n_q, T_codes)`` with ``T_codes = ceil(T / hop_length)``.
    """
    if isinstance(signal, AudioSignal):
        sig = signal.clone()
        if sig.sample_rate != model.sample_rate:
            sig = sig.resample(model.sample_rate)
        audio = sig.audio_data
        if audio.shape[1] > 1:
            audio = jnp.mean(audio, axis=1, keepdims=True)
    else:
        audio = jnp.asarray(signal)

    n_samples = int(audio.shape[-1])
    _, codes = model.apply(
        params, audio, n_quantizers, method=type(model).encode
    )
    if n_quantizers is not None:
        codes = codes[:, :n_quantizers]
    assert model.codebook_size <= 65536, "codes do not fit in uint16"
    return {
        "codes": np.asarray(codes).astype(np.uint16),
        "sample_rate": int(model.sample_rate),
        "n_samples": n_samples,
        "n_codebooks": int(codes.shape[1]),
        "codebook_size": int(model.codebook_size),
    }


def decompress(model, params, artifact: dict) -> AudioSignal:
    """Invert :func:`compress`: artifact codes -> :class:`AudioSignal`
    trimmed to the original sample count."""
    if int(model.sample_rate) != int(artifact["sample_rate"]):
        raise ValueError(
            f"artifact was produced at {artifact['sample_rate']} Hz, "
            f"model runs at {model.sample_rate} Hz"
        )
    codes = jnp.asarray(np.asarray(artifact["codes"]).astype(np.int32))
    wav = model.apply(params, codes, method=type(model).decode_from_codes)
    wav = wav[..., : int(artifact["n_samples"])]
    return AudioSignal(wav, int(artifact["sample_rate"]))


def save_artifact(path: str, artifact: dict) -> str:
    """Persist an artifact with ``np.savez_compressed``."""
    np.savez_compressed(path, **artifact)
    return path


def load_artifact(path: str) -> dict:
    """Load an artifact saved by :func:`save_artifact`."""
    with np.load(path) as z:
        return {k: (z[k] if z[k].ndim else z[k].item()) for k in z.files}
