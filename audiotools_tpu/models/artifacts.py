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

import jax
import jax.numpy as jnp

from ..core import AudioSignal

__all__ = ["compress", "decompress", "save_artifact", "load_artifact"]


def compress(
    model,
    params,
    signal,
    n_quantizers: int = None,
    streaming: bool = False,
    chunk_frames: int = 128,
) -> dict:
    """Encode an :class:`AudioSignal` (or ``(B, 1, T)`` array) into a
    compact artifact dict: uint16 codes + the metadata needed to invert.

    The signal is resampled to the model's rate if needed. Codes are
    ``(B, n_q, T_codes)`` with ``T_codes = ceil(T / hop_length)``.

    ``streaming=True`` encodes through fixed-shape overlap-save windows
    (``models/streaming.py``): identical codes, O(``chunk_frames``)
    device memory — use for inputs too long to encode in one program.
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

    if model.codebook_size > 65536:
        raise ValueError(
            f"codebook_size {model.codebook_size} does not fit in the "
            "uint16 artifact format"
        )
    n_samples = int(audio.shape[-1])
    if streaming:
        from .streaming import stream_encode

        codes = stream_encode(
            model, params, np.asarray(audio),
            chunk_frames=chunk_frames, n_quantizers=n_quantizers,
        )
    else:
        # DAC.encode runs encoder + quantizer only (no decoder), and the
        # apply is jitted: one compiled program instead of hundreds of
        # eager dispatches (each of which is seconds over a tunnel).
        encode = jax.jit(
            lambda p, a: model.apply(
                p, a, n_quantizers, method=type(model).encode
            )
        )
        _, codes = encode(params, audio)
    return {
        "codes": np.asarray(codes).astype(np.uint16),
        "sample_rate": int(model.sample_rate),
        "n_samples": n_samples,
        "n_codebooks": int(codes.shape[1]),
        "codebook_size": int(model.codebook_size),
    }


def decompress(
    model,
    params,
    artifact: dict,
    streaming: bool = False,
    chunk_frames: int = 128,
) -> AudioSignal:
    """Invert :func:`compress`: artifact codes -> :class:`AudioSignal`
    trimmed to the original sample count. ``streaming=True`` decodes
    through fixed-shape windows (identical audio, bounded memory)."""
    if int(model.sample_rate) != int(artifact["sample_rate"]):
        raise ValueError(
            f"artifact was produced at {artifact['sample_rate']} Hz, "
            f"model runs at {model.sample_rate} Hz"
        )
    # Model-mismatch guards: jnp.take CLAMPS out-of-range code indices
    # instead of erroring, and from_codes drops extra cascade stages —
    # both would decode a mismatched artifact to silently wrong audio.
    if int(artifact.get("codebook_size", model.codebook_size)) != int(
        model.codebook_size
    ):
        raise ValueError(
            f"artifact codebook_size {artifact['codebook_size']} != model "
            f"codebook_size {model.codebook_size}"
        )
    n_q = int(np.asarray(artifact["codes"]).shape[1])
    if n_q > int(model.n_codebooks):
        raise ValueError(
            f"artifact has {n_q} codebook stages, model has only "
            f"{model.n_codebooks}"
        )
    codes_np = np.asarray(artifact["codes"]).astype(np.int32)
    if streaming:
        from .streaming import stream_decode

        wav = stream_decode(model, params, codes_np, chunk_frames=chunk_frames)
    else:
        decode = jax.jit(
            lambda p, c: model.apply(
                p, c, method=type(model).decode_from_codes
            )
        )
        wav = decode(params, jnp.asarray(codes_np))
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
