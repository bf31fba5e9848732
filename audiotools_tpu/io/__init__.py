"""Host-side audio I/O (strictly outside jit).

WAV is decoded natively (`wav.py`), FLAC through the native C++ codec
(`native/flacio.cpp`), MP3/Ogg through system codec libraries
(`codecs.py`). Anything else — mp4/m4a/webm/mkv/aac/opus, including the
audio tracks of video containers — decodes through the in-package libav
shim (`native/avio.cpp`, linking the system libavformat/libavcodec)
when those libraries exist, matching the reach of the reference's
ffmpeg-subprocess path (/root/reference/audiotools/core/ffmpeg.py:149-211)
without requiring the ffmpeg binary.
"""
from pathlib import Path

import numpy as np

from .wav import WavInfo, read_wav, wav_info, write_wav

__all__ = ["load_audio", "save_audio", "audio_info", "WavInfo", "read_wav",
           "wav_info", "write_wav"]


def audio_info(path):
    """File metadata (sample_rate, num_frames, duration) without decoding
    (mp3/ogg require a decode pass for an exact frame count)."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".wav":
        return wav_info(path)
    if suffix == ".flac":
        from .. import native

        sr, frames, ch, bits = native.flac_info(path)
        return WavInfo(
            sample_rate=sr,
            num_frames=frames,
            num_channels=ch,
            bits_per_sample=bits,
            format_tag=0,
            data_offset=0,
            data_size=0,
        )
    if suffix in (".mp3", ".ogg"):
        data, sr = load_audio(path)
        return WavInfo(
            sample_rate=sr,
            num_frames=data.shape[-1],
            num_channels=data.shape[0],
            bits_per_sample=16,
            format_tag=0,
            data_offset=0,
            data_size=0,
        )
    from .. import native

    if native.av_available():
        sr, frames, ch, _codec = native.av_info(path)
        return WavInfo(
            sample_rate=sr,
            num_frames=frames,
            num_channels=ch,
            bits_per_sample=16,
            format_tag=0,
            data_offset=0,
            data_size=0,
        )
    raise ValueError(
        f"Unsupported audio format '{path.suffix}'. "
        "Native support: .wav, .flac, .mp3, .ogg; other containers "
        "need the system libavformat/libavcodec libraries."
    )


def load_audio(path, offset: float = 0.0, duration: float = None):
    """Decode audio as ``(C, T)`` float32 in [-1, 1] plus sample rate.

    Prefers the native C++ decode engine (``audiotools_tpu.native``) and
    falls back to the pure-Python codec.
    """
    from .._hostprof import span

    with span("decode"):
        return _load_audio(path, offset, duration)


def _load_audio(path, offset: float = 0.0, duration: float = None):
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".wav":
        from .. import native

        if native.available():
            try:
                return native.read_wav(path, offset=offset, duration=duration)
            except ValueError:
                pass  # fall through to the Python codec (e.g. mu-law)
        return read_wav(path, offset=offset, duration=duration)
    if suffix == ".flac":
        from .. import native

        return native.read_flac(path, offset=offset, duration=duration)
    if suffix == ".mp3":
        from . import codecs

        return codecs.read_mp3(path, offset=offset, duration=duration)
    if suffix == ".ogg":
        from . import codecs

        return codecs.read_ogg(path, offset=offset, duration=duration)
    from .. import native

    if native.av_available():
        return native.read_av(path, offset=offset, duration=duration)
    raise ValueError(
        f"Unsupported audio format '{path.suffix}'. "
        "Native support: .wav, .flac, .mp3, .ogg; other containers "
        "need the system libavformat/libavcodec libraries."
    )


def save_audio(path, data: np.ndarray, sample_rate: int, subtype: str = "PCM_16"):
    """Encode ``(C, T)`` float audio to disk (WAV, FLAC, MP3, or Ogg/Vorbis)."""
    path = Path(path)
    suffix = path.suffix.lower()
    if suffix == ".wav":
        return write_wav(path, data, sample_rate, subtype=subtype)
    if suffix == ".flac":
        from .. import native

        bits = 24 if subtype == "PCM_24" else 16
        return native.write_flac(path, data, sample_rate, bits=bits)
    if suffix == ".mp3":
        from . import codecs

        return codecs.write_mp3(path, data, sample_rate)
    if suffix == ".ogg":
        from . import codecs

        return codecs.write_ogg(path, data, sample_rate)
    from .. import native

    if native.av_available():
        return native.write_av(path, data, sample_rate)
    raise ValueError(
        f"Unsupported audio format '{path.suffix}'. "
        "Native write support: .wav, .flac, .mp3, .ogg; other containers "
        "need the system libavformat/libavcodec libraries."
    )
