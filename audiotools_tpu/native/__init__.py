"""Native (C++) runtime components.

``libatwavio`` — the WAV decode engine with a multithreaded batch reader —
is compiled on demand with the system toolchain and bound via ctypes. The
pure-Python codec (``audiotools_tpu.io.wav``) is the fallback when no
compiler is available, so the package works either way; the native path
removes Python from the dataloader's decode hot loop.
"""
import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_HERE = Path(__file__).parent
_LIB_PATH = _HERE / "libatwavio.so"
_SRC = _HERE / "wavio.cpp"

_lock = threading.Lock()
_lib = None
_tried = False


def _build_library() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-funroll-loops",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        str(_SRC),
        "-o",
        str(_LIB_PATH),
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired):
        return False


def get_library():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build_library():
                return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None

        lib.at_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.at_wav_info.restype = ctypes.c_int
        lib.at_wav_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.at_wav_read.restype = ctypes.c_int64
        lib.at_wav_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.at_wav_read_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return get_library() is not None


def wav_info(path):
    """(sample_rate, num_frames, channels) via the native parser."""
    lib = get_library()
    if lib is None:
        raise RuntimeError("native wavio unavailable")
    sr = ctypes.c_int32()
    frames = ctypes.c_int64()
    ch = ctypes.c_int32()
    rc = lib.at_wav_info(str(path).encode(), ctypes.byref(sr), ctypes.byref(frames), ctypes.byref(ch))
    if rc != 0:
        raise ValueError(f"could not parse WAV: {path}")
    return sr.value, frames.value, ch.value


def read_wav(path, offset: float = 0.0, duration: float = None):
    """Native seeked decode -> ((C, T) float32, sample_rate)."""
    sr, total, ch = wav_info(path)
    start = int(round(offset * sr)) if offset else 0
    start = min(max(start, 0), total)
    if duration is None:
        count = total - start
    else:
        count = min(int(round(duration * sr)), total - start)
    # a negative count must never reach the C side: at_wav_read treats
    # n_frames < 0 as read-to-end and would decode into the 0-byte buffer
    count = max(count, 0)
    out = np.empty((ch, count), dtype=np.float32)
    got = 0
    if count:
        lib = get_library()
        got = lib.at_wav_read(
            str(path).encode(),
            start,
            count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ch,
        )
        if got < 0:
            raise ValueError(f"native decode failed for {path}")
    return out[:, :got], sr


def _run_batch(batch_fn, paths, starts, counts, outs, chans, n_threads):
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_starts = (ctypes.c_int64 * n)(*starts)
    c_counts = (ctypes.c_int64 * n)(*counts)
    c_chans = (ctypes.c_int32 * n)(*chans)
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for o in outs]
    )
    rc = batch_fn(c_paths, n, c_starts, c_counts, c_outs, c_chans, n_threads)
    if rc != 0:
        raise ValueError(f"native batch decode failed at item {-rc - 1}")


def read_batch(paths, offsets, durations, n_threads: int = 0):
    """Decode a batch of excerpts in parallel (C threads, no GIL).

    Dispatches per extension: WAV through the wavio batch decoder, FLAC
    through the flacio one (mixed batches fine). Returns a list of
    (C, T) float32 arrays, zero-padded to the requested duration, plus
    the list of sample rates.
    """
    n = len(paths)
    suffixes = [Path(str(p)).suffix.lower() for p in paths]
    infos = []
    for p, sfx in zip(paths, suffixes):
        if sfx == ".flac":
            sr, total, ch, _bits = flac_info(p)
            infos.append((sr, total, ch))
        else:
            infos.append(wav_info(p))
    starts, counts, outs, chans = [], [], [], []
    for (sr, total, ch), off, dur in zip(infos, offsets, durations):
        start = min(max(int(round(off * sr)), 0), total)
        count = max(int(round(dur * sr)), 0)
        starts.append(start)
        counts.append(count)
        chans.append(ch)
        # no zero fill: the C side pads short reads itself
        outs.append(np.empty((ch, count), dtype=np.float32))

    groups = {}
    for i, sfx in enumerate(suffixes):
        groups.setdefault(".flac" if sfx == ".flac" else ".wav", []).append(i)
    for sfx, idxs in groups.items():
        if sfx == ".flac":
            lib = get_flac_library()
            if lib is None:
                raise RuntimeError("native FLAC codec unavailable")
            fn = lib.at_flac_read_batch
        else:
            lib = get_library()
            if lib is None:
                raise RuntimeError("native wavio unavailable")
            fn = lib.at_wav_read_batch
        _run_batch(
            fn,
            [paths[i] for i in idxs],
            [starts[i] for i in idxs],
            [counts[i] for i in idxs],
            [outs[i] for i in idxs],
            [chans[i] for i in idxs],
            n_threads,
        )
    return outs, [i[0] for i in infos]


# ---------------------------------------------------------------------------
# FLAC codec (flacio.cpp -> libatflac.so) — spec implementation, since the
# environment has neither libFLAC nor ffmpeg (the reference decodes FLAC
# through librosa/soundfile, audio_signal.py:499-507).
# ---------------------------------------------------------------------------

_FLAC_LIB_PATH = _HERE / "libatflac.so"
_FLAC_SRC = _HERE / "flacio.cpp"
_flac_lib = None
_flac_tried = False


def _build_flac() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_FLAC_SRC), "-o", str(_FLAC_LIB_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def get_flac_library():
    """Load (building if needed) the native FLAC codec, or None."""
    global _flac_lib, _flac_tried
    with _lock:
        if _flac_lib is not None or _flac_tried:
            return _flac_lib
        _flac_tried = True
        if (
            not _FLAC_LIB_PATH.exists()
            or _FLAC_LIB_PATH.stat().st_mtime < _FLAC_SRC.stat().st_mtime
        ):
            if not _build_flac():
                return None
        try:
            lib = ctypes.CDLL(str(_FLAC_LIB_PATH))
        except OSError:
            return None
        lib.at_flac_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.at_flac_info.restype = ctypes.c_int
        lib.at_flac_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int32,
        ]
        lib.at_flac_read.restype = ctypes.c_int64
        lib.at_flac_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int32,
        ]
        lib.at_flac_write.restype = ctypes.c_int
        lib.at_flac_read_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32,
        ]
        lib.at_flac_read_batch.restype = ctypes.c_int
        _flac_lib = lib
        return _flac_lib


def flac_available() -> bool:
    return get_flac_library() is not None


def flac_info(path):
    """(sample_rate, num_frames, channels, bits) from STREAMINFO."""
    lib = get_flac_library()
    if lib is None:
        raise RuntimeError("native FLAC codec unavailable")
    sr = ctypes.c_int32()
    frames = ctypes.c_int64()
    ch = ctypes.c_int32()
    bits = ctypes.c_int32()
    rc = lib.at_flac_info(
        str(path).encode(), ctypes.byref(sr), ctypes.byref(frames),
        ctypes.byref(ch), ctypes.byref(bits),
    )
    if rc != 0:
        raise ValueError(f"could not parse FLAC: {path}")
    return sr.value, frames.value, ch.value, bits.value


def read_flac(path, offset: float = 0.0, duration: float = None):
    """Decode a FLAC file -> ((C, T) float32 in [-1, 1], sample_rate)."""
    sr, total, ch, _bits = flac_info(path)
    start = min(int(round(offset * sr)), total) if offset else 0
    if duration is None:
        count = total - start
    else:
        count = min(int(round(duration * sr)), total - start)
    count = max(count, 0)
    out = np.zeros((ch, count), dtype=np.float32)
    if count:
        lib = get_flac_library()
        got = lib.at_flac_read(
            str(path).encode(), start, count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), ch,
        )
        if got < 0:
            raise ValueError(f"FLAC decode failed for {path}")
    return out, sr


def write_flac(path, data, sample_rate: int, bits: int = 16):
    """Encode ``(C, T)`` float audio (in [-1, 1]) to a FLAC file."""
    lib = get_flac_library()
    if lib is None:
        raise RuntimeError("native FLAC codec unavailable")
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 1:
        data = data[None, :]
    C, T = data.shape
    scale = float(1 << (bits - 1))
    q = np.clip(np.rint(data * scale), -scale, scale - 1).astype(np.int32)
    q = np.ascontiguousarray(q)
    rc = lib.at_flac_write(
        str(path).encode(),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        T, C, int(sample_rate), int(bits),
    )
    if rc != 0:
        raise ValueError(f"FLAC encode failed for {path}")
    return path


# ---------------------------------------------------------------------------
# libav container decode (avio.cpp -> libatavio.so) — mp4/m4a/webm/mkv/
# aac/opus/... via the system libavformat/libavcodec shared libraries
# (present on most hosts even without the ffmpeg binary; the reference
# reaches these formats through an ffmpeg subprocess,
# reference core/ffmpeg.py:149-211).
# ---------------------------------------------------------------------------

_AV_LIB_PATH = _HERE / "libatavio.so"
_AV_SRC = _HERE / "avio.cpp"
_av_lib = None
_av_tried = False


def _build_av() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_AV_SRC), "-o", str(_AV_LIB_PATH),
        "-lavformat", "-lavcodec", "-lavutil",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired):
        return False


def get_av_library():
    """Load (building if needed) the libav shim, or None when either the
    compiler or the libav shared libraries are absent."""
    global _av_lib, _av_tried
    with _lock:
        if _av_lib is not None or _av_tried:
            return _av_lib
        _av_tried = True
        if (
            not _AV_LIB_PATH.exists()
            or _AV_LIB_PATH.stat().st_mtime < _AV_SRC.stat().st_mtime
        ):
            if not _build_av():
                return None
        try:
            lib = ctypes.CDLL(str(_AV_LIB_PATH))
        except OSError:
            return None
        lib.at_av_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_char_p,
            ctypes.c_int32,
        ]
        lib.at_av_info.restype = ctypes.c_int
        lib.at_av_read.argtypes = [
            ctypes.c_char_p,
            ctypes.c_double,
            ctypes.c_double,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.at_av_read.restype = ctypes.c_int64
        lib.at_av_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
        lib.at_av_free.restype = None
        lib.at_av_write.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.c_int64,
        ]
        lib.at_av_write.restype = ctypes.c_int
        _av_lib = lib
        return _av_lib


def av_available() -> bool:
    return get_av_library() is not None


def av_info(path):
    """(sample_rate, num_frames, channels, codec_name) of the best audio
    stream in any libav-readable container (frame count from the
    container duration — authoritative only post-decode)."""
    lib = get_av_library()
    if lib is None:
        raise RuntimeError("libav shim unavailable")
    sr = ctypes.c_int32()
    frames = ctypes.c_int64()
    ch = ctypes.c_int32()
    codec = ctypes.create_string_buffer(32)
    rc = lib.at_av_info(
        str(path).encode(), ctypes.byref(sr), ctypes.byref(frames),
        ctypes.byref(ch), codec, len(codec),
    )
    if rc != 0:
        raise ValueError(f"libav could not open an audio stream in: {path}")
    return sr.value, frames.value, ch.value, codec.value.decode()


def read_av(path, offset: float = 0.0, duration: float = None):
    """Decode any libav-readable container -> ((C, T) float32, rate).

    No resampling/remixing happens here — the stream's own rate and
    channel count come back; rate conversion is the package's polyphase
    resampler's job (on device).
    """
    lib = get_av_library()
    if lib is None:
        raise RuntimeError("libav shim unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    ch = ctypes.c_int32()
    sr = ctypes.c_int32()
    n = lib.at_av_read(
        str(path).encode(),
        float(offset or 0.0),
        -1.0 if duration is None else float(duration),
        ctypes.byref(out), ctypes.byref(ch), ctypes.byref(sr),
    )
    if n < 0:
        raise ValueError(f"libav decode failed ({n}) for: {path}")
    try:
        if n == 0:
            data = np.zeros((ch.value or 1, 0), dtype=np.float32)
        else:
            flat = np.ctypeslib.as_array(out, shape=(int(n) * ch.value,))
            data = np.ascontiguousarray(
                flat.reshape(int(n), ch.value).T.astype(np.float32)
            )
    finally:
        lib.at_av_free(out)
    return data, sr.value


def write_av(path, data, sample_rate: int, bit_rate: int = 128000):
    """Encode ``(C, T)`` float audio into a container chosen from the
    path's extension, using the container's default audio codec
    (``.m4a``/``.mp4`` -> AAC via FFmpeg's native encoder)."""
    lib = get_av_library()
    if lib is None:
        raise RuntimeError("libav shim unavailable")
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 1:
        data = data[None, :]
    C, T = data.shape
    inter = np.ascontiguousarray(data.T.reshape(-1))
    rc = lib.at_av_write(
        str(path).encode(),
        inter.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        T, C, int(sample_rate), int(bit_rate),
    )
    if rc != 0:
        raise ValueError(f"libav encode failed ({rc}) for: {path}")
    return path
