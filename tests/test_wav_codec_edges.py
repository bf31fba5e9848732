"""Edge-of-format coverage for the native WAV codec (io/wav.py): G.711
mu-law/A-law decode (pinned against the stdlib ``audioop`` oracle),
u8/f64 PCM, WAVE_FORMAT_EXTENSIBLE, RF64/ds64, malformed headers, and
the writer's less-common subtypes. (Reference behavior: soundfile-based
load/write, `/root/reference/audiotools/core/audio_signal.py:499-507,602`.)
"""
import struct
import warnings

import numpy as np
import pytest

from audiotools_tpu.io import wav as W


def _wav_bytes(tag, bits, payload, sr=8000, nch=1, fmt_size=16, extra=b"",
               data_size=None, riff=b"RIFF", ds64=None):
    fmt_body = struct.pack(
        "<HHIIHH", tag, nch, sr, sr * nch * (bits // 8), nch * (bits // 8), bits
    ) + extra
    chunks = b""
    if ds64 is not None:
        chunks += struct.pack("<4sI", b"ds64", len(ds64)) + ds64
    chunks += struct.pack("<4sI", b"fmt ", len(fmt_body)) + fmt_body
    size = len(payload) if data_size is None else data_size
    chunks += struct.pack("<4sI", b"data", size) + payload
    return (
        struct.pack("<4sI4s", riff, 4 + len(chunks), b"WAVE") + chunks
    )


def _write(tmp_path, blob, name="t.wav"):
    p = tmp_path / name
    p.write_bytes(blob)
    return p


# ---------------------------------------------------------------------------
# G.711 decode vs the stdlib oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("law,tag", [("ulaw", W.WAVE_FORMAT_MULAW),
                                     ("alaw", W.WAVE_FORMAT_ALAW)])
def test_g711_decode_matches_audioop(tmp_path, law, tag):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    codes = bytes(range(256))
    p = _write(tmp_path, _wav_bytes(tag, 8, codes))
    data, sr = W.read_wav(p)
    assert sr == 8000 and data.shape == (1, 256)

    lin = audioop.ulaw2lin(codes, 2) if law == "ulaw" else audioop.alaw2lin(codes, 2)
    want = np.frombuffer(lin, dtype="<i2").astype(np.float32) / 32768.0
    assert np.allclose(data[0], want, atol=1e-6)


def test_u8_and_f64_pcm_roundtrip(tmp_path):
    # u8 PCM: full-scale ramp
    codes = bytes([0, 64, 128, 192, 255])
    p = _write(tmp_path, _wav_bytes(W.WAVE_FORMAT_PCM, 8, codes))
    data, _ = W.read_wav(p)
    assert data[0, 2] == 0.0 and data[0, 0] == -1.0

    # f64 via the writer's DOUBLE subtype, read back exactly
    x = np.linspace(-0.9, 0.9, 17, dtype=np.float32)[None]
    p2 = tmp_path / "d.wav"
    W.write_wav(p2, x, 44100, subtype="DOUBLE")
    got, sr = W.read_wav(p2)
    assert sr == 44100
    assert np.allclose(got, x, atol=1e-7)


def test_mono_1d_write_and_duration(tmp_path):
    x = np.zeros(8000, dtype=np.float32)  # 1-D input branch
    p = tmp_path / "m.wav"
    W.write_wav(p, x, 8000)
    info = W.wav_info(p)
    assert info.num_channels == 1
    assert info.duration == pytest.approx(1.0)


def test_extensible_wrapper(tmp_path):
    # EXTENSIBLE wrapping IEEE float32: cbSize=22, GUID's first two bytes
    # carry the real tag
    samples = np.array([0.25, -0.5], dtype="<f4").tobytes()
    extra = struct.pack("<HHI", 22, 32, 0x4) + struct.pack(
        "<H", W.WAVE_FORMAT_IEEE_FLOAT
    ) + b"\x00" * 14
    blob = _wav_bytes(W.WAVE_FORMAT_EXTENSIBLE, 32, samples, fmt_size=40,
                      extra=extra)
    p = _write(tmp_path, blob)
    data, _ = W.read_wav(p)
    assert np.allclose(data[0], [0.25, -0.5])


def test_rf64_ds64(tmp_path):
    samples = np.array([1000, -1000, 0, 500], dtype="<i2").tobytes()
    ds64 = struct.pack("<QQQI", 0, len(samples), 4, 0)
    blob = _wav_bytes(W.WAVE_FORMAT_PCM, 16, samples,
                      data_size=0xFFFFFFFF, riff=b"RF64", ds64=ds64)
    p = _write(tmp_path, blob)
    info = W.wav_info(p)
    assert info.num_frames == 4
    data, _ = W.read_wav(p)
    assert data.shape == (1, 4)
    assert data[0, 0] == pytest.approx(1000 / 32768.0)


# ---------------------------------------------------------------------------
# malformed inputs fail loudly
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "blob,msg",
    [
        (b"RIFX" + b"\x00" * 20, "Not a RIFF"),
        (_wav_bytes(W.WAVE_FORMAT_PCM, 16, b"", sr=0), "zero channels"),
        (_wav_bytes(W.WAVE_FORMAT_PCM, 16, b"", nch=0), "zero channels"),
        (  # truncated ds64 body
            _wav_bytes(W.WAVE_FORMAT_PCM, 16, b"", data_size=0xFFFFFFFF,
                       riff=b"RF64", ds64=b"\x00" * 8),
            "truncated ds64",
        ),
        (  # RF64 data size with no ds64 at all
            _wav_bytes(W.WAVE_FORMAT_PCM, 16, b"", data_size=0xFFFFFFFF,
                       riff=b"RF64"),
            "RF64 data size missing",
        ),
        (  # fmt chunk shorter than the 16 required bytes
            struct.pack("<4sI4s", b"RIFF", 30, b"WAVE")
            + struct.pack("<4sI", b"fmt ", 8) + b"\x00" * 8
            + struct.pack("<4sI", b"data", 0),
            "fmt chunk too small",
        ),
    ],
)
def test_malformed_headers_raise(tmp_path, blob, msg):
    p = _write(tmp_path, blob)
    with pytest.raises(ValueError, match=msg):
        W.read_wav(p)


def test_unsupported_depths_and_tags_raise(tmp_path):
    # sub-byte width
    p = _write(tmp_path, _wav_bytes(W.WAVE_FORMAT_PCM, 4, b"\x00"))
    with pytest.raises(ValueError, match="sub-byte"):
        W.read_wav(p)
    # PCM at an unknown depth (48-bit)
    p = _write(tmp_path, _wav_bytes(W.WAVE_FORMAT_PCM, 48, b"\x00" * 6))
    with pytest.raises(ValueError, match="PCM bit depth"):
        W.read_wav(p)
    # float at 16-bit
    p = _write(tmp_path, _wav_bytes(W.WAVE_FORMAT_IEEE_FLOAT, 16, b"\x00" * 2))
    with pytest.raises(ValueError, match="float bit depth"):
        W.read_wav(p)
    # unknown format tag
    p = _write(tmp_path, _wav_bytes(0x0050, 16, b"\x00" * 2))
    with pytest.raises(ValueError, match="format tag"):
        W.read_wav(p)
    # unknown write subtype
    with pytest.raises(ValueError, match="subtype"):
        W.write_wav(tmp_path / "x.wav", np.zeros((1, 4), np.float32), 8000,
                    subtype="PCM_12")
