"""Exercise the native build/load machinery itself (native/__init__.py):
the on-demand rebuild into a fresh directory, build-failure fallbacks,
bad-.so load failures, and the error paths of the ctypes wrappers."""
import shutil
import subprocess

import numpy as np
import pytest

import audiotools_tpu.native as N


def _reset(monkeypatch, **attrs):
    monkeypatch.setattr(N, "_lib", None)
    monkeypatch.setattr(N, "_tried", False)
    for k, v in attrs.items():
        monkeypatch.setattr(N, k, v)


def test_rebuild_into_fresh_dir(tmp_path, monkeypatch):
    """Copy the source into a tmpdir and force the full compile+load
    path (the branch a fresh checkout takes)."""
    if not N.available():
        pytest.skip("no native toolchain")
    src = tmp_path / "wavio.cpp"
    shutil.copy(N._HERE / "wavio.cpp", src)
    _reset(monkeypatch, _SRC=src, _LIB_PATH=tmp_path / "libatwavio.so")
    lib = N.get_library()
    assert lib is not None
    assert (tmp_path / "libatwavio.so").exists()

    # the freshly built library actually decodes
    from audiotools_tpu.io.wav import write_wav

    p = tmp_path / "t.wav"
    x = (np.sin(np.arange(800) / 10) * 0.4).astype(np.float32)[None]
    write_wav(p, x, 8000)
    data, sr = N.read_wav(p)
    assert sr == 8000
    assert np.allclose(data, x, atol=1e-3)

    # stale-library branch: touching the source forces a rebuild attempt
    src.touch()
    _reset(monkeypatch, _SRC=src, _LIB_PATH=tmp_path / "libatwavio.so")
    assert N.get_library() is not None


def test_build_failure_returns_none(tmp_path, monkeypatch):
    """A failing compiler (missing source) degrades to the Python codec
    instead of raising."""
    _reset(
        monkeypatch,
        _SRC=tmp_path / "nonexistent.cpp",
        _LIB_PATH=tmp_path / "libatwavio.so",
    )
    assert N.get_library() is None
    assert not N.available()
    with pytest.raises(RuntimeError, match="unavailable"):
        N.wav_info(tmp_path / "x.wav")


def test_compiler_missing_returns_none(tmp_path, monkeypatch):
    """g++ absent (FileNotFoundError) and timeouts both fail soft, for
    all three build fronts."""

    def no_compiler(*a, **k):
        raise FileNotFoundError("g++")

    monkeypatch.setattr(subprocess, "run", no_compiler)
    assert not N._build_library()
    assert not N._build_flac()
    assert not N._build_av()


def test_corrupt_so_fails_soft(tmp_path, monkeypatch):
    """An unloadable .so (newer than the source, so no rebuild) returns
    None rather than crashing."""
    src = tmp_path / "wavio.cpp"
    src.write_text("// nothing")
    bad = tmp_path / "libatwavio.so"
    bad.write_bytes(b"not an elf file")
    _reset(monkeypatch, _SRC=src, _LIB_PATH=bad)
    assert N.get_library() is None


def test_wrapper_error_paths(tmp_path, monkeypatch):
    if not N.available():
        pytest.skip("no native toolchain")
    # native parser rejects garbage
    junk = tmp_path / "junk.wav"
    junk.write_bytes(b"garbage" * 10)
    with pytest.raises(ValueError, match="could not parse WAV"):
        N.wav_info(junk)

    # batch decode with the flac library forced away
    monkeypatch.setattr(N, "get_flac_library", lambda: None)
    with pytest.raises(RuntimeError, match="FLAC codec unavailable"):
        N.read_batch([tmp_path / "a.flac"], [0.0], [1.0])
    with pytest.raises(RuntimeError, match="FLAC codec unavailable"):
        N.flac_info(tmp_path / "a.flac")
    with pytest.raises(RuntimeError, match="FLAC codec unavailable"):
        N.write_flac(tmp_path / "a.flac", np.zeros((1, 4)), 8000)


@pytest.mark.skipif(not N.av_available(), reason="libav shim unavailable")
def test_av_error_paths(tmp_path):
    with pytest.raises(ValueError, match="could not open"):
        N.av_info(tmp_path / "missing.mp4")
    with pytest.raises(ValueError, match="decode failed|could not open"):
        N.read_av(tmp_path / "missing.mp4")
    # encode into an unwritable location
    with pytest.raises(ValueError, match="encode failed"):
        N.write_av(tmp_path / "no_dir" / "x.m4a", np.zeros((1, 400), np.float32), 8000)
