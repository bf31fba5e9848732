"""The ffmpeg-*present* branches of core/ffmpeg.py, driven against stub
``ffmpeg``/``ffprobe`` executables on PATH (the image has no real
ffmpeg). The parse logic — ebur128 summary extraction, ffprobe JSON
offset/codec, the resample and extract/pad call plumbing
(reference ffmpeg.py:13-211) — is what these pin; the real binaries'
output formats are fixed upstream."""
import json
import os
import stat
import sys
from pathlib import Path

import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from audiotools_tpu.core import ffmpeg as ff


EBUR_SUMMARY = """\
[Parsed_ebur128_0 @ 0x55dd9d5df1c0] Summary:

  Integrated loudness:
    I:         -23.5 LUFS
    Threshold: -33.6 LUFS

  Loudness range:
    LRA:         2.2 LU
    Threshold: -43.6 LUFS
    LRA low:   -24.6 LUFS
    LRA high:  -22.4 LUFS
"""


@pytest.fixture()
def stub_bin(tmp_path, monkeypatch):
    """Fake ffmpeg/ffprobe on PATH.

    ffmpeg: ebur128 runs print a canned summary to stderr; ``-ar R``
    resamples by writing the input wav back at rate R (linear interp via
    a python helper); ``-af adelay`` and plain extraction copy through.
    """
    d = tmp_path / "bin"
    d.mkdir()

    helper = d / "helper.py"
    helper.write_text(
        """
import sys
import numpy as np
sys.path.insert(0, {repo!r})
from audiotools_tpu.io import load_audio, save_audio

mode = sys.argv[1]
if mode == "resample":
    src, rate, dst = sys.argv[2], int(sys.argv[3]), sys.argv[4]
    data, sr = load_audio(src)
    n_out = int(round(data.shape[1] * rate / sr))
    t = np.linspace(0, data.shape[1] - 1, n_out)
    out = np.stack([np.interp(t, np.arange(data.shape[1]), ch) for ch in data])
    save_audio(dst, out.astype(np.float32), rate)
elif mode == "copy":
    src, dst = sys.argv[2], sys.argv[3]
    import shutil
    shutil.copy(src, dst)
""".format(repo=str(Path(__file__).resolve().parents[2]))
    )

    ffmpeg = d / "ffmpeg"
    ffmpeg.write_text(
        f"""#!/bin/sh
case "$*" in
  *ebur128*)
    cat <<'SUMMARY' >&2
{EBUR_SUMMARY}
SUMMARY
    ;;
  *" -ar "*)
    # ffmpeg -i IN -ar RATE OUT ...
    IN=""; RATE=""; OUT=""
    prev=""
    for a in "$@"; do
      [ "$prev" = "-i" ] && IN="$a"
      [ "$prev" = "-ar" ] && RATE="$a"
      prev="$a"
    done
    for a in "$@"; do case "$a" in *.rs.wav) OUT="$a";; esac; done
    {sys.executable} {helper} resample "$IN" "$RATE" "$OUT"
    ;;
  *)
    # extraction or adelay pad: copy input to the final positional arg
    IN=""; OUT=""; prev=""
    for a in "$@"; do
      [ "$prev" = "-i" ] && IN="$a"
      prev="$a"; OUT="$a"
    done
    {sys.executable} {helper} copy "$IN" "$OUT"
    ;;
esac
exit 0
"""
    )
    ffprobe = d / "ffprobe"
    ffprobe.write_text(
        """#!/bin/sh
echo '%s'
""" % json.dumps({"streams": [{"start_time": "0.05", "codec_name": "mp3"}]})
    )
    for f in (ffmpeg, ffprobe):
        f.chmod(f.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{d}:{os.environ['PATH']}")
    # the availability check caches; reset it if present
    if hasattr(ff, "_ffmpeg_checked"):
        monkeypatch.setattr(ff, "_ffmpeg_checked", None, raising=False)
    return d


def _sig(seconds=0.6, sr=44100):
    t = np.arange(int(seconds * sr)) / sr
    x = (0.25 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    return AudioSignal(x[None, None], sr)


def test_r128stats_parses_ebur128_summary(stub_bin, tmp_path):
    assert ff.ffmpeg_available()
    wav = tmp_path / "x.wav"
    _sig().write(wav)
    stats = ff.r128stats(wav)
    assert stats["I"] == -23.5
    assert stats["I Threshold"] == -33.6
    assert stats["LRA"] == 2.2
    assert stats["LRA Threshold"] == -43.6
    assert stats["LRA Low"] == -24.6
    assert stats["LRA High"] == -22.4


def test_ffmpeg_loudness_uses_r128(stub_bin):
    sig = _sig()
    lufs = np.asarray(sig.ffmpeg_loudness())
    assert lufs.shape == (1,)
    assert abs(float(lufs[0]) - (-23.5)) < 1e-5


def test_ffprobe_offset_and_codec(stub_bin, tmp_path):
    off, codec = ff.ffprobe_offset_and_codec(tmp_path / "whatever.mp3")
    assert off == pytest.approx(0.05)
    assert codec == "mp3"


def test_ffmpeg_resample_branch(stub_bin):
    sig = _sig()
    sig.ffmpeg_resample(22050)
    assert sig.sample_rate == 22050
    assert sig.signal_length == pytest.approx(0.6 * 22050, abs=2)


def test_load_from_file_with_ffmpeg_pads_stream_offset(stub_bin, tmp_path):
    src = tmp_path / "in.wav"
    _sig().write(src)
    sig = AudioSignal.load_from_file_with_ffmpeg(str(src))
    # the stub ffprobe reports a 0.05 s start offset (> the 0.027 s
    # codec-latency heuristic); the adelay pad step runs (stub copies),
    # and the signal decodes
    assert sig.batch_size == 1
    assert float(np.abs(sig.numpy()).max()) > 0.1


def test_native_fallbacks_without_ffmpeg(tmp_path, monkeypatch):
    """Without the binary, every mixin method lands on the native path."""
    monkeypatch.setenv("PATH", "/nonexistent")
    sig = _sig()
    stats_wav = tmp_path / "y.wav"
    sig.write(stats_wav)
    stats = ff.r128stats(stats_wav)
    assert stats["I"] < 0  # native BS.1770 integrated loudness
    off, codec = ff.ffprobe_offset_and_codec(stats_wav)
    assert (off, codec) == (0.0, "pcm_s16le")
