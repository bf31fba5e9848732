"""FFMPEG mixin (reference `/root/reference/audiotools/core/ffmpeg.py`).

ffmpeg/ffprobe binaries are not present in this environment; every entry
point keeps the reference API but falls back to native implementations
(the BS.1770 meter for r128 loudness, the polyphase resampler, and the
native WAV decoder). If ffmpeg *is* on PATH it is used as in the
reference, and acts as a verification oracle for the native paths.
"""
import json
import shlex
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Tuple

import numpy as np


def ffmpeg_available() -> bool:
    return shutil.which("ffmpeg") is not None


def r128stats(filepath: str, quiet: bool = True):
    """EBU R128 stats for a file (reference ffmpeg.py:13-62).

    Uses the ffmpeg ``ebur128`` filter when available, otherwise the native
    BS.1770 meter (integrated loudness + peak; LRA/threshold set to the
    integrated-derived defaults).
    """
    if ffmpeg_available():
        ffargs = [
            "ffmpeg",
            "-nostats",
            "-i",
            str(filepath),
            "-filter_complex",
            "ebur128",
            "-f",
            "null",
            "-",
        ]
        proc = subprocess.Popen(
            ffargs, stderr=subprocess.PIPE, universal_newlines=True
        )
        # the filter prints its Summary block on stderr; fields follow
        # their tags ("I:" is trailed by value, unit, "Threshold:", value)
        summary = proc.communicate()[1]
        tokens = summary[summary.rfind("Summary:"):].split()

        def field(tag, skip=1):
            return float(tokens[tokens.index(tag) + skip])

        return {
            "I": field("I:"),
            "I Threshold": field("I:", skip=4),
            "LRA": field("LRA:"),
            "LRA Threshold": field("LRA:", skip=4),
            "LRA Low": field("low:"),
            "LRA High": field("high:"),
        }

    # native fallback
    from ..io import load_audio
    from ..ops.loudness import integrated_loudness
    import jax.numpy as jnp

    data, sr = load_audio(filepath)
    lufs = float(integrated_loudness(jnp.asarray(data.T)[None], sr)[0])
    return {
        "I": lufs,
        "I Threshold": lufs - 10.0,
        "LRA": 0.0,
        "LRA Threshold": lufs - 20.0,
        "LRA Low": lufs,
        "LRA High": lufs,
    }


def ffprobe_offset_and_codec(path: str) -> Tuple[float, str]:
    """Start offset and codec of the first audio stream
    (reference ffmpeg.py:65-87). Returns (0.0, "pcm") natively."""
    if shutil.which("ffprobe") is None:
        return 0.0, "pcm_s16le"
    ff = subprocess.run(
        [
            "ffprobe",
            "-show_streams",
            "-select_streams",
            "a",
            "-of",
            "json",
            str(path),
        ],
        capture_output=True,
        text=True,
    )
    streams = json.loads(ff.stdout)["streams"]
    seconds_offset = 0.0
    codec = None
    for stream in streams:
        seconds_offset = stream.get("start_time", 0.0)
        codec = stream.get("codec_name")
    return float(seconds_offset), codec


class FFMPEGMixin:
    _loudness = None

    def ffmpeg_loudness(self, quiet: bool = True):
        """Integrated loudness via the r128 path (reference ffmpeg.py:92-114)."""
        import jax.numpy as jnp

        with tempfile.NamedTemporaryFile(suffix=".wav") as f:

            def integrated(i):
                self[i].write(f.name)
                return r128stats(f.name, quiet=quiet)["I"]

            per_item = [integrated(i) for i in range(self.batch_size)]

        self._loudness = jnp.asarray(np.array(per_item)).astype(jnp.float32)
        return self.loudness()

    def ffmpeg_resample(self, sample_rate: int, quiet: bool = True):
        """Resample (ffmpeg when present, else native polyphase;
        reference ffmpeg.py:116-147)."""
        if sample_rate == self.sample_rate:
            return self

        if ffmpeg_available():
            from .signal import AudioSignal

            with tempfile.NamedTemporaryFile(suffix=".wav") as f:
                self.write(f.name)
                f_out = f.name.replace("wav", "rs.wav")
                command = f"ffmpeg -i {f.name} -ar {sample_rate} {f_out} -hide_banner"
                if quiet:
                    command += " -loglevel error"
                subprocess.check_call(shlex.split(command))
                resampled = AudioSignal(f_out)
                Path.unlink(Path(f_out))
            self.audio_data = resampled.audio_data
            self.sample_rate = resampled.sample_rate
            return self

        return self.resample(sample_rate)

    @classmethod
    def load_from_file_with_ffmpeg(cls, audio_path: str, quiet: bool = True, **kwargs):
        """Decode arbitrary containers via ffmpeg when available
        (reference ffmpeg.py:149-211); falls back to the native decoder."""
        if not ffmpeg_available():
            return cls(audio_path, **kwargs)

        audio_path = str(audio_path)
        with tempfile.TemporaryDirectory() as d:
            wav_file = str(Path(d) / "extracted.wav")
            padded_wav = str(Path(d) / "padded.wav")

            global_options = "-y"
            if quiet:
                global_options += " -loglevel error"

            subprocess.check_call(
                ["ffmpeg"]
                + shlex.split(global_options)
                + ["-i", audio_path, wav_file]
            )

            # provide compatibility with streams that start at non-zero
            seconds_offset, codec = ffprobe_offset_and_codec(audio_path)

            # Don't pad files with discrepancies less than 0.027 s —
            # it's likely due to codec latency (reference ffmpeg.py:186-192)
            if seconds_offset < 0.027:
                seconds_offset = 0.0

            pad = seconds_offset
            subprocess.check_call(
                ["ffmpeg"]
                + shlex.split(global_options)
                + [
                    "-i",
                    wav_file,
                    "-af",
                    f"adelay={int(pad * 1000)}|{int(pad * 1000)}",
                    padded_wav,
                ]
            )
            signal = cls(padded_wav, **kwargs)

        return signal
