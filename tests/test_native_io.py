"""Native C++ WAV engine tests: parity with the Python codec, seeked
reads, parallel batch decode, and fallback behavior."""
import numpy as np
import pytest

from audiotools_tpu import native
from audiotools_tpu.io import load_audio, read_wav, save_audio, write_wav

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


@pytest.fixture(scope="module")
def wavs(tmp_path_factory):
    root = tmp_path_factory.mktemp("native")
    files = {}
    rng = np.random.RandomState(0)
    for name, (ch, subtype) in {
        "mono16": (1, "PCM_16"),
        "stereo16": (2, "PCM_16"),
        "mono24": (1, "PCM_24"),
        "mono32": (1, "PCM_32"),
        "monof32": (1, "FLOAT"),
    }.items():
        data = (rng.randn(ch, 22050) * 0.1).astype(np.float32)
        p = root / f"{name}.wav"
        write_wav(p, data, 22050, subtype=subtype)
        files[name] = (p, data)
    return files


def test_info_matches_python(wavs):
    for p, data in wavs.values():
        sr, frames, ch = native.wav_info(p)
        assert sr == 22050
        assert frames == data.shape[1]
        assert ch == data.shape[0]


def test_decode_parity_with_python_codec(wavs):
    for name, (p, data) in wavs.items():
        c_audio, c_sr = native.read_wav(p)
        py_audio, py_sr = read_wav(p)
        assert c_sr == py_sr
        assert c_audio.shape == py_audio.shape
        assert np.abs(c_audio - py_audio).max() < 1e-6, name


def test_seeked_read(wavs):
    p, data = wavs["stereo16"]
    audio, sr = native.read_wav(p, offset=0.25, duration=0.5)
    assert audio.shape == (2, 11025)
    py_audio, _ = read_wav(p, offset=0.25, duration=0.5)
    assert np.abs(audio - py_audio).max() < 1e-6


def test_read_past_end_truncates(wavs):
    p, data = wavs["mono16"]
    audio, sr = native.read_wav(p, offset=0.9, duration=5.0)
    assert audio.shape[1] == 22050 - int(0.9 * 22050)


def test_batch_decode(wavs):
    paths = [wavs["mono16"][0], wavs["mono24"][0], wavs["monof32"][0]]
    outs, srs = native.read_batch(
        paths, offsets=[0.0, 0.1, 0.2], durations=[0.5, 0.5, 0.5], n_threads=3
    )
    assert len(outs) == 3
    for out, p, off in zip(outs, paths, [0.0, 0.1, 0.2]):
        assert out.shape == (1, 11025)
        ref, _ = read_wav(p, offset=off, duration=0.5)
        assert np.abs(out - ref).max() < 1e-6


def test_batch_decode_pads_short_reads(wavs):
    p, _ = wavs["mono16"]
    outs, _ = native.read_batch([p], offsets=[0.9], durations=[1.0])
    assert outs[0].shape == (1, 22050)
    # tail beyond EOF is zero
    valid = 22050 - int(0.9 * 22050)
    assert np.abs(outs[0][0, valid:]).max() == 0


def test_truncated_stereo_content_single_read(wavs, tmp_path):
    """A truncated multichannel file (header promises more frames than the
    body holds) must decode every channel at the right time offsets with a
    zeroed tail — regression for the planar-stride bug where read_one wrote
    at the decoded count while the caller's buffer used the requested
    count, corrupting channels 1+ and leaking uninitialized memory."""
    from audiotools_tpu.io.wav import wav_info as py_wav_info

    src, data = wavs["stereo16"]
    raw = src.read_bytes()
    hdr = py_wav_info(src).data_offset
    p = tmp_path / "trunc.wav"
    # keep the header intact but drop the last 1/3 of the sample bytes
    total = 22050
    keep = total * 2 // 3
    p.write_bytes(raw[: hdr + keep * 2 * 2])

    sr, frames, ch = native.wav_info(p)
    assert frames == total  # header still claims the full length

    # single read requests all 22050 frames, gets the 14700 that exist;
    # both channels must hold their true samples (not a misplaced stride)
    audio, _ = native.read_wav(p)
    assert audio.shape == (2, keep)
    np.testing.assert_allclose(audio, data[:, :keep], atol=1.0 / 32768)

    # same file through the batch path
    outs, _ = native.read_batch([p], offsets=[0.0], durations=[1.0])
    np.testing.assert_allclose(
        outs[0][:, :keep], data[:, :keep], atol=1.0 / 32768
    )
    assert np.abs(outs[0][:, keep:]).max() == 0


def test_batch_decode_error_reports_item(wavs, tmp_path):
    good = wavs["mono16"][0]
    with pytest.raises(ValueError, match="could not parse|item"):
        native.read_batch(
            [good, tmp_path / "missing.wav"],
            offsets=[0, 0],
            durations=[0.1, 0.1],
        )


def test_load_audio_uses_native(wavs):
    p, data = wavs["mono16"]
    audio, sr = load_audio(p, offset=0.1, duration=0.3)
    ref, _ = read_wav(p, offset=0.1, duration=0.3)
    assert np.abs(audio - ref).max() < 1e-6


def test_read_batch_mixed_wav_flac(tmp_path):
    """Batch decode dispatches per extension: WAV via the wavio threads,
    FLAC via the flacio threads, order preserved, short reads padded."""
    if not native.flac_available():
        pytest.skip("native FLAC codec unavailable")
    rng = np.random.RandomState(3)
    paths, refs = [], []
    for i in range(4):
        x = (rng.randn(1, 8000) * 0.2).astype(np.float32)
        if i % 2:
            p = tmp_path / f"m{i}.flac"
            native.write_flac(p, x, 16000)
            q = np.clip(np.rint(x * 32768), -32768, 32767) / 32768.0
        else:
            p = tmp_path / f"m{i}.wav"
            save_audio(p, x, 16000, subtype="FLOAT")
            q = x
        paths.append(p)
        refs.append(q.astype(np.float32))

    outs, srs = native.read_batch(paths, [0.1] * 4, [0.25] * 4)
    assert srs == [16000] * 4
    for o, r in zip(outs, refs):
        np.testing.assert_allclose(o, r[:, 1600 : 1600 + 4000], atol=1e-6)

    # excerpt past EOF zero-pads
    outs2, _ = native.read_batch(paths, [0.4] * 4, [0.25] * 4)
    for o in outs2:
        assert o.shape == (1, 4000)
        assert np.all(o[:, 1600:] == 0)


def test_negative_duration_and_offset_clamped(wavs):
    """A negative duration must never reach the C decoder as a frame
    count (at_wav_read treats n < 0 as read-to-end and would decode the
    whole file into the zero-byte output buffer); negative offsets clamp
    to the file start."""
    p, data = wavs["stereo16"]
    out, sr = native.read_wav(p, duration=-0.5)
    assert out.shape == (2, 0)
    out, sr = native.read_wav(p, offset=-3.0, duration=0.1)
    assert out.shape == (2, int(0.1 * sr))
    np.testing.assert_allclose(out, data[:, : out.shape[1]], atol=2e-4)
    # batch path: same clamps
    outs, srs = native.read_batch([p, p], [-3.0, 0.0], [0.1, -0.5])
    assert outs[0].shape == (2, int(0.1 * srs[0]))
    assert outs[1].shape == (2, 0)
