"""Transform regression snapshots (reference tests/data/test_transforms.py:21-63).

Every leaf transform's output on a fixed seed/signal is compared against a
committed WAV at atol 1e-4; snapshots auto-bootstrap if missing. Guards
numerical behavior across refactors and rounds.
"""
from pathlib import Path

import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from audiotools_tpu.data import transforms as tfm
from audiotools_tpu.io import read_wav, write_wav
from tests.fixtures import speech_like

SEED = 0
REGRESSION_DIR = Path(__file__).parents[1] / "regression" / "transforms"
REGRESSION_DIR.mkdir(parents=True, exist_ok=True)

SKIP = {
    "BaseTransform",
    "SpectralTransform",
    "Compose",
    "Choose",
    "Repeat",
    "RepeatUpTo",
    "Identity",
}
ALL_TFMS = sorted(
    x
    for x in dir(tfm)
    if isinstance(getattr(tfm, x), type)
    and issubclass(getattr(tfm, x), tfm.BaseTransform)
    and x not in SKIP
)


def _make_transform(name, audio_dir):
    cls = getattr(tfm, name)
    if name == "BackgroundNoise":
        return cls(sources=[str(audio_dir / "nz.csv")])
    if name == "CrossTalk":
        return cls(sources=[str(audio_dir / "spk.csv")])
    if name == "RoomImpulseResponse":
        return cls(sources=[str(audio_dir / "ir.csv")])
    return cls()


@pytest.mark.parametrize("name", ALL_TFMS)
def test_transform_regression(name, audio_dir):
    signal = AudioSignal(speech_like(3, 1.0)[None, None], 44100)
    signal.metadata["loudness"] = float(np.asarray(signal.loudness())[0])
    transform = _make_transform(name, audio_dir)
    kwargs = transform.instantiate(SEED, signal)
    output = transform(signal.clone(), **kwargs)

    path = REGRESSION_DIR / f"{name}.wav"
    if not path.exists():
        write_wav(path, np.asarray(output.audio_data[0]), 44100, subtype="FLOAT")
    golden, sr = read_wav(path)
    assert sr == 44100
    assert np.allclose(
        np.asarray(output.audio_data[0]), golden, atol=1e-4
    ), f"{name} drifted from its regression snapshot"
