"""Synthesized audio fixtures.

The reference ships real WAVs (speech under ``tests/audio/spk``, noise
``nz``, IRs ``ir``, BS.1770 compliance set) — those are git-lfs stubs in
this environment, so equivalents are synthesized deterministically:
speech-like = amplitude-modulated filtered noise + harmonics; noise =
shaped Gaussian; IR = direct impulse + exponentially decaying tail.
"""
import csv
from pathlib import Path

import numpy as np

from audiotools_tpu.io import write_wav

SR = 44100


def speech_like(seed: int, duration: float = 12.0, sr: int = SR) -> np.ndarray:
    """Deterministic speech-like signal: harmonic buzz with slow AM + noise."""
    rng = np.random.RandomState(seed)
    n = int(duration * sr)
    t = np.arange(n) / sr
    f0 = 120 + 30 * np.sin(2 * np.pi * 0.4 * t + rng.rand() * 6)
    phase = np.cumsum(2 * np.pi * f0 / sr)
    sig = np.zeros(n)
    for h, a in [(1, 1.0), (2, 0.6), (3, 0.4), (4, 0.25), (5, 0.12)]:
        sig += a * np.sin(h * phase + rng.rand() * 6)
    # formant-ish coloration
    noise = rng.randn(n) * 0.15
    am = 0.5 * (1 + np.sin(2 * np.pi * 2.5 * t + rng.rand() * 6))
    am = am * (rng.rand(n) < 0.999)
    out = (sig * am + noise * am) * 0.15
    return out.astype(np.float32)


def noise_like(seed: int, duration: float = 12.0, sr: int = SR) -> np.ndarray:
    """Colored stationary noise."""
    rng = np.random.RandomState(seed)
    n = int(duration * sr)
    white = rng.randn(n)
    # simple pinkish shaping via cumulative smoothing
    b = np.exp(-np.arange(64) / 16.0)
    b /= b.sum()
    out = np.convolve(white, b, mode="same") * 0.2
    return out.astype(np.float32)


def ir_like(seed: int, duration: float = 1.0, sr: int = SR) -> np.ndarray:
    """Synthetic room impulse response: direct spike + decaying tail."""
    rng = np.random.RandomState(seed)
    n = int(duration * sr)
    out = np.zeros(n, dtype=np.float32)
    d0 = 64
    out[d0] = 1.0
    tail = rng.randn(n - d0 - 1) * np.exp(-np.linspace(0, 9, n - d0 - 1))
    out[d0 + 1 :] = 0.25 * tail
    return out.astype(np.float32)


def build_fixture_tree(root: Path):
    """Create spk/, nz/, ir/ WAVs and matching CSV manifests under root."""
    root = Path(root)
    groups = {
        "spk": [speech_like(i) for i in range(3)],
        "nz": [noise_like(100 + i) for i in range(2)],
        "ir": [ir_like(200 + i) for i in range(2)],
    }
    for name, sigs in groups.items():
        d = root / name
        d.mkdir(exist_ok=True)
        paths = []
        for i, s in enumerate(sigs):
            p = d / f"{name}_{i}.wav"
            write_wav(p, s[None, :], SR)
            paths.append(p)
        with open(root / f"{name}.csv", "w", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=["path"])
            writer.writeheader()
            for p in paths:
                writer.writerow({"path": str(p)})
    # empty.csv fixture (reference tests/audio/empty.csv)
    with open(root / "empty.csv", "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=["path"])
        writer.writeheader()
        writer.writerow({"path": ""})
    return root
