"""File-loading profiler (manual, not CI).

Analog of reference tests/profilers/profile_load.py:77-103: excerpt reads
from a long file through each backend (native C++ vs pure Python), plus
salient_excerpt cost.
Run: python tests/profilers/profile_load.py
"""
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    from audiotools_tpu import AudioSignal, native
    from audiotools_tpu.io import read_wav, write_wav

    root = Path(tempfile.mkdtemp())
    # 30-minute file
    x = (np.random.RandomState(0).randn(1, 44100 * 1800) * 0.1).astype(np.float32)
    p = root / "long.wav"
    write_wav(p, x, 44100)

    offsets = np.random.RandomState(1).uniform(0, 1790, 64)

    t0 = time.perf_counter()
    for o in offsets:
        read_wav(p, offset=float(o), duration=2.0)
    t_py = time.perf_counter() - t0
    print(f"python codec: {1000*t_py/64:.2f} ms / 2s excerpt")

    if native.available():
        t0 = time.perf_counter()
        native.read_batch([p] * 64, [float(o) for o in offsets], [2.0] * 64)
        t_nat = time.perf_counter() - t0
        print(f"native batch: {1000*t_nat/64:.2f} ms / 2s excerpt "
              f"({t_py/t_nat:.1f}x)")

    # warm up (first call pays jax-CPU dispatch compilation + scipy import)
    AudioSignal.salient_excerpt(p, loudness_cutoff=-40, duration=2.0, state=123)

    t0 = time.perf_counter()
    n_tries = 0
    for seed in range(8):
        sig = AudioSignal.salient_excerpt(
            p, loudness_cutoff=-40, duration=2.0, state=seed
        )
        n_tries += 1
    t_sal = time.perf_counter() - t0
    print(f"salient_excerpt: {1000*t_sal/8:.1f} ms/draw")

    # per-phase breakdown (exclusive self-times) — the same accounting
    # the bench line commits as `host_breakdown`
    from audiotools_tpu import _hostprof as hostprof

    hostprof.reset()
    hostprof.enable()
    for seed in range(8):
        AudioSignal.salient_excerpt(
            p, loudness_cutoff=-40, duration=2.0, state=seed
        )
    hostprof.disable()
    tot = hostprof.totals()
    hostprof.reset()
    print(
        "phase breakdown:",
        {k: f"{1000 * v / 8:.2f} ms/draw" for k, v in sorted(tot.items())},
    )


if __name__ == "__main__":
    main()
