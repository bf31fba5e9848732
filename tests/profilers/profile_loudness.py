"""Loudness-meter throughput profiler (manual, not CI).

Analog of reference tests/profilers/profile_loudness.py:33-88: batch-64
BS.1770 integrated LUFS on 5 s 44.1 kHz clips, exact vs FIR paths.
Run: python tests/profilers/profile_loudness.py
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    import jax.numpy as jnp

    from audiotools_tpu.ops import loudness as L
    from audiotools_tpu.ops.benchmark import device_time

    B, T, SR = 64, 5 * 44100, 44100
    x = jnp.asarray(
        (np.random.RandomState(0).randn(B, 1, T) * 0.1).astype(np.float32)
    )

    for use_fir, name in [(False, "exact"), (True, "fir512")]:
        sec = device_time(lambda a: L.loudness(a, SR, use_fir=use_fir), x, iters=5)
        print(
            f"loudness[{name}]: {1000*sec:.2f} ms/batch-64, "
            f"{B/sec:.0f} items/s, {B*5/sec:.0f}x realtime"
        )


if __name__ == "__main__":
    main()
