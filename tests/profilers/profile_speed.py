"""Transform-chain throughput profiler (manual, not CI).

The analog of the reference's tests/profilers/profile_speed.py:16-79:
batch-64 Compose(RoomImpulseResponse, BackgroundNoise) over varying clip
durations, measured as true device time (chained iterations).
Run: python tests/profilers/profile_speed.py
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    import jax

    from fixtures import build_fixture_tree
    from audiotools_tpu.data import transforms as tfm
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
    from audiotools_tpu.data.loader import DataLoader
    from audiotools_tpu.ops.benchmark import device_time

    root = Path(tempfile.mkdtemp())
    build_fixture_tree(root)

    batch_size = 64
    for duration in [0.5, 2.0, 5.0]:
        transform = tfm.Compose(
            tfm.RoomImpulseResponse(sources=[str(root / "ir.csv")]),
            tfm.BackgroundNoise(sources=[str(root / "nz.csv")]),
        )
        ds = AudioDataset(
            AudioLoader(sources=[str(root / "spk.csv")]),
            sample_rate=44100,
            n_examples=batch_size,
            duration=duration,
            transform=transform,
        )
        batch = next(iter(DataLoader(ds, batch_size=batch_size, num_workers=4)))
        kw = batch["transform_args"]

        def apply(audio):
            sig = batch["signal"].clone()
            sig.audio_data = audio
            return ds.transform(sig, **kw).audio_data

        sec = device_time(apply, batch["signal"].audio_data, iters=5)
        ips = batch_size / sec
        print(
            f"duration={duration}s batch={batch_size}: "
            f"{1000*sec:.1f} ms/batch, {ips:.0f} items/s, "
            f"{ips*duration:.0f}x realtime  [{jax.devices()[0].platform}]"
        )


if __name__ == "__main__":
    main()
