"""Per-transform latency profiler (manual, not CI).

Analog of reference tests/profilers/profile_transforms.py:22-73: every
leaf transform applied to a batch-64 of 5 s clips, true device time.
Run: python tests/profilers/profile_transforms.py
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parents[1]))


def main():
    from fixtures import build_fixture_tree
    from audiotools_tpu import AudioSignal
    from audiotools_tpu.data import transforms as tfm
    from audiotools_tpu.ops.benchmark import device_time
    from fixtures import speech_like

    root = Path(tempfile.mkdtemp())
    build_fixture_tree(root)

    batch_size, duration = 64, 5.0
    base = AudioSignal(speech_like(0, duration)[None, None], 44100)
    batch = AudioSignal.batch([base.clone() for _ in range(batch_size)])

    names = [
        x
        for x in dir(tfm)
        if isinstance(getattr(tfm, x), type)
        and issubclass(getattr(tfm, x), tfm.BaseTransform)
        and x
        not in {
            "BaseTransform", "SpectralTransform", "Compose", "Choose",
            "Repeat", "RepeatUpTo", "Identity",
        }
    ]

    for name in sorted(names):
        cls = getattr(tfm, name)
        kwargs = {}
        if name == "BackgroundNoise":
            kwargs["sources"] = [str(root / "nz.csv")]
        elif name == "CrossTalk":
            kwargs["sources"] = [str(root / "spk.csv")]
        elif name == "RoomImpulseResponse":
            kwargs["sources"] = [str(root / "ir.csv")]
        transform = cls(**kwargs)
        tfm_kwargs = transform.batch_instantiate(
            list(range(batch_size)), base
        )

        def apply(audio):
            sig = batch.clone()
            sig.audio_data = audio
            return transform(sig, **tfm_kwargs).audio_data

        try:
            sec = device_time(apply, batch.audio_data, iters=3)
            print(f"{name:24s}: {1000*sec:8.2f} ms/batch-64")
        except Exception as e:  # noqa
            print(f"{name:24s}: failed ({type(e).__name__})")


if __name__ == "__main__":
    main()
