"""Headline benchmark: batch-64 full augmentation chain + feature stack.

Measures the BASELINE.json north-star workload on the attached accelerator:
a seed-reproducible Compose chain (RoomImpulseResponse + BackgroundNoise +
Equalizer + VolumeNorm) plus pitch shift and the mel/LUFS feature stack,
all compiled into one XLA program over a batch of 64 five-second
44.1 kHz clips. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the achieved aggregate real-time factor divided by the
50x-per-chip target (BASELINE.md).
"""
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

DURATION = 5.0
SAMPLE_RATE = 44100
BATCH = 64
TARGET_RTF = 50.0


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the chain + Pallas meter cost ~5 min
    # of XLA/Mosaic compile on the tunneled TPU; cached reruns skip it.
    jax.config.update(
        "jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from fixtures import build_fixture_tree

    from audiotools_tpu.data import transforms as tfm
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
    from audiotools_tpu.data.loader import DataLoader
    from audiotools_tpu.ops import fft as F
    from audiotools_tpu.ops import loudness as L
    from audiotools_tpu.ops import stretch as S

    # Fast BS.1770 meter: 512-tap composed FIR on the Pallas MXU kernel
    # (v5e: 9.2 ms vs 17.6 ms per batch-64 meter; three meters per chain
    # step). dLUFS vs the exact meter is 7e-5.
    L.set_fast_meter(True)

    root = Path(tempfile.mkdtemp())
    build_fixture_tree(root)

    transform = tfm.Compose(
        tfm.RoomImpulseResponse(sources=[str(root / "ir.csv")]),
        tfm.BackgroundNoise(sources=[str(root / "nz.csv")]),
        tfm.Equalizer(),
        tfm.VolumeNorm(),
    )
    ds = AudioDataset(
        AudioLoader(sources=[str(root / "spk.csv")]),
        sample_rate=SAMPLE_RATE,
        n_examples=BATCH,
        duration=DURATION,
        transform=transform,
    )
    dl = DataLoader(ds, batch_size=BATCH, num_workers=8)
    batch = next(iter(dl))

    def pipeline(sig, kw):
        out = ds.transform(sig, **kw)
        audio = S.pitch_shift(out.audio_data, 2.0, SAMPLE_RATE)
        # MXU DFT-matmul mel: hardware-validated at ~1e-5 rel accuracy,
        # ~1.5x faster than the VPU FFT path
        mel = F.mel_spectrogram(audio, SAMPLE_RATE, 80, method="matmul")
        lufs = L.loudness(audio, SAMPLE_RATE)
        return audio, mel, lufs

    sig, kw = batch["signal"], batch["transform_args"]

    def _checksum(s, k):
        audio, mel, lufs = pipeline(s, k)
        # sum over every output so XLA cannot dead-code-eliminate a stage
        return jnp.sum(audio) + jnp.sum(mel) + jnp.sum(lufs)

    jitted = jax.jit(_checksum)

    # compile + settle
    float(jitted(sig, kw))

    # The TPU executes dispatches in order on one stream, so the time to
    # drain N queued calls (synced by fetching the last scalar result) is
    # N x true device time. (block_until_ready is unreliable over the
    # tunneled transport, and per-call host syncs would measure link
    # latency instead.)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(sig, kw)
    float(out)
    t1 = time.perf_counter()
    steady = (t1 - t0) / iters

    clips_per_sec = BATCH / steady
    rtf = clips_per_sec * DURATION

    print(
        json.dumps(
            {
                "metric": "clips_per_sec_chip_b64_5s_augment_pitch_mel_lufs",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(rtf / TARGET_RTF, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
