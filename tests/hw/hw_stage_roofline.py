"""Per-stage HBM roofline of the headline bench chain (VERDICT r4 #4).

For each chain stage jitted in isolation: measured device time, XLA's
own bytes-accessed, and the fraction of the 819 GB/s v5e HBM ceiling.
The output table is committed to docs/perf.md so the chain's remaining
headroom is localized, not program-global.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 3000 python tests/hw/hw_stage_roofline.py

RESULT (v5e via axon tunnel, 2026-08-20): committed as the per-stage
table in docs/perf.md ("Per-stage roofline"). Headline findings: RIR
0.85 / BGNoise 1.15 / VolumeNorm 1.09 / LUFS 0.85 of the 819 GB/s
ceiling (at their byte floors; >1 = XLA counts bytes fusion never
moves); mel and the pitch DFT legs are MXU-bound (0.52/0.69 hbm but
44%-of-f32-ceiling matmul throughput); only the Equalizer shows real
HBM headroom (~0.8 ms ~= 1.5% of the chain). The "bf16 spectral
multiply for RIR" lever is a recorded NEGATIVE: the multiply is <3% of
that stage's bytes.
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, str(Path(__file__).parent.parent))
from fixtures import build_fixture_tree

from audiotools_tpu.data import transforms as tfm
from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
from audiotools_tpu.data.loader import DataLoader
from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import loudness as L
from audiotools_tpu.ops import perf
from audiotools_tpu.ops import stretch as S

DURATION, SR, B = 5.0, 44100, 64

print("platform:", jax.devices()[0].platform, flush=True)

root = Path(tempfile.mkdtemp())
build_fixture_tree(root)


def batch_for(tf):
    ds = AudioDataset(
        AudioLoader(sources=[str(root / "spk.csv")]),
        sample_rate=SR, n_examples=B, duration=DURATION, transform=tf,
    )
    b = next(iter(DataLoader(ds, batch_size=B, num_workers=8)))
    return ds, b["signal"], b["transform_args"]


def with_audio(base, a):
    out = base.clone()
    out.audio_data = a
    return out


rows = []
# the four Compose stages, each timed against its own instantiated kwargs
for name, tf in [
    ("RIR", tfm.RoomImpulseResponse(sources=[str(root / "ir.csv")])),
    ("BGNoise", tfm.BackgroundNoise(sources=[str(root / "nz.csv")])),
    ("Equalizer", tfm.Equalizer()),
    ("VolumeNorm", tfm.VolumeNorm()),
]:
    ds2, s2, k2 = batch_for(tf)
    x2 = jnp.asarray(np.asarray(s2.audio_data))
    s2d = jax.device_put(s2)
    rows.append(
        perf.stage_roofline(
            name,
            lambda a: ds2.transform(with_audio(s2d, a), **k2).audio_data,
            x2,
        )
    )
    print(rows[-1], flush=True)

x = jnp.asarray(
    (np.random.RandomState(0).randn(B, 1, int(SR * DURATION)) * 0.1).astype(
        np.float32
    )
)
for name, fn in [
    (
        "pitch_shift(fused)",
        lambda a: S.pitch_shift(
            a, 2.0, SR, synthesis_method="matmul_bf16",
            pv_formulation="phasor_fused",
        ),
    ),
    ("mel(matmul)", lambda a: F.mel_spectrogram(a, SR, 80, method="matmul")),
    ("lufs(exact)", lambda a: L.loudness(a, SR)),
]:
    rows.append(perf.stage_roofline(name, fn, x))
    print(rows[-1], flush=True)

print("\n| stage | ms | GB | hbm_frac | mfu_xla |", flush=True)
print("|---|---|---|---|---|", flush=True)
for r in rows:
    print(
        f"| {r['stage']} | {r['ms']} | {r['gbytes']} | {r['hbm_frac']} "
        f"| {r['mfu_xla']} |",
        flush=True,
    )
print("DONE", flush=True)
