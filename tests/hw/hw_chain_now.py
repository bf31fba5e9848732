"""Current-production chain decomposition: fast meter + bf16 synthesis.

The headline step is 73.3 ms (872.8 clips/s); stage probes summed ~56 ms.
This measures the stages and the one-jit composition under the exact
bench configuration to locate any composition overhead.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_chain_now.py
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).parent.parent))
from fixtures import build_fixture_tree

from audiotools_tpu.data import transforms as tfm
from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
from audiotools_tpu.data.loader import DataLoader
from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import loudness as L
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

DURATION, SR, B = 5.0, 44100, 64
L.set_fast_meter(True)

print("platform:", jax.devices()[0].platform, flush=True)

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
    sample_rate=SR, n_examples=B, duration=DURATION, transform=transform,
)
dl = DataLoader(ds, batch_size=B, num_workers=8)
batch = next(iter(dl))
sig, kw = batch["signal"], batch["transform_args"]
x = sig.audio_data


def with_audio(a):
    out = sig.clone()
    out.audio_data = a
    return out


def ms(fn, arg, iters=10):
    return device_time(fn, arg, iters=iters) * 1e3


def full(a):
    out = ds.transform(with_audio(a), **kw)
    audio = S.pitch_shift(out.audio_data, 2.0, SR, synthesis_method="matmul_bf16")
    mel = F.mel_spectrogram(audio, SR, 80, method="matmul")
    lufs = L.loudness(audio, SR)
    return jnp.sum(audio) + jnp.sum(mel) + jnp.sum(lufs)


print(f"FULL one-jit pipeline: {ms(full, x):.2f} ms", flush=True)
print(f"compose only: {ms(lambda a: ds.transform(with_audio(a), **kw).audio_data, x):.2f} ms", flush=True)
print(f"pitch bf16: {ms(lambda a: S.pitch_shift(a, 2.0, SR, synthesis_method='matmul_bf16'), x):.2f} ms", flush=True)
print(f"mel: {ms(lambda a: F.mel_spectrogram(a, SR, 80, method='matmul'), x):.2f} ms", flush=True)
print(f"lufs fast: {ms(lambda a: L.loudness(a, SR), x):.2f} ms", flush=True)

for name, tf in [
    ("RIR", tfm.RoomImpulseResponse(sources=[str(root / "ir.csv")])),
    ("BGNoise", tfm.BackgroundNoise(sources=[str(root / "nz.csv")])),
    ("Equalizer", tfm.Equalizer()),
    ("VolumeNorm", tfm.VolumeNorm()),
]:
    ds2 = AudioDataset(
        AudioLoader(sources=[str(root / "spk.csv")]),
        sample_rate=SR, n_examples=B, duration=DURATION, transform=tf,
    )
    b2 = next(iter(DataLoader(ds2, batch_size=B, num_workers=8)))
    s2, k2 = b2["signal"], b2["transform_args"]

    def apply2(a, ds2=ds2, s2=s2, k2=k2):
        out = s2.clone()
        out.audio_data = a
        return ds2.transform(out, **k2).audio_data

    print(f"  {name}: {ms(apply2, s2.audio_data):.2f} ms", flush=True)

print("DONE", flush=True)

# RESULT (v5e, 2026-08-17, fast meter + bf16 synthesis): FULL one-jit
# pipeline 60.57 ms; stages: compose 30.39 (RIR 17.23, BGNoise 4.59,
# EQ 1.41, VolumeNorm 2.86), pitch 20.55, mel 8.13, lufs 2.88 — stage
# sum ~= whole (no composition overhead). The bench's earlier 73.3 ms
# per step was the ~13 ms/dispatch tunnel RTT, now cancelled by the
# chained-loop headline (bench.py).
