"""Per-stage timing of the headline bench chain on the real TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_profile_chain.py
"""
import sys
import tempfile
from pathlib import Path

import numpy as np

import jax
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

# bench configuration: since r4 the production default is the exact
# blocked-IIR meter (filters.iir_cascade_blocked), which is also the
# fastest path — profile what the headline runs

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

def t_of(fn, arg, iters=5):
    return device_time(fn, arg, iters=iters) * 1e3


def with_audio(base, a):
    out = base.clone()
    out.audio_data = a
    return out

# stage timings
print(f"transform-compose: {t_of(lambda a: ds.transform(with_audio(sig, a), **kw).audio_data, x):.2f} ms", flush=True)
print(f"pitch_shift (fused, bench cfg): {t_of(lambda a: S.pitch_shift(a, 2.0, SR, pv_formulation='phasor_fused'), x):.2f} ms", flush=True)
print(f"mel matmul: {t_of(lambda a: F.mel_spectrogram(a, SR, 80, method='matmul'), x):.2f} ms", flush=True)
print(f"loudness: {t_of(lambda a: L.loudness(a, SR), x):.2f} ms", flush=True)

# individual transforms
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
    print(f"  {name}: {t_of(lambda a: ds2.transform(with_audio(s2, a), **k2).audio_data, s2.audio_data):.2f} ms", flush=True)

print("DONE", flush=True)
