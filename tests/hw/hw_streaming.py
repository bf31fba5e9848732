"""Streaming DAC inference throughput on the real chip.

Times the fixed-shape window programs behind models/streaming.py at the
full 44.1 kHz DAC size and derives the streaming throughput
(x realtime) and the per-chunk serving latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_streaming.py

RESULT (v5e via axon tunnel): see bottom after first run.
"""
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audiotools_tpu.models import DAC
from audiotools_tpu.models.streaming import (
    decoder_halo_frames,
    encoder_halo_frames,
)
from audiotools_tpu.ops.benchmark import device_time

SR = 44100
print("platform:", jax.devices()[0].platform, flush=True)

model = DAC()
hop = model.hop_length
eh, dh = encoder_halo_frames(model), decoder_halo_frames(model)
print(f"halos: enc {eh} frames, dec {dh} frames (hop {hop})", flush=True)

params = jax.jit(model.init)(
    jax.random.PRNGKey(0), jnp.zeros((1, 1, 4 * hop))
)

for B in (1, 4):
    for chunk in (64, 128):
        W = (chunk + 2 * eh) * hop
        win = jnp.asarray(
            (np.random.RandomState(0).randn(B, 1, W) * 0.1).astype(
                np.float32
            )
        )

        def enc_win(w):
            _, codes = model.apply(params, w, method=DAC.encode)
            return codes

        t_e = device_time(enc_win, win, iters=5)

        Wd = chunk + 2 * dh
        codes = jax.jit(enc_win)(win)[:, :, :Wd]

        t_d = device_time(
            lambda c: model.apply(params, c, method=DAC.decode_from_codes),
            codes, iters=5,
        )
        audio_s = chunk * hop / SR
        print(
            f"B{B} chunk{chunk:4d}: enc {t_e*1e3:6.2f} ms "
            f"({B*audio_s/t_e:7.0f}x rt) | dec {t_d*1e3:6.2f} ms "
            f"({B*audio_s/t_d:7.0f}x rt) | chunk latency "
            f"{audio_s*1e3:.0f} ms audio",
            flush=True,
        )
