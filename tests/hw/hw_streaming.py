"""Streaming DAC inference throughput on the real chip.

Times the fixed-shape window programs behind models/streaming.py at the
full 44.1 kHz DAC size and derives the streaming throughput
(x realtime) and the per-chunk serving latency.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_streaming.py

RESULT (v5e via axon tunnel, 2026-08-19, full 44.1 kHz DAC,
halos enc 12 / dec 14 frames @ hop 512):
    B1 chunk  64: enc  2.72 ms (273x rt) | dec  3.31 ms (225x rt)
    B1 chunk 128: enc  3.40 ms (436x rt) | dec  7.52 ms (198x rt)
    B4 chunk  64: enc 10.30 ms (288x rt) | dec 13.47 ms (221x rt)
    B4 chunk 128: enc 17.16 ms (346x rt) | dec 25.54 ms (233x rt)
A single-stream encode+decode roundtrip sustains ~120x realtime at
chunk 64 (0.74 s of audio per chunk + ~0.14/0.16 s halo lookahead);
throughput scales near-linearly in batch. Device compute is far from
the serving bound — at these rates one v5e chip transcodes ~100
concurrent realtime streams per direction.
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
