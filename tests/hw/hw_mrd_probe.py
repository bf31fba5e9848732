"""Localize the MRD cost: per-window fwd+bwd, fft vs matmul analysis.

hw_mpd_matmul.py put the whole MPD at 6.1 ms fwd+bwd, so the D-update's
~46 ms lives in the MRD band-split stacks. This probe times one
BandSpectrogramDiscriminator per window size (fwd+bwd wrt params) under
both stft_method settings.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_mrd_probe.py

RESULT (v5e via axon tunnel, 2026-08-19):
    fft   : w2048 6.83 + w1024 5.59 + w512 5.32 = 17.73 ms
    matmul: w2048 6.13 + w1024 5.19 + w512 5.42 = 16.74 ms
MPD (6.1) + MRD (17.7) ~= 23.8 ms per input fwd+bwd — times two inputs
matches the 46 ms D-update exactly: no hidden overhead, the ensemble
cost is just spread across 15 band stacks of ch=32 convs, each a
quarter of the MXU's 128 lanes by construction of the published
architecture. matmul analysis wins ~1 ms/input/pass in isolation and is
adopted as the Discriminator default (consistent with the library's
other matmul-STFT defaults); the full adversarial step reads neutral
(147.8 vs 147.9 ms — inside jitter). The remaining idea — packing the
5 bands into one grouped conv at the max band width — costs +25% FLOPs
for 5x fewer ops with per-band params kept; not taken: the probe data
shows per-op overhead is NOT the bound (band stacks scale with their
flops), so the packing would only add the padding waste.
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

from audiotools_tpu.models.discriminators import BandSpectrogramDiscriminator
from audiotools_tpu.ops.benchmark import device_time

B, T = 16, 16896
print("platform:", jax.devices()[0].platform, flush=True)


def main():
    audio = jnp.asarray(
        (np.random.RandomState(0).randn(B, T) * 0.1).astype(np.float32)
    )

    def fwd_bwd(a, model, params):
        def loss(p):
            feats = model.apply(p, a)
            return sum(
                jnp.sum(jnp.abs(f.astype(jnp.float32))) for f in feats
            )

        val, grads = jax.value_and_grad(loss)(params)
        return val + sum(
            jnp.sum(g) for g in jax.tree_util.tree_leaves(grads)
        )

    for method in ("fft", "matmul"):
        total = 0.0
        for n in (2048, 1024, 512):
            model = BandSpectrogramDiscriminator(n, stft_method=method)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), audio[:1])
            t = device_time(
                lambda a, m=model, pr=params: fwd_bwd(a, m, pr),
                audio, iters=5,
            )
            total += t
            print(f"MRD w={n:4d} {method:6s} fwd+bwd: {t*1e3:7.2f} ms",
                  flush=True)
        print(f"MRD total  {method:6s} fwd+bwd: {total*1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
