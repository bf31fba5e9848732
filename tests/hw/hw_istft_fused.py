"""A/B the fused Pallas istft synthesis against the XLA matmul paths.

hw_istft_parts.py split the istft at time_stretch shapes: iDFT matmul
5.64 ms (f32, at the MXU f32 ceiling) + overlap-add 2.61 ms + envelope
0.13 ms; the bench chain runs the bf16 synthesis (~2.8 ms matmul) so
the OLA + envelope HBM round-trips are ~half its istft. The fused
kernel (pallas_kernels.istft_synthesis_fused) computes iDFT matmul,
OLA and envelope divide in one pass — frames never touch HBM.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_istft_fused.py

RESULT (v5e via axon tunnel, 2026-08-19): NEUTRAL — XLA got there first.
    fused vs f32 matmul rel err: 1.75e-03  (bf16-level, as designed)
    istft matmul            : 6.03 ms   (f32, matches parts probe's matmul)
    istft matmul_bf16       : 2.50 ms   <- XLA fuses OLA + envelope into
                                           the bf16 synthesis program;
                                           the 8.4 ms sum-of-parts in
                                           hw_istft_parts.py was an
                                           artifact of timing the stages
                                           as separate programs
    istft matmul_bf16_fused : 2.55 ms   (the Pallas kernel: same speed)
    pitch leg bf16          : 15.43 ms | fused: 16.08 ms (prev-block
                                          overlap reads cost ~0.6 ms)
The hand-fused kernel exactly matches XLA's own fusion on speed — kept
as an OPTION because it never materializes the (B, nt, n_fft) frame
tensor (peak-HBM win for long-signal synthesis), but the bench chain
stays on matmul_bf16. Lesson recorded: sum-of-parts probes on XLA
over-attribute — each stage timed alone pays materialization the fused
program never does.
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

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

B, T, SR = 64, 220500, 44100
WIN, HOP = 2048, 512
print("platform:", jax.devices()[0].platform, flush=True)

rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)
spec = jax.jit(lambda a: F.stft(a, WIN, HOP, method="matmul"))(x)
out_len = T

# --- accuracy gate on hardware (vs the f32 matmul path) ---
ref = jax.jit(
    lambda s: F.istft(s, WIN, HOP, length=out_len, method="matmul")
)(spec[:2])
got = jax.jit(
    lambda s: F.istft(s, WIN, HOP, length=out_len, method="matmul_bf16_fused")
)(spec[:2])
scale = float(jnp.abs(ref).max())
err = float(jnp.abs(got - ref).max()) / scale
print(f"fused vs f32 matmul rel err: {err:.2e}", flush=True)
assert err < 8e-3, err

for method in ("matmul", "matmul_bf16", "matmul_bf16_fused"):
    t = device_time(
        lambda s, m=method: F.istft(s, WIN, HOP, length=out_len, method=m),
        spec, iters=10,
    )
    print(f"istft {method:18s}: {t*1e3:6.2f} ms", flush=True)

# --- full pitch leg with the fused synthesis ---
for synth in ("matmul_bf16", "matmul_bf16_fused"):
    t = device_time(
        lambda a, sm=synth: S.pitch_shift(
            a, 2.0, SR, synthesis_method=sm, pv_formulation="phasor_fused"
        ),
        x, iters=10,
    )
    print(f"pitch leg synth={synth:18s}: {t*1e3:6.2f} ms", flush=True)
