"""A/B the fused Pallas phase-vocoder kernel against the XLA paths.

The phasor formulation is transcendental-free but HBM-bound in XLA (two
scan planes); pallas_kernels.phase_vocoder_fused keeps the whole
rotation scan in VMEM (time on sublanes, rows on lanes, per-step dynamic
sublane loads). This probe times the PV core and the full pitch_shift
leg at bench shapes and checks accuracy against the angle path.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_pv_fused.py

RESULT (v5e via axon tunnel, 2026-08-19): POSITIVE — the lever the r3
roadmap recorded as "fused PV (~3 ms ceiling)" delivers more:
    PV core  angle        :  5.96 ms   (the r3 default)
    PV core  phasor (XLA) : 11.22 ms   (HBM-bound scan planes)
    PV core  phasor_fused :  2.77 ms   (2.2x vs angle)
    pitch leg angle       : 20.65 ms
    pitch leg phasor_fused: 15.58 ms   (-5.1 ms on the bench chain leg)
    accuracy fused vs angle: 2.5e-05 rel (b2 random spec; the fused
    sequential scan sits between angle's 2e-5 and tree-phasor's 5e-6
    against the f64 oracle)
The win is HBM traffic: the XLA paths materialize mag/phase/gather/scan
planes; the kernel streams (T, rows) blocks once and keeps the rotation
scan in VMEM. bench.py's chain uses pv_formulation="phasor_fused".
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

from audiotools_tpu.ops import stretch as S
from audiotools_tpu.ops.benchmark import device_time

print("platform:", jax.devices()[0].platform, flush=True)

# bench pitch-shift shapes: +2 semitones on b64 x 5 s @ 44.1k resamples
# first (rate < 1), so the vocoder sees ~196k samples -> 384 frames
B, F_bins, T = 64, 1025, 384
rate = 2.0 ** (-2.0 / 12.0)
rng = np.random.RandomState(0)
re = jnp.asarray(rng.randn(B, F_bins, T).astype(np.float32))
im = jnp.asarray(rng.randn(B, F_bins, T).astype(np.float32))


def run(formulation):
    def core(r):
        out = S.phase_vocoder(
            jax.lax.complex(r, im), rate, 512, 2048, formulation=formulation
        )
        return jnp.real(out) + jnp.imag(out)

    return device_time(core, re, iters=10)


# accuracy cross-check on device (fetch stacked real/imag)
def eval_form(formulation):
    f = jax.jit(
        lambda r, i: (
            lambda z: jnp.stack([jnp.real(z), jnp.imag(z)])
        )(S.phase_vocoder(jax.lax.complex(r, i), rate, 512, 2048,
                          formulation=formulation))
    )
    return np.asarray(f(re[:2], im[:2]))

want = eval_form("angle")
got = eval_form("phasor_fused")
err = np.abs(got - want).max() / np.abs(want).max()
print(f"fused vs angle rel err (b2): {err:.2e}", flush=True)
assert err < 1e-4

for form in ("angle", "phasor", "phasor_fused"):
    t = run(form)
    print(f"PV core {form:13s}: {t*1e3:7.2f} ms", flush=True)

# full pitch-shift leg (analysis + PV + synthesis + resample)
audio = jnp.asarray(rng.randn(B, 1, 220500).astype(np.float32) * 0.1)
for form in ("angle", "phasor_fused"):
    t = device_time(
        lambda a: S.pitch_shift(
            a, 2.0, 44100, synthesis_method="matmul_bf16", pv_formulation=form
        ),
        audio, iters=5,
    )
    print(f"pitch leg {form:13s}: {t*1e3:7.2f} ms", flush=True)
