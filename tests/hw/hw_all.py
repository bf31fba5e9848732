"""One-shot hardware validation: every TPU-specific fast path, with
PASS/FAIL verdicts. Run on a real chip after kernel or method changes:

    PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_all.py

Covers: Pallas FIR kernel (two tap counts incl. the once-faulting 3723),
matmul STFT/ISTFT/mel, fast loudness meter, overlap-save filter paths,
telescoped equalizer. Prints one line per check; exits nonzero on FAIL.
"""
import sys

import numpy as np

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops import filters as FL
from audiotools_tpu.ops import loudness as L
from audiotools_tpu.ops.pallas_kernels import fir_conv_causal

B, T, SR = 16, 220500, 44100  # small batch keeps total runtime ~3 min
print("platform:", jax.devices()[0].platform, flush=True)
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, T).astype(np.float32) * 0.1)
x3 = x[:, None, :]

failures = []


def check(name, err, tol):
    ok = err < tol
    print(f"{'PASS' if ok else 'FAIL'} {name}: err {err:.2e} (tol {tol:g})", flush=True)
    if not ok:
        failures.append(name)


# 1. Pallas FIR at 1023 (fast meter) and 3723 (alignment regression) taps
for taps_name, h in [
    ("pallas-fir-1023", L._composed_fir(SR, "K-weighting", 512)),
    ("pallas-fir-3723", L._exact_fir(SR, "K-weighting")),
]:
    h = np.asarray(h, np.float32)
    y_p = np.asarray(jax.jit(lambda a: fir_conv_causal(a, h))(x))
    y_r = np.asarray(jax.jit(lambda a: FL.causal_fft_conv1d(a, jnp.asarray(h)))(x))
    check(taps_name, np.abs(y_p - y_r).max() / (np.abs(y_r).max() + 1e-9), 1e-5)

# 2. matmul STFT / ISTFT / mel
s_f = np.asarray(jax.jit(lambda a: jnp.abs(F.stft(a, 2048, 512)))(x))
s_m = np.asarray(jax.jit(lambda a: jnp.abs(F.stft(a, 2048, 512, method="matmul")))(x))
check("matmul-stft", np.abs(s_f - s_m).max() / s_f.max(), 1e-4)

spec = jax.jit(lambda a: F.stft(a, 2048, 512, method="matmul"))(x)
y_i = np.asarray(jax.jit(lambda s: F.istft(s, 2048, 512, length=T, method="matmul"))(spec))
check("matmul-istft-roundtrip", np.abs(y_i - np.asarray(x)).max(), 1e-4)

m_f = np.asarray(jax.jit(lambda a: F.mel_spectrogram(a, SR, 80))(x))
m_m = np.asarray(jax.jit(lambda a: F.mel_spectrogram(a, SR, 80, method="matmul"))(x))
check("matmul-mel", np.abs(m_f - m_m).max() / m_f.max(), 1e-4)

# 3. loudness: fast meter vs exact
ref = np.asarray(jax.jit(lambda a: L.loudness(a, SR))(x3))
fast = np.asarray(
    jax.jit(lambda a: L.loudness(a, SR, use_fir=True, conv_method="pallas"))(x3)
)
check("fast-meter-dLUFS", np.abs(fast - ref).max(), 1e-2)

# 4. overlap-save filters + telescoped equalizer
cut = jnp.asarray(rng.uniform(4000, 16000, B).astype(np.float32))
y_full = np.asarray(jax.jit(lambda a: FL.low_pass(a, cut, SR, block_size=None))(x3))
y_blk = np.asarray(jax.jit(lambda a: FL.low_pass(a, cut, SR))(x3))
check("lowpass-auto-block", np.abs(y_full - y_blk).max() / (np.abs(y_full).max() + 1e-9), 1e-5)

db = jnp.asarray(rng.uniform(-6, 6, (B, 6)).astype(np.float32))


def eq_bands(a):
    bands = FL.split_bands(a, SR, 6)
    return jnp.sum(bands * (10.0 ** db)[:, None, None, :], axis=-1)

e_ref = np.asarray(jax.jit(eq_bands)(x3))
e_new = np.asarray(jax.jit(lambda a: FL.equalizer(a, db, SR))(x3))
check("equalizer-telescoped", np.abs(e_ref - e_new).max() / (np.abs(e_ref).max() + 1e-9), 1e-5)

# batch-1 EQ curve broadcasting over the batched signal exercises the
# kernel materialization on the real pallas path (was a TPU-only crash)
db1 = db[:1]
e_ref1 = np.asarray(
    jax.jit(
        lambda a: jnp.sum(
            FL.split_bands(a, SR, 6) * (10.0 ** db1)[:, None, None, :],
            axis=-1,
        )
    )(x3)
)
e_new1 = np.asarray(jax.jit(lambda a: FL.equalizer(a, db1, SR))(x3))
check(
    "equalizer-batch1-broadcast",
    np.abs(e_ref1 - e_new1).max() / (np.abs(e_ref1).max() + 1e-9),
    1e-5,
)

# 5. vocoder transforms on-chip vs the CPU backend (same float32 code;
# catches TPU-only lowering/precision regressions in the most
# precision-sensitive chain members — phase accumulates over ~430
# frames, so a bad analysis pass shows up as a large relative error)
from audiotools_tpu.ops import stretch as ST

try:
    _cpu = jax.local_devices(backend="cpu")[0]
except RuntimeError:
    _cpu = None
if _cpu is None:
    print("SKIP vocoder-vs-cpu (no cpu backend)", flush=True)
else:
    xs = x3[:2, :, : 2 * SR]
    xs_np = np.asarray(xs)
    for name, fn in [
        ("pitch-shift-vs-cpu", lambda a: ST.pitch_shift(a, 4.0, SR)),
        ("time-stretch-vs-cpu", lambda a: ST.time_stretch(a, 0.8)),
    ]:
        y_tpu = np.asarray(jax.jit(fn)(xs))
        with jax.default_device(_cpu):
            y_cpu = np.asarray(jax.jit(fn)(jnp.asarray(xs_np)))
        # observed ~3e-3 (phase-accumulation noise); this gate caught
        # the resampler's silent bf16 conv default (8.4e-2) — keep the
        # tolerance tight enough to re-catch that class of bug
        err = np.abs(y_tpu - y_cpu).max() / (np.abs(y_cpu).max() + 1e-9)
        check(name, err, 1e-2)

# 6. device STOI vs its CPU-backend values (band envelopes + masked
# gating survive the TPU lowering)
if _cpu is not None:
    from audiotools_tpu.ops import stoi as S

    ref10 = np.asarray(x[:8, : 2 * 10000])
    est10 = ref10 + 0.05 * rng.randn(*ref10.shape).astype(np.float32)
    s_tpu = np.asarray(S.stoi_batch(jnp.asarray(ref10), jnp.asarray(est10)))
    with jax.default_device(_cpu):
        s_cpu = np.asarray(
            S.stoi_batch(jnp.asarray(ref10), jnp.asarray(est10))
        )
    check("stoi-vs-cpu", np.abs(s_tpu - s_cpu).max(), 1e-4)
    e_tpu = np.asarray(
        S.stoi_batch(jnp.asarray(ref10), jnp.asarray(est10), extended=True)
    )
    with jax.default_device(_cpu):
        e_cpu = np.asarray(
            S.stoi_batch(jnp.asarray(ref10), jnp.asarray(est10), extended=True)
        )
    check("estoi-vs-cpu", np.abs(e_tpu - e_cpu).max(), 1e-4)

# 7. device PESQ and NSIM vs their CPU-backend values (full-signal FFT
# filters, delay search argmaxes, Bark/gammatone matmuls survive TPU)
if _cpu is not None:
    from audiotools_tpu.ops import nsim as NS
    from audiotools_tpu.ops import pesq as P

    ref16 = np.asarray(x[:8, : 2 * 16000])
    est16 = ref16 + 0.03 * rng.randn(*ref16.shape).astype(np.float32)
    p_tpu = np.asarray(P.pesq_batch(jnp.asarray(ref16), jnp.asarray(est16)))
    with jax.default_device(_cpu):
        p_cpu = np.asarray(
            P.pesq_batch(jnp.asarray(ref16), jnp.asarray(est16))
        )
    # the +-2 ms fine-delay argmax can tie-break differently across
    # platforms; on aligned pairs it lands on 0 both sides, so the gate
    # is tight in MOS units
    check("pesq-vs-cpu", np.abs(p_tpu - p_cpu).max(), 5e-3)

    n_tpu = np.asarray(
        NS.nsim_batch(jnp.asarray(ref16), jnp.asarray(est16), mode="speech")
    )
    with jax.default_device(_cpu):
        n_cpu = np.asarray(
            NS.nsim_batch(jnp.asarray(ref16), jnp.asarray(est16), mode="speech")
        )
    check("nsim-vs-cpu", np.abs(n_tpu - n_cpu).max(), 1e-3)

print(("ALL PASS" if not failures else f"FAILURES: {failures}"), flush=True)
sys.exit(1 if failures else 0)
