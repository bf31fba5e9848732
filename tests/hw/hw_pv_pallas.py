"""Probe: the phase vocoder as one fused Pallas kernel.

hw_pv_mm.py showed the PV core (7.1-7.4 ms at bench shapes) is bound by
abs/angle/exp transcendentals + HBM passes, not by the interpolation
gathers. A single Pallas kernel reads the four gathered re/im planes
once, does all the transcendental work and the per-row phase cumsum in
VMEM, and writes the two output planes — ~6 plane passes instead of the
XLA graph's ~15, with the atan2/sin/cos cost unchanged (the floor).

Bonus accuracy: the expected per-hop phase advance is reduced mod 2*pi
with exact integer arithmetic ((hop*f) % win) instead of wrapping the
~1.6e3-rad f32 ramp, so high-bin phase steps carry ~1e-7 rad error
instead of ~1e-4.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_pv_pallas.py

RESULT (v5e, 2026-08-19): NEGATIVE — dead on arrival. Mosaic TPU (TC
kernels) has no lowering for atan2 ("Unimplemented primitive ...
atan2"), and the angle-domain PV needs it. Rather than polynomial-
approximating atan2 in-kernel, the finding motivated a better
formulation: the synthesis phase only enters the output through
exp(i*phase), so the angle -> wrap -> cumsum -> cos/sin chain is
algebraically a cumprod of unit cross-spectra — no transcendentals at
all, expressible in plain XLA. See hw_pv_phasor.py and
ops/stretch.py::phase_vocoder(formulation="phasor"). The phasor scan
measured SLOWER in situ (23.0 vs 20.8 ms/leg: two scan planes, 2x HBM
traffic) but diagnosing its 1000x accuracy edge exposed the real bug —
the f32 phi_advance ramp (~1600 rad, 1e-4 ulps) accumulating linearly
through the cumsum — fixed with an exact integer mod-2*pi reduction
(5e-3 -> 2e-5); "angle" stays the default, "phasor" is the
high-precision option (5e-6, log-depth tree-scan rounding).
"""
import functools

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax.experimental import pallas as pl

from audiotools_tpu.ops.benchmark import device_time
from audiotools_tpu.ops.stretch import phase_vocoder

TWO_PI = 2.0 * np.pi


def _pv_kernel(re0_ref, im0_ref, re1_ref, im1_ref, frac_ref, ore_ref, oim_ref,
               *, hop, win, f_blk):
    re0 = re0_ref[0]
    im0 = im0_ref[0]
    re1 = re1_ref[0]
    im1 = im1_ref[0]
    frac = frac_ref[0:1, :]  # (1, N) broadcasts over rows

    mag_t = (1.0 - frac) * jnp.sqrt(re0 * re0 + im0 * im0) + frac * jnp.sqrt(
        re1 * re1 + im1 * im1
    )
    ph0 = jnp.arctan2(im0, re0)
    ph1 = jnp.arctan2(im1, re1)

    # exact phi_advance mod 2*pi: (hop*f) % win in int32, then scale
    f_idx = jax.lax.broadcasted_iota(jnp.int32, re0.shape, 0) + (
        pl.program_id(1) * f_blk
    )
    phim = ((hop * f_idx) % win).astype(jnp.float32) * (TWO_PI / win)

    d = ph1 - ph0 - phim
    d = d - TWO_PI * jnp.round(d / TWO_PI)
    step = phim + d
    step = step - TWO_PI * jnp.round(step / TWO_PI)

    acc = jnp.cumsum(step, axis=-1)
    phase = ph0[:, 0:1] + acc - step  # exclusive cumsum + first frame phase
    ore_ref[0] = mag_t * jnp.cos(phase)
    oim_ref[0] = mag_t * jnp.sin(phase)


def pv_fused(re, im, rate, hop_length, window_length, interpret=False,
             f_blk=128):
    """Fused phase vocoder over real/imag planes ``(B, F, T)`` -> stretched
    planes ``(B, F, n_steps)``."""
    B, F_bins, T = re.shape
    n_steps = int(np.ceil(T / rate))
    steps = np.arange(n_steps) * rate
    i0 = np.minimum(np.floor(steps).astype(np.int64), T - 1)
    i1 = np.minimum(i0 + 1, T - 1)
    frac = (steps - i0).astype(np.float32)

    n_pad = -(-n_steps // 128) * 128
    f_pad = -(-F_bins // f_blk) * f_blk
    i0p = np.concatenate([i0, np.full(n_pad - n_steps, i0[-1], np.int64)])
    i1p = np.concatenate([i1, np.full(n_pad - n_steps, i1[-1], np.int64)])
    fracp = np.concatenate([frac, np.zeros(n_pad - n_steps, np.float32)])

    pads = ((0, 0), (0, f_pad - F_bins), (0, 0))
    re0 = jnp.pad(re[:, :, i0p], pads)
    im0 = jnp.pad(im[:, :, i0p], pads)
    re1 = jnp.pad(re[:, :, i1p], pads)
    im1 = jnp.pad(im[:, :, i1p], pads)
    frac_arr = jnp.broadcast_to(jnp.asarray(fracp)[None, :], (8, n_pad))

    plane = pl.BlockSpec((1, f_blk, n_pad), lambda b, f: (b, f, 0))
    out_re, out_im = pl.pallas_call(
        functools.partial(
            _pv_kernel, hop=hop_length, win=window_length, f_blk=f_blk
        ),
        grid=(B, f_pad // f_blk),
        in_specs=[plane] * 4 + [pl.BlockSpec((8, n_pad), lambda b, f: (0, 0))],
        out_specs=[plane, plane],
        out_shape=[jax.ShapeDtypeStruct((B, f_pad, n_pad), jnp.float32)] * 2,
        interpret=interpret,
    )(re0, im0, re1, im1, frac_arr)
    return out_re[:, :F_bins, :n_steps], out_im[:, :F_bins, :n_steps]


def pv_ref(re, im, rate, hop, win):
    out = phase_vocoder(jax.lax.complex(re, im), rate, hop, win)
    return jnp.real(out), jnp.imag(out)


def pv_oracle64(re, im, rate, hop, win):
    """Float64 host oracle (same algorithm as ops.stretch.phase_vocoder)."""
    spec = re.astype(np.float64) + 1j * im.astype(np.float64)
    F_bins, T = spec.shape[-2], spec.shape[-1]
    n_steps = int(np.ceil(T / rate))
    steps = np.arange(n_steps) * rate
    i0 = np.minimum(np.floor(steps).astype(np.int64), T - 1)
    i1 = np.minimum(i0 + 1, T - 1)
    frac = steps - i0
    mag = np.abs(spec)
    phase = np.angle(spec)
    mag_t = (1.0 - frac) * mag[..., i0] + frac * mag[..., i1]
    phi = TWO_PI * hop * np.arange(F_bins) / win
    d = phase[..., i1] - phase[..., i0] - phi[:, None]
    d -= TWO_PI * np.round(d / TWO_PI)
    step = phi[:, None] + d
    step -= TWO_PI * np.round(step / TWO_PI)
    acc = np.cumsum(step, axis=-1)
    out_phase = phase[..., i0[:1]] + np.concatenate(
        [np.zeros_like(acc[..., :1]), acc[..., :-1]], axis=-1
    )
    return mag_t * np.exp(1j * out_phase)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    HOP, WIN = 512, 2048
    RATE = 2.0 ** (-2.0 / 12.0)  # bench: +2 semitone pitch shift
    B, F_bins, T = 64, 1025, 384

    rng = np.random.RandomState(0)
    re_np = rng.randn(B, F_bins, T).astype(np.float32)
    im_np = rng.randn(B, F_bins, T).astype(np.float32)
    re = jnp.asarray(re_np)
    im = jnp.asarray(im_np)

    # numerics: fused vs f64 oracle vs current implementation (small B)
    oracle = pv_oracle64(re_np[:2], im_np[:2], RATE, HOP, WIN)
    fr, fi = jax.jit(
        lambda a, b: pv_fused(a, b, RATE, HOP, WIN)
    )(re[:2], im[:2])
    rr, ri = jax.jit(lambda a, b: pv_ref(a, b, RATE, HOP, WIN))(re[:2], im[:2])
    scale = np.abs(oracle).max()
    err_fused = max(
        np.abs(np.asarray(fr) - oracle.real).max(),
        np.abs(np.asarray(fi) - oracle.imag).max(),
    ) / scale
    err_ref = max(
        np.abs(np.asarray(rr) - oracle.real).max(),
        np.abs(np.asarray(ri) - oracle.imag).max(),
    ) / scale
    print(f"fused vs f64 oracle rel err: {err_fused:.2e}", flush=True)
    print(f"xla   vs f64 oracle rel err: {err_ref:.2e}", flush=True)

    def run_ref(args):
        return pv_ref(args[0], args[1], RATE, HOP, WIN)

    def run_fused(args):
        return pv_fused(args[0], args[1], RATE, HOP, WIN)

    t_ref = device_time(run_ref, (re, im), iters=5) * 1e3
    print(f"xla PV   (B=64): {t_ref:.3f} ms", flush=True)
    t_fused = device_time(run_fused, (re, im), iters=5) * 1e3
    print(f"fused PV (B=64): {t_fused:.3f} ms", flush=True)
    print("DONE", flush=True)
