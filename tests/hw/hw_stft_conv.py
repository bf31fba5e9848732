"""Probe: STFT as one strided conv / ISTFT as one transposed conv.

The matmul STFT materializes frames (228 MB at batch-64 x 5 s), runs two
MXU matmuls, and transposes the output (direct DFT matmul alone: 3.26 ms;
full stft(method="matmul"): 5.85 ms -> ~2.6 ms of framing/transpose
overhead, hw_mxu_stft.py). Lowering the whole thing as
conv_general_dilated(kernel=window-fused DFT, stride=hop) fuses
framing + window + DFT + output layout into a single XLA conv; the ISTFT
counterpart (lhs_dilation=hop) additionally fuses overlap-add.
Correctness pinned at 7e-7 on CPU (both vs the matmul paths).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 590 python tests/hw/hw_stft_conv.py
"""
import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

from audiotools_tpu.ops import fft as F
from audiotools_tpu.ops.benchmark import device_time
from audiotools_tpu.ops.fft import _dft_matrices, _idft_matrices, get_window

print("platform:", jax.devices()[0].platform, flush=True)

B, T = 64, 220500
WIN, HOP = 2048, 512
rng = np.random.RandomState(0)
x = jnp.asarray(rng.randn(B, 1, T).astype(np.float32) * 0.1)

def ms(fn, arg, iters=5):
    print("  compiling...", flush=True)
    return device_time(fn, arg, iters=iters) * 1e3

print(f"stft matmul (current): {ms(lambda a: F.stft(a, WIN, HOP, 'hann', method='matmul'), x):.2f} ms", flush=True)

C, S = _dft_matrices("hann", WIN)
K_np = np.concatenate([C, S], axis=1).T[:, None, :].copy()  # (2nf, 1, n_fft)
NF = WIN // 2 + 1


def stft_conv(a, precision=jax.lax.Precision.HIGH):
    length = a.shape[-1]
    xx = a.reshape(-1, 1, length)
    cpad = WIN // 2
    xx = jnp.pad(xx, ((0, 0), (0, 0), (cpad, cpad)), mode="reflect")
    out = lax.conv_general_dilated(
        xx, jnp.asarray(K_np), window_strides=(HOP,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"), precision=precision,
    )
    return lax.complex(out[:, :NF], out[:, NF:]).reshape(
        a.shape[:-1] + (NF, out.shape[-1])
    )


print(f"stft conv [HIGH]: {ms(stft_conv, x):.2f} ms", flush=True)
print(f"stft conv [DEFAULT]: {ms(lambda a: stft_conv(a, jax.lax.Precision.DEFAULT), x):.2f} ms", flush=True)


def pull_c(fn, arg):
    out = np.asarray(
        jax.jit(lambda a: jnp.stack([jnp.real(fn(a)), jnp.imag(fn(a))]))(arg)
    )
    return out[0] + 1j * out[1]


ref = pull_c(lambda a: F.stft(a, WIN, HOP, "hann", method="matmul")[:1], x)
got = pull_c(lambda a: stft_conv(a)[:1], x)
print(f"stft conv err vs matmul: {np.abs(got - ref).max() / np.abs(ref).max():.2e}", flush=True)

spec = jax.jit(lambda a: F.stft(a, WIN, HOP, "hann", method="matmul"))(x)
NT = spec.shape[-1]
print(f"spec frames: {NT}", flush=True)

print(f"istft matmul (current): {ms(lambda s: F.istft(s, WIN, HOP, 'hann', length=T, method='matmul'), spec):.2f} ms", flush=True)

Ci, Si = _idft_matrices("hann", WIN)
Kt_np = np.concatenate([Ci, Si], axis=0)[:, None, ::-1].copy()  # (2nf, 1, n_fft)


def istft_conv(s, precision=jax.lax.Precision.HIGH):
    nf, nt = s.shape[-2], s.shape[-1]
    ss = s.reshape(-1, nf, nt)
    feats = jnp.concatenate([jnp.real(ss), jnp.imag(ss)], axis=1)
    out = lax.conv_general_dilated(
        feats, jnp.asarray(Kt_np), window_strides=(1,),
        padding=[(WIN - 1, WIN - 1)], lhs_dilation=(HOP,),
        dimension_numbers=("NCH", "IOH", "NCH"), precision=precision,
    )
    out_len = WIN + HOP * (nt - 1)
    y = out[:, 0, :out_len]
    wsq = get_window("hann", WIN).astype(np.float64) ** 2
    norm = np.zeros(out_len, dtype=np.float64)
    for i in range(nt):
        norm[i * HOP : i * HOP + WIN] += wsq
    y = y / jnp.asarray(np.where(norm > 1e-11, norm, 1.0).astype(np.float32))
    cpad = WIN // 2
    y = y[:, cpad : cpad + T]
    return y.reshape(s.shape[:-2] + (T,))


print(f"istft conv [HIGH]: {ms(istft_conv, spec):.2f} ms", flush=True)
print(f"istft conv [DEFAULT]: {ms(lambda s: istft_conv(s, jax.lax.Precision.DEFAULT), spec):.2f} ms", flush=True)

ref_y = np.asarray(jax.jit(lambda s: F.istft(s, WIN, HOP, "hann", length=T, method="matmul")[:1])(spec))
got_y = np.asarray(jax.jit(lambda s: istft_conv(s)[:1])(spec))
print(f"istft conv err vs matmul: {np.abs(got_y - ref_y).max() / np.abs(ref_y).max():.2e}", flush=True)

print("DONE", flush=True)

# RESULT (v5e, 2026-08-17): stft matmul 6.17 ms; stft-as-strided-conv
# 17.28 ms [HIGH] / 11.83 [DEFAULT]; istft-as-transposed-conv 5112 ms(!)
# [HIGH] — XLA lowers the 2048-wide-kernel strided conv without MXU
# im2col tiling, and the lhs-dilated transposed conv is catastrophic.
# NEGATIVE: the framed-matmul formulation stays.
