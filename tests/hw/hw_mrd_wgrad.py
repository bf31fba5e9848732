"""Split the MRD backward: dgrad vs wgrad, and a shifted-einsum wgrad.

hw_adv_profile.py measured D bwd ~3x fwd; hw_mrd_im2col.py killed
tensor-level im2col (the dx slice-transpose is catastrophic). This
probe isolates WHERE the backward time lives:

1. per-window stack timings: fwd only / grad-wrt-input (dgrad chain
   only) / grad-wrt-params (dgrad chain + all wgrads). The difference
   between (2) and (3) is the total wgrad cost.
2. single-layer micro A/B on representative MRD shapes: XLA's native
   conv wgrad vs the same contraction as 27 batched shifted einsums
   (contraction axis B*Ho*Wo, outputs (27, Cin, Cout) — reads strided
   slices, never writes them, so the im2col dx disaster is sidestepped).
3. if (2) wins: full band-stack with a custom_vjp conv (XLA fwd, XLA
   dgrad, shifted-einsum wgrad).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_mrd_wgrad.py

RESULT (v5e via axon tunnel, 2026-08-19):
    custom wgrad max rel err: 5.0e-07
    w2048: fwd 1.95 | +dgrad 6.03 | +wgrad 5.79 ms (wgrad share ~0)
    w512 : fwd 1.83 | +dgrad 5.59 | +wgrad 6.02 ms (wgrad share ~0.4)
    stacks (NOTE: HIGHEST precision here, ~7x the production default):
      xla-wgrad total 130.6 ms | shifted-einsum total 182.7 ms
TWO findings: (1) the wgrad is FREE — grad-wrt-params costs the same
as grad-wrt-input, so XLA's conv wgrad is NOT the D-backward bound and
the shifted-einsum wgrad is a NEGATIVE (-40%; stack A/B above, both
legs HIGHEST so the comparison holds). (2) The bound is the DGRAD
chain: +4 ms over a 1.9 ms forward per window stack. The stride-(1,2)
convs' dx is an interior-dilated conv on TPU — attacked separately in
hw_mrd_dgrad.py (polyphase dgrad: kernel split by freq phase, two
dense stride-1 convs on dy, reshape-interleave; no dilation).
Incidental: the production stacks run DEFAULT conv precision (bf16
passes) — explains why hw_adv_bf16's explicit bf16 cast moved nothing.
"""
import functools
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audiotools_tpu.models.discriminators import (
    BAND_SPLITS,
    BandSpectrogramDiscriminator,
    _LEAK,
)
from audiotools_tpu.ops import fft as _fft
from audiotools_tpu.ops.benchmark import device_time

B, T = 16, 16896
print("platform:", jax.devices()[0].platform, flush=True)

DN = ("NHWC", "HWIO", "NHWC")


def _pad_lohi(size, k, s):
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return out, total // 2, total - total // 2


def _conv(x, w, strides):
    return jax.lax.conv_general_dilated(
        x, w, strides, "SAME", dimension_numbers=DN,
        precision=jax.lax.Precision.HIGHEST,
    )


def wgrad_shifted(x, dy, kshape, strides):
    """dL/dw of _conv as kh*kw batched einsums over strided read-slices."""
    kh, kw, cin, cout = kshape
    sh, sw = strides
    Bn, H, W, C = x.shape
    Ho, plh, phh = _pad_lohi(H, kh, sh)
    Wo, plw, phw = _pad_lohi(W, kw, sw)
    xp = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)))
    slices = [
        xp[:, i : i + (Ho - 1) * sh + 1 : sh, j : j + (Wo - 1) * sw + 1 : sw, :]
        for i in range(kh)
        for j in range(kw)
    ]
    xs = jnp.stack(slices)  # (kh*kw, B, Ho, Wo, Cin)
    dw = jnp.einsum(
        "kbhwc,bhwd->kcd", xs, dy, precision=jax.lax.Precision.HIGHEST
    )
    return dw.reshape(kh, kw, cin, cout)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_cw(x, w, strides):
    return _conv(x, w, strides)


def _conv_cw_fwd(x, w, strides):
    return _conv(x, w, strides), (x, w)


def _conv_cw_bwd(strides, res, dy):
    x, w = res
    _, vjp_x = jax.vjp(lambda xx: _conv(xx, w, strides), x)
    (dx,) = vjp_x(dy)
    dw = wgrad_shifted(x, dy, w.shape, strides)
    return dx, dw


conv_cw.defvjp(_conv_cw_fwd, _conv_cw_bwd)


class ConvWN(nn.Module):
    """Weight-normalized conv with a switchable wgrad formulation."""

    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    custom_wgrad: bool = False

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        v = self.param(
            "v", nn.initializers.lecun_normal(), (kh, kw, cin, self.features)
        )
        g = self.param("g", nn.initializers.ones, (self.features,))
        b = self.param("b", nn.initializers.zeros, (self.features,))
        w = v * (g / jnp.sqrt((v * v).sum((0, 1, 2)) + 1e-12))
        if self.custom_wgrad:
            y = conv_cw(x, w, self.strides)
        else:
            y = _conv(x, w, self.strides)
        return y + b


class BandStack(nn.Module):
    window_length: int
    channels: int = 32
    bands: tuple = BAND_SPLITS
    custom_wgrad: bool = False

    @nn.compact
    def __call__(self, x):
        hop = self.window_length // 4
        spec = _fft.stft(x, self.window_length, hop, "hann", method="matmul")
        img = jnp.stack([jnp.real(spec), jnp.imag(spec)], axis=-1)
        img = jnp.swapaxes(img, 1, 2)
        n_bins = img.shape[2]
        edges = [int(round(f * n_bins)) for f, _ in self.bands] + [n_bins]
        feats, outs = [], []
        for bnd in range(len(self.bands)):
            h = img[:, :, edges[bnd] : edges[bnd + 1], :]
            for i in range(4):
                h = ConvWN(
                    self.channels, (3, 9), (1, 2) if i else (1, 1),
                    custom_wgrad=self.custom_wgrad,
                )(h)
                h = nn.leaky_relu(h, _LEAK)
                feats.append(h)
            h = ConvWN(
                self.channels, (3, 3), custom_wgrad=self.custom_wgrad
            )(h)
            h = nn.leaky_relu(h, _LEAK)
            feats.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)
        logits = ConvWN(1, (3, 3), custom_wgrad=self.custom_wgrad)(h)
        feats.append(logits)
        return feats


def main():
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, T) * 0.1).astype(np.float32))

    # ---- numerics: custom wgrad == autodiff wgrad ----
    xs = jnp.asarray(rng.randn(2, 33, 103, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 9, 32, 32).astype(np.float32) * 0.05)
    dy = jnp.asarray(rng.randn(2, 33, 52, 32).astype(np.float32))
    g_ref = jax.grad(lambda ww: jnp.vdot(_conv(xs, ww, (1, 2)), dy))(w)
    g_new = jax.grad(lambda ww: jnp.vdot(conv_cw(xs, ww, (1, 2)), dy))(w)
    print(
        "custom wgrad max err:",
        float(jnp.abs(g_ref - g_new).max() / jnp.abs(g_ref).max()),
        flush=True,
    )

    # ---- 1. dgrad vs wgrad split on the production stacks ----
    for win in (2048, 512):
        m = BandSpectrogramDiscriminator(win)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), audio[:1])

        def fwd_only(a, m=m, p=p):
            return sum(
                jnp.sum(jnp.abs(f.astype(jnp.float32))) for f in m.apply(p, a)
            )

        def dgrad_only(a, m=m, p=p):
            return jax.grad(
                lambda aa: sum(
                    jnp.sum(jnp.abs(f.astype(jnp.float32)))
                    for f in m.apply(p, aa)
                )
            )(a).sum() * 1e-6 + a.sum() * 0.0

        def full_grad(a, m=m, p=p):
            def loss(pp):
                return sum(
                    jnp.sum(jnp.abs(f.astype(jnp.float32)))
                    for f in m.apply(pp, a)
                )

            val, gr = jax.value_and_grad(loss)(p)
            return val + sum(
                jnp.sum(g) for g in jax.tree_util.tree_leaves(gr)
            )

        t_f = device_time(fwd_only, audio, iters=5)
        t_d = device_time(dgrad_only, audio, iters=5)
        t_p = device_time(full_grad, audio, iters=5)
        print(
            f"w{win}: fwd {t_f*1e3:6.2f} | +dgrad {t_d*1e3:6.2f} | "
            f"+wgrad {t_p*1e3:6.2f} ms (wgrad share ~{(t_p-t_d)*1e3:5.2f})",
            flush=True,
        )

    # ---- 2/3. full stacks: XLA wgrad vs shifted-einsum wgrad ----
    def fwd_bwd(a, m, p):
        def loss(pp):
            return sum(
                jnp.sum(jnp.abs(f.astype(jnp.float32))) for f in m.apply(pp, a)
            )

        val, gr = jax.value_and_grad(loss)(p)
        return val + sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(gr))

    tot = {False: 0.0, True: 0.0}
    for win in (2048, 1024, 512):
        for cw in (False, True):
            m = BandStack(win, custom_wgrad=cw)
            p = jax.jit(m.init)(jax.random.PRNGKey(0), audio[:1])
            t = device_time(
                lambda a, m=m, p=p: fwd_bwd(a, m, p), audio, iters=5
            )
            tot[cw] += t
            tag = "shifted-einsum" if cw else "xla-wgrad     "
            print(f"w{win} {tag}: {t*1e3:6.2f} ms", flush=True)
    print(
        f"total: xla {tot[False]*1e3:6.2f} ms | shifted {tot[True]*1e3:6.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
