"""Polyphase dgrad for the MRD's stride-(1,2) convs.

hw_mrd_wgrad.py localized the D-backward bound to the DGRAD chain
(+4 ms over a 1.9 ms forward per window stack; wgrad is free). XLA
computes the dx of a strided conv as an interior-dilated conv
(lhs_dilation=2), which TPU handles poorly. Polyphase identity: for
stride 2 on the freq axis,

    dx_pad[u, 2 v' + r] = sum_{i, t} w[i, r + 2 t] dy[u - i, v' - t]

so dx splits into one DENSE stride-1 full correlation of dy per phase
r (subkernels w[:, r::2], channel-transposed, spatially flipped),
re-interleaved by a (L, 2) reshape — no dilation, no scatter.

This probe: (1) numerics of polyphase dx vs autodiff on MRD shapes;
(2) stack A/B at PRODUCTION precision: flax baseline vs custom_vjp conv
(XLA fwd, polyphase dx, native-vjp dw).

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_mrd_dgrad.py

RESULT (v5e via axon tunnel, 2026-08-19): NEGATIVE, twice over —
    polyphase dx: exact (rel err <= 1.5e-7 on all MRD shapes)
    w2048 flax 5.76 | custom-vjp xla-dgrad 5.58 | poly-dgrad  9.02 ms
    w1024 flax 5.39 | custom-vjp xla-dgrad 5.78 | poly-dgrad  8.38 ms
    w512  flax 3.38 | custom-vjp xla-dgrad 5.19 | poly-dgrad  9.14 ms
    totals:   14.52 |                     16.55 |            26.54 ms
(1) Polyphase dgrad is 60% WORSE than XLA's interior-dilated dx: XLA's
dgrad lowering for these stride-(1,2) convs was already at its optimum
(the dilation is fused into the conv tiling; splitting into two
phase convs halves each matmul's freq extent below the tile size and
pays the stack/interleave traffic). (2) Even routing dx/dw through
custom_vjp with BOTH pieces delegated back to jax.vjp costs ~2 ms per
stack (remat of the weight-norm inside the vjp closures).

CONCLUSION for the adversarial-step axis: with hw_adv_bf16 (bf16 D: 0%),
hw_adv_profile (paired calls: -18%), hw_mpd_matmul (framed MPD: -2.3x),
hw_mrd_probe (matmul STFT: adopted, ~neutral; band packing: reasoned
negative), hw_mrd_im2col (-110x), hw_mrd_wgrad (wgrad is FREE;
shifted-einsum wgrad -40%), and this probe (polyphase dgrad -60%), the
D update is measured to be at XLA's lowering optimum for the published
MPD+MRD architecture: its backward cost is flop/elementwise-intrinsic
(dgrad ~ 2x fwd with free wgrad), not a lowering artifact. Remaining
headroom would need a fully fused Pallas band-stack fwd+bwd — est.
ceiling ~10 ms of the 148.9 ms step for 15 hand-written kernel pairs —
recorded as not worth the risk/maintenance at this payoff.
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
        x, w, strides, "SAME", dimension_numbers=DN
    )


def dgrad_polyphase(dy, w, x_shape, strides):
    """dx of ``_conv`` with strides (1, sw): one dense stride-1 conv per
    freq phase of the kernel + reshape interleave."""
    kh, kw, cin, cout = w.shape
    sh, sw = strides
    assert sh == 1
    Bn, H, W, C = x_shape
    Ho, plh, phh = _pad_lohi(H, kh, 1)
    Wo, plw, phw = _pad_lohi(W, kw, sw)
    Wpad = W + plw + phw

    phases = []
    widths = []
    for r in range(sw):
        w_r = w[:, r::sw]  # (kh, kt_r, cin, cout)
        kt_r = w_r.shape[1]
        # full correlation of dy with the flipped, channel-transposed
        # subkernel: output (B, H + kh - 1, Wo + kt_r - 1, cin)
        wT = jnp.flip(w_r, (0, 1)).transpose(0, 1, 3, 2)
        dx_r = jax.lax.conv_general_dilated(
            dy, wT, (1, 1),
            ((kh - 1, kh - 1), (kt_r - 1, kt_r - 1)),
            dimension_numbers=DN,
        )
        phases.append(dx_r)
        widths.append(dx_r.shape[2])

    L = max(widths)
    phases = [
        jnp.pad(p, ((0, 0), (0, 0), (0, L - p.shape[2]), (0, 0)))
        for p in phases
    ]
    inter = jnp.stack(phases, axis=3)  # (B, Hf, L, sw, cin)
    inter = inter.reshape(inter.shape[0], inter.shape[1], L * sw, cin)
    return inter[:, plh : plh + H, plw : plw + W, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv_pd(x, w, strides):
    return _conv(x, w, strides)


def _conv_pd_fwd(x, w, strides):
    return _conv(x, w, strides), (x, w)


def _conv_pd_bwd(strides, res, dy):
    x, w = res
    _, vjp_w = jax.vjp(lambda ww: _conv(x, ww, strides), w)
    (dw,) = vjp_w(dy)  # native wgrad (measured free)
    if strides == (1, 1):
        _, vjp_x = jax.vjp(lambda xx: _conv(xx, w, strides), x)
        (dx,) = vjp_x(dy)
    else:
        dx = dgrad_polyphase(dy, w, x.shape, strides)
    return dx, dw


conv_pd.defvjp(_conv_pd_fwd, _conv_pd_bwd)


class ConvWN(nn.Module):
    features: int
    kernel: tuple
    strides: tuple = (1, 1)
    poly_dgrad: bool = False

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
        y = (conv_pd if self.poly_dgrad else _conv)(x, w, self.strides)
        return y + b


class BandStack(nn.Module):
    window_length: int
    channels: int = 32
    bands: tuple = BAND_SPLITS
    poly_dgrad: bool = False

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
                    poly_dgrad=self.poly_dgrad,
                )(h)
                h = nn.leaky_relu(h, _LEAK)
                feats.append(h)
            h = ConvWN(
                self.channels, (3, 3), poly_dgrad=self.poly_dgrad
            )(h)
            h = nn.leaky_relu(h, _LEAK)
            feats.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)
        logits = ConvWN(1, (3, 3), poly_dgrad=self.poly_dgrad)(h)
        feats.append(logits)
        return feats


def main():
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, T) * 0.1).astype(np.float32))

    # ---- numerics on a few MRD shapes ----
    for (Hh, Ww, ci) in ((33, 103, 2), (33, 103, 32), (132, 13, 32)):
        xs = jnp.asarray(rng.randn(2, Hh, Ww, ci).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 9, ci, 32).astype(np.float32) * 0.05)
        f_ref = lambda xx: jnp.sum(jnp.sin(_conv(xx, w, (1, 2))))
        f_new = lambda xx: jnp.sum(jnp.sin(conv_pd(xx, w, (1, 2))))
        dx_ref = jax.grad(f_ref)(xs)
        dx_new = jax.grad(f_new)(xs)
        err = float(
            jnp.abs(dx_ref - dx_new).max() / (jnp.abs(dx_ref).max() + 1e-30)
        )
        print(f"polyphase dx ({Hh},{Ww},{ci}): rel err {err:.2e}", flush=True)

    # ---- stack A/B at production precision ----
    def fwd_bwd(a, m, p):
        def loss(pp):
            return sum(
                jnp.sum(jnp.abs(f.astype(jnp.float32))) for f in m.apply(pp, a)
            )

        val, gr = jax.value_and_grad(loss)(p)
        return val + sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(gr))

    base_tot = 0.0
    for win in (2048, 1024, 512):
        m0 = BandSpectrogramDiscriminator(win)
        p0 = jax.jit(m0.init)(jax.random.PRNGKey(0), audio[:1])
        t0 = device_time(lambda a, m=m0, p=p0: fwd_bwd(a, m, p), audio, iters=5)
        base_tot += t0
        print(f"w{win} flax baseline : {t0*1e3:6.2f} ms", flush=True)

    tot = {False: 0.0, True: 0.0}
    for win in (2048, 1024, 512):
        for pd in (False, True):
            m = BandStack(win, poly_dgrad=pd)
            p = jax.jit(m.init)(jax.random.PRNGKey(0), audio[:1])
            t = device_time(
                lambda a, m=m, p=p: fwd_bwd(a, m, p), audio, iters=5
            )
            tot[pd] += t
            tag = "poly-dgrad" if pd else "xla-dgrad "
            print(f"w{win} {tag}    : {t*1e3:6.2f} ms", flush=True)
    print(
        f"totals: flax {base_tot*1e3:6.2f} | xla-dgrad {tot[False]*1e3:6.2f}"
        f" | poly-dgrad {tot[True]*1e3:6.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
