"""A/B the MRD band stacks: XLA conv vs im2col-matmul formulation.

hw_mrd_probe.py put the D-update bound in the MRD band stacks: 15 conv
stacks of ch=32 (3,9) convs, ~16.7 ms fwd+bwd per input, at <1% of the
MXU's flop peak — the 32-channel contraction uses a quarter of the
MXU's 128 lanes and XLA's wgrad for these shapes is ~3x the forward.
The MPD framed-matmul probe (hw_mpd_matmul.py) was NEGATIVE, but those
convs are wide (512-1024 ch) and stride-3; these are narrow (2-32 ch),
where the resunit finding (hw_resunit_matmul.py: matmul wins at C<=64)
should transfer.

im2col here: pad + 27 static strided slices stacked on the feature
axis -> (B, Ht, Wf, 27*C) @ (27*C, C_out) — contraction 864 wide
(7 MXU tiles deep), and the backward is two matmul transposes with a
slice-add transpose for dx.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_mrd_im2col.py

RESULT (v5e via axon tunnel, 2026-08-19): CATASTROPHIC NEGATIVE —
    w2048: conv fwd+bwd  6.38 ms | im2col 394.16 ms
    w1024: conv fwd+bwd  5.21 ms | im2col 652.00 ms
    w512 : conv fwd+bwd  5.84 ms | im2col 862.75 ms   (~110x worse)
im2col's forward matches the conv bit-for-bit (0.0 max err), but its
backward is the transpose of 27 strided slices = 27 interior-dilated
pad-and-accumulate ops per conv per band, and XLA-TPU lowers each one
as its own full-tensor pass (cost scales with frame count: w512 is the
worst). The resunit matmul trick does NOT transfer to these 2-D
stride-(1,2) stacks. Do not retry tensor-level im2col here; the
follow-up (hw_mrd_wgrad.py) instead splits the dgrad/wgrad cost and
replaces only the weight gradient.
"""
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


def _same_pad(size, k, s):
    out = -(-size // s)
    total = max((out - 1) * s + k - size, 0)
    return out, total // 2, total - total // 2


def im2col(x, kh, kw, sh, sw):
    """(B, H, W, C) -> (B, Ho, Wo, kh*kw*C) by static strided slices
    (SAME padding, matching flax.linen.Conv)."""
    Bn, H, W, C = x.shape
    Ho, plh, phh = _same_pad(H, kh, sh)
    Wo, plw, phw = _same_pad(W, kw, sw)
    x = jnp.pad(x, ((0, 0), (plh, phh), (plw, phw), (0, 0)))
    cols = []
    for i in range(kh):
        for j in range(kw):
            cols.append(x[:, i : i + (Ho - 1) * sh + 1 : sh,
                          j : j + (Wo - 1) * sw + 1 : sw, :])
    return jnp.concatenate(cols, axis=-1)


class ConvIm2col(nn.Module):
    """Weight-normalized 2-D conv evaluated as an im2col matmul.
    Same math as nn.WeightNorm(nn.Conv) (norm over all axes but cout)."""

    features: int
    kernel: tuple
    strides: tuple = (1, 1)

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
        patches = im2col(x, kh, kw, *self.strides)
        return patches @ w.reshape(-1, self.features) + b


class BandStackIm2col(nn.Module):
    """One MRD column with every conv in im2col-matmul form."""

    window_length: int
    channels: int = 32
    bands: tuple = BAND_SPLITS

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
                h = ConvIm2col(
                    self.channels, (3, 9), (1, 2) if i else (1, 1)
                )(h)
                h = nn.leaky_relu(h, _LEAK)
                feats.append(h)
            h = ConvIm2col(self.channels, (3, 3))(h)
            h = nn.leaky_relu(h, _LEAK)
            feats.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)
        logits = ConvIm2col(1, (3, 3))(h)
        feats.append(logits)
        return feats


def fwd_bwd(a, model, params):
    """Loss fwd + grads wrt params, summed into one scalar (the
    hw_mrd_probe.py shape, so numbers compare directly)."""

    def loss(p):
        feats = model.apply(p, a)
        return sum(jnp.sum(jnp.abs(f.astype(jnp.float32))) for f in feats)

    val, grads = jax.value_and_grad(loss)(params)
    return val + sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))


def main():
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, T) * 0.1).astype(np.float32))

    # numerics: im2col == lax conv on one (3,9) stride-(1,2) layer
    xs = jnp.asarray(rng.randn(2, 33, 103, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 9, 32, 32).astype(np.float32) * 0.05)
    ref = jax.lax.conv_general_dilated(
        xs, w, (1, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    got = im2col(xs, 3, 9, 1, 2) @ w.reshape(-1, 32)
    print("im2col vs conv:", float(jnp.abs(ref - got).max()), flush=True)

    tot0 = tot1 = 0.0
    for win in (2048, 1024, 512):
        base = BandSpectrogramDiscriminator(win)
        p0 = jax.jit(base.init)(jax.random.PRNGKey(0), audio[:1])
        t0 = device_time(
            lambda a, m=base, pr=p0: fwd_bwd(a, m, pr), audio, iters=5
        )
        var = BandStackIm2col(win)
        p1 = jax.jit(var.init)(jax.random.PRNGKey(0), audio[:1])
        t1 = device_time(
            lambda a, m=var, pr=p1: fwd_bwd(a, m, pr), audio, iters=5
        )
        tot0 += t0
        tot1 += t1
        print(
            f"w{win}: conv fwd+bwd {t0*1e3:6.2f} ms | im2col {t1*1e3:6.2f} ms",
            flush=True,
        )
    print(f"total: conv {tot0*1e3:6.2f} ms | im2col {tot1*1e3:6.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
