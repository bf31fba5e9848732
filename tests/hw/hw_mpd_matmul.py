"""A/B the MPD columns: XLA conv vs framed-matmul formulation, fwd+bwd.

hw_adv_profile.py localized the adversarial step's bound to the D
backward (~27.5 ms = 3x fwd): XLA lowers the stride-3 (5,1)-kernel
weight-normed convs' wgrad poorly. The resunit finding (hw_resunit_*)
was that narrow-channel conv backward loses to plain matmuls; this
probe tests the same trick here — frame the time axis with a STATIC
index matrix (T_out, 5) and contract with the kernel as one einsum, so
the backward becomes matmul transposes.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_mpd_matmul.py

RESULT (v5e via axon tunnel, 2026-08-19): NEGATIVE, and it relocates
the bound —
    MPD conv (weight-norm) fwd+bwd, all 5 periods:  6.13 ms
    MPD conv (no weight-norm)                    :  7.91 ms
    MPD framed-matmul                            : 13.97 ms  (2.3x worse)
The MPD is NOT where the D-update's ~46 ms lives (the resunit matmul
trick does not transfer: these stride-3 convs already lower well, and
weight-norm even helps by shrinking the wgrad into the normalized
basis). By elimination the cost is the MRD band-split stacks — see
hw_mrd_probe.py.
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

from audiotools_tpu.models.discriminators import PeriodDiscriminator, _LEAK
from audiotools_tpu.ops.benchmark import device_time

B, T = 16, 16896
print("platform:", jax.devices()[0].platform, flush=True)


class FramedPeriodDiscriminator(nn.Module):
    """PeriodDiscriminator with every (5,1) conv evaluated as a framed
    einsum (identical parameter tree: kernels stay (5,1,cin,cout))."""

    period: int
    channels: tuple = (32, 128, 512, 1024)

    @staticmethod
    def _framed_conv(x, kernel, stride):
        # x: (B, T, P, C); kernel: (5, 1, C, F); SAME padding, stride
        # along time only — taps gathered by a static numpy index matrix
        k = kernel.shape[0]
        Bn, Tn, P, C = x.shape
        t_out = -(-Tn // stride)
        pad_total = max((t_out - 1) * stride + k - Tn, 0)
        lo = pad_total // 2
        xp = jnp.pad(x, ((0, 0), (lo, pad_total - lo), (0, 0), (0, 0)))
        idx = (
            np.arange(t_out, dtype=np.int32)[:, None] * stride
            + np.arange(k, dtype=np.int32)[None, :]
        )
        frames = xp[:, idx]  # (B, t_out, k, P, C)
        return jnp.einsum("btkpc,kcf->btpf", frames, kernel[:, 0])

    @nn.compact
    def __call__(self, x):
        Bn, Tn = x.shape
        p = self.period
        pad = (p - Tn % p) % p
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad)), mode="edge")
        h = x.reshape(Bn, -1, p, 1)
        feats = []
        cin = 1
        for ch in self.channels:
            kernel = self.param(
                f"k{len(feats)}", nn.initializers.lecun_normal(),
                (5, 1, cin, ch),
            )
            h = nn.leaky_relu(self._framed_conv(h, kernel, 3), _LEAK)
            feats.append(h)
            cin = ch
        kernel = self.param(
            "k_tail", nn.initializers.lecun_normal(), (5, 1, cin, cin)
        )
        h = nn.leaky_relu(self._framed_conv(h, kernel, 1), _LEAK)
        feats.append(h)
        kernel = self.param(
            "k_head", nn.initializers.lecun_normal(), (3, 1, cin, 1)
        )
        feats.append(self._framed_conv(h, kernel, 1))
        return feats


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

    variants = (
        ("conv     ", PeriodDiscriminator, dict(weight_norm=True)),
        ("conv-nown", PeriodDiscriminator, dict(weight_norm=False)),
        ("matmul   ", FramedPeriodDiscriminator, {}),
    )
    for label, cls, kwargs in variants:
        total = 0.0
        for p in (2, 3, 5, 7, 11):
            model = cls(p, **kwargs)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), audio[:1])
            t = device_time(
                lambda a, m=model, pr=params: fwd_bwd(a, m, pr),
                audio, iters=5,
            )
            total += t
        print(
            f"MPD {label} fwd+bwd all periods: {total*1e3:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
