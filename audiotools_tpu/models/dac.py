"""DAC-style neural audio codec (the framework's flagship model).

The reference library ships no model code — it is the *toolkit* used to
train codecs like Descript's DAC (SURVEY.md §2: "no transformer model code
exists at all"); its north-star benchmark is a DAC-style codec training
loop (BASELINE.json config 5). This module provides that model natively:
a convolutional encoder/decoder with Snake activations and residual vector
quantization, written in flax and designed to shard over a
``jax.sharding.Mesh`` (batch on the data axis, conv channels on the tensor
axis — GSPMD inserts the collectives).

Architecture follows the published DAC recipe (encoder rates [2,4,8,8],
dilated residual units, factorized 8-d codebook lookups with L2-normalized
codes, straight-through estimation), implemented from scratch in JAX.
"""
import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ml.layers.base import BaseModel


def snake(x: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """Snake activation: ``x + sin^2(alpha x)/alpha`` (periodic inductive
    bias for audio)."""
    return x + (1.0 / (alpha + 1e-9)) * jnp.sin(alpha * x) ** 2


class Snake(nn.Module):
    """Channelwise-parameterized snake activation."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param(
            "alpha", lambda key: jnp.ones((1, 1, self.channels), jnp.float32)
        )
        return snake(x, alpha.astype(x.dtype))


class _ShiftedConv(nn.Module):
    """SAME-padded odd-kernel 1-D conv as k statically-shifted matmuls.

    Parameter tree is identical to ``nn.Conv``'s (``kernel`` of shape
    ``(k, in, out)`` + ``bias``), so a module can swap formulations over
    the same checkpoint. Rationale (measured, tests/hw/hw_resunit_matmul.py,
    v5e): expressing the k=7 dilated conv as shifted ``(T, C) @ (C, C)``
    dots makes the *forward* slower than XLA's conv lowering, but the
    autodiff backward — plain matmul transposes instead of XLA's
    conv-transpose gradient — is enough faster that fwd+bwd wins. Hence
    ``ResidualUnit`` only uses this under ``formulation="matmul"``, which
    the training step opts into; inference keeps the conv lowering.
    """

    features: int
    kernel_size: int
    kernel_dilation: int = 1
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if k % 2 != 1:
            raise ValueError("_ShiftedConv supports odd kernel sizes only")
        kernel = self.param(
            "kernel", self.kernel_init, (k, x.shape[-1], self.features)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        dtype = self.dtype if self.dtype is not None else x.dtype
        x = x.astype(dtype)
        kernel = kernel.astype(dtype)
        acc = bias.astype(dtype)
        if k == 1:
            return jnp.einsum("btc,cf->btf", x, kernel[0]) + acc
        pad = (k // 2) * self.kernel_dilation
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        T = x.shape[1]
        for i in range(k):
            # static start index -> a plain slice, never a gather
            acc = acc + jnp.einsum(
                "btc,cf->btf",
                jax.lax.dynamic_slice_in_dim(xp, i * self.kernel_dilation, T, 1),
                kernel[i],
            )
        return acc


class ResidualUnit(nn.Module):
    """Dilated residual unit: snake -> dilated conv(7) -> snake -> conv(1).

    ``formulation="matmul"`` lowers both convs as shifted matmuls (same
    parameter tree; see ``_ShiftedConv``) — faster under ``jax.grad``,
    slower forward-only, so training opts in and inference does not.
    """

    dim: int
    dilation: int = 1
    dtype: Any = None
    formulation: str = "conv"

    def _use_matmul(self):
        # "hybrid": shifted matmuls only at the narrow stages (C<=64),
        # where the sequence is long and XLA's conv backward is at its
        # worst (v5e: 12.8 -> 11.3 ms fwd+bwd for the C=64 unit chain,
        # tests/hw/hw_resunit_matmul.py); the wide stages keep the conv
        # lowering, which wins there (93 ms vs 68 ms full step when
        # matmul is forced everywhere, tests/hw/hw_resunit_step.py).
        return self.formulation == "matmul" or (
            self.formulation == "hybrid" and self.dim <= 64
        )

    @nn.compact
    def __call__(self, x):
        y = Snake(self.dim)(x)
        if self._use_matmul():
            y = _ShiftedConv(
                self.dim, 7, self.dilation, dtype=self.dtype, name="Conv_0"
            )(y)
        else:
            y = nn.Conv(
                self.dim,
                kernel_size=(7,),
                kernel_dilation=(self.dilation,),
                padding="SAME",
                dtype=self.dtype,
                name="Conv_0",
            )(y)
        y = Snake(self.dim)(y)
        # near-zero init on the residual projection keeps the unit close
        # to identity at init (activation variance doesn't compound
        # through the stack) while still passing gradients everywhere
        if self._use_matmul():
            y = _ShiftedConv(
                self.dim,
                1,
                kernel_init=nn.initializers.normal(1e-2),
                dtype=self.dtype,
                name="Conv_1",
            )(y)
        else:
            y = nn.Conv(
                self.dim,
                kernel_size=(1,),
                kernel_init=nn.initializers.normal(1e-2),
                dtype=self.dtype,
                name="Conv_1",
            )(y)
        return x + y


class EncoderBlock(nn.Module):
    dim: int
    stride: int
    dtype: Any = None
    formulation: str = "conv"

    @nn.compact
    def __call__(self, x):
        for dilation in (1, 3, 9):
            x = ResidualUnit(
                self.dim // 2, dilation, dtype=self.dtype,
                formulation=self.formulation,
            )(x)
        x = Snake(self.dim // 2)(x)
        x = nn.Conv(
            self.dim,
            kernel_size=(2 * self.stride,),
            strides=(self.stride,),
            padding=((math.ceil(self.stride / 2),) * 2,),
            dtype=self.dtype,
        )(x)
        return x


class DecoderBlock(nn.Module):
    dim: int
    stride: int
    dtype: Any = None
    formulation: str = "conv"

    @nn.compact
    def __call__(self, x):
        x = Snake(x.shape[-1])(x)
        x = nn.ConvTranspose(
            self.dim,
            kernel_size=(2 * self.stride,),
            strides=(self.stride,),
            padding="SAME",
            dtype=self.dtype,
        )(x)
        for dilation in (1, 3, 9):
            x = ResidualUnit(
                self.dim, dilation, dtype=self.dtype,
                formulation=self.formulation,
            )(x)
        return x


class Encoder(nn.Module):
    d_model: int = 64
    strides: Sequence[int] = (2, 4, 8, 8)
    latent_dim: int = 256
    dtype: Any = None
    formulation: str = "conv"

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 1)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        d = self.d_model
        x = nn.Conv(d, kernel_size=(7,), padding="SAME", dtype=self.dtype)(x)
        for stride in self.strides:
            d *= 2
            x = EncoderBlock(d, stride, dtype=self.dtype,
                             formulation=self.formulation)(x)
        x = Snake(d)(x)
        x = nn.Conv(
            self.latent_dim, kernel_size=(3,), padding="SAME", dtype=self.dtype
        )(x)
        # latents return to f32 for the quantizer's codebook math
        return x.astype(jnp.float32)


class Decoder(nn.Module):
    d_model: int = 1024
    strides: Sequence[int] = (8, 8, 4, 2)
    dtype: Any = None
    formulation: str = "conv"

    @nn.compact
    def __call__(self, z):
        if self.dtype is not None:
            z = z.astype(self.dtype)
        x = nn.Conv(
            self.d_model, kernel_size=(7,), padding="SAME", dtype=self.dtype
        )(z)
        d = self.d_model
        for stride in self.strides:
            d //= 2
            x = DecoderBlock(d, stride, dtype=self.dtype,
                             formulation=self.formulation)(x)
        x = Snake(d)(x)
        x = nn.Conv(1, kernel_size=(7,), padding="SAME", dtype=self.dtype)(x)
        x = jnp.tanh(x)
        # waveform returns to f32 for the loss stack
        return x.astype(jnp.float32)


class VectorQuantize(nn.Module):
    """One stage of residual VQ with factorized, L2-normalized codebook
    lookups and straight-through estimation."""

    input_dim: int
    codebook_size: int = 1024
    codebook_dim: int = 8

    def setup(self):
        # attribute names become the flax scopes, matching the previous
        # nn.compact name= declarations exactly (checkpoints unchanged)
        self.in_proj = nn.Dense(self.codebook_dim)
        self.out_proj = nn.Dense(self.input_dim)
        self.codebook_embed = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
        )

    def __call__(self, z):
        # z: (B, T, D)
        z_e = self.in_proj(z)
        codebook = self.codebook_embed

        # L2-normalized code lookup
        z_n = z_e / (jnp.linalg.norm(z_e, axis=-1, keepdims=True) + 1e-8)
        c_n = codebook / (
            jnp.linalg.norm(codebook, axis=-1, keepdims=True) + 1e-8
        )
        # cosine distance -> argmax of similarity (MXU matmul)
        sim = jnp.einsum(
            "btd,kd->btk", z_n, c_n, precision=jax.lax.Precision.HIGHEST
        )
        indices = jnp.argmax(sim, axis=-1)  # (B, T)
        z_q = jnp.take(codebook, indices, axis=0)  # (B, T, cdim)

        commitment_loss = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
        codebook_loss = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)

        # straight-through
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        z_q = self.out_proj(z_q)
        return z_q, indices, commitment_loss, codebook_loss

    def from_code(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Stage codes ``(B, T)`` -> this stage's latent contribution
        ``(B, T, input_dim)`` (codebook lookup + output projection)."""
        z_q = jnp.take(self.codebook_embed, indices, axis=0)
        return self.out_proj(z_q)


class ResidualVectorQuantize(nn.Module):
    """Cascade of VQ stages quantizing the residual."""

    input_dim: int = 256
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8

    def setup(self):
        # setattr so each stage's scope is "quantizer_{i}", matching the
        # previous nn.compact name= declarations (checkpoints unchanged)
        for i in range(self.n_codebooks):
            setattr(
                self,
                f"quantizer_{i}",
                VectorQuantize(
                    self.input_dim, self.codebook_size, self.codebook_dim
                ),
            )

    def _stage(self, i) -> VectorQuantize:
        return getattr(self, f"quantizer_{i}")

    def __call__(self, z, n_quantizers: int = None):
        if n_quantizers is None:
            n_quantizers = self.n_codebooks
        z_q = jnp.zeros_like(z)
        residual = z
        commitment_loss = 0.0
        codebook_loss = 0.0
        codes = []
        for i in range(self.n_codebooks):
            if i >= n_quantizers:
                break
            z_q_i, idx, commit, cb = self._stage(i)(residual)
            z_q = z_q + z_q_i
            residual = residual - z_q_i
            commitment_loss += commit
            codebook_loss += cb
            codes.append(idx)
        codes = jnp.stack(codes, axis=1)  # (B, n_q, T)
        return z_q, codes, commitment_loss, codebook_loss

    def from_codes(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Codes ``(B, n_q, T)`` -> quantized latents ``(B, T, D)``.

        ``n_q`` may be any prefix of the codebook cascade (bitrate
        scalability: decoding fewer stages gives a coarser
        reconstruction)."""
        n_q = codes.shape[1]
        z_q = 0.0
        for i in range(min(n_q, self.n_codebooks)):
            z_q = z_q + self._stage(i).from_code(codes[:, i])
        return z_q


class DAC(BaseModel):
    """Descript-style audio codec (encoder + RVQ + decoder).

    Parameters follow the published 44.1 kHz DAC configuration by default;
    scale ``encoder_dim``/``decoder_dim`` down for toy runs.
    """

    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 8, 8)
    latent_dim: int = 256
    decoder_dim: int = 1024
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    sample_rate: int = 44100
    dtype: Any = None
    """Compute dtype for encoder/decoder convs (e.g. ``jnp.bfloat16`` for
    mixed precision; params stay float32 and the quantizer/loss run in
    float32 regardless)."""
    formulation: str = "conv"
    """Residual-unit conv lowering: ``"conv"`` (XLA conv — fastest
    forward-only) or ``"matmul"`` (shifted matmuls — fastest under
    ``jax.grad``; same parameter tree, so checkpoints interchange)."""

    @property
    def hop_length(self):
        return int(np.prod(self.encoder_rates))

    def setup(self):
        self.encoder = Encoder(
            self.encoder_dim, tuple(self.encoder_rates), self.latent_dim,
            dtype=self.dtype, formulation=self.formulation,
        )
        self.quantizer = ResidualVectorQuantize(
            self.latent_dim, self.n_codebooks, self.codebook_size, self.codebook_dim
        )
        self.decoder = Decoder(
            self.decoder_dim, tuple(reversed(self.encoder_rates)),
            dtype=self.dtype, formulation=self.formulation,
        )

    def __call__(self, audio: jnp.ndarray, n_quantizers: int = None):
        """Full forward pass.

        Parameters
        ----------
        audio : (B, 1, T) or (B, T) waveform.

        Returns
        -------
        dict with ``audio`` (B, 1, T), ``z``, ``codes``,
        ``vq/commitment_loss``, ``vq/codebook_loss``.
        """
        if audio.ndim == 3:
            x = jnp.swapaxes(audio, 1, 2)  # (B, T, C)
        else:
            x = audio[..., None]
        T = x.shape[1]
        # pad to a multiple of the hop length
        hop = self.hop_length
        pad = (hop - T % hop) % hop
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

        z = self.encoder(x)
        z_q, codes, commitment_loss, codebook_loss = self.quantizer(
            z, n_quantizers
        )
        recon = self.decoder(z_q)  # (B, T', 1)
        recon = jnp.swapaxes(recon, 1, 2)[..., :T]

        return {
            "audio": recon,
            "z": z_q,
            "codes": codes,
            "vq/commitment_loss": commitment_loss,
            "vq/codebook_loss": codebook_loss,
        }

    def encode(self, audio: jnp.ndarray, n_quantizers: int = None):
        """Waveform -> quantized latents + codes (optionally truncating
        the codebook cascade to ``n_quantizers`` stages).

        Runs encoder + quantizer only — unlike the full forward, the
        decoder is never touched, which matters for eager compress()
        calls (each eager TPU dispatch is seconds over the tunnel and
        the decoder is the dominant cost)."""
        if audio.ndim == 3:
            x = jnp.swapaxes(audio, 1, 2)  # (B, T, C)
        else:
            x = audio[..., None]
        # pad to a multiple of the hop length (same as __call__)
        hop = self.hop_length
        pad = (hop - x.shape[1] % hop) % hop
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

        z = self.encoder(x)
        z_q, codes, _, _ = self.quantizer(z, n_quantizers)
        return z_q, codes

    def decode_from_latents(self, z_q: jnp.ndarray):
        recon = self.decoder(z_q)
        return jnp.swapaxes(recon, 1, 2)

    def decode_from_codes(self, codes: jnp.ndarray):
        """Stored integer codes ``(B, n_q, T_codes)`` -> waveform
        ``(B, 1, T)`` — the codec *decompress* path (codes are what a
        user persists; latents are an intermediate). ``n_q`` may be any
        prefix of the cascade for bitrate-scalable decoding.

        >>> z, codes = model.apply(params, audio, method=DAC.encode)
        >>> audio2 = model.apply(params, codes, method=DAC.decode_from_codes)
        """
        z_q = self.quantizer.from_codes(codes)
        return self.decode_from_latents(z_q)
