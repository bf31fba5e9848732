"""Codec training step: the DAC-style loop from the reference's north-star
benchmark (BASELINE.json config 5): host loader -> on-TPU augment ->
model -> multi-scale STFT + mel + waveform losses, as one jitted SPMD
program over a device mesh.
"""
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import AudioSignal
from ..metrics.distance import l1_loss
from ..metrics.spectral import MelSpectrogramLoss, MultiScaleSTFTLoss

LOSS_WEIGHTS = {
    "waveform": 1.0,
    "mel": 15.0,
    "stft": 1.0,
    "vq/commitment_loss": 0.25,
    "vq/codebook_loss": 1.0,
}


def codec_loss(
    model, params, audio: jnp.ndarray, sample_rate: int,
    return_recon: bool = False,
):
    """Reconstruction + VQ losses for a codec batch ``(B, 1, T)``.

    ``return_recon=True`` additionally returns the reconstruction, so an
    adversarial step can reuse the single generator forward pass (see
    ``models.adversarial``)."""
    out = model.apply(params, audio)
    recon = out["audio"]

    est = AudioSignal(recon, sample_rate)
    ref = AudioSignal(audio, sample_rate)

    mel_loss = MelSpectrogramLoss()(est.clone(), ref.clone())
    stft_loss = MultiScaleSTFTLoss()(est.clone(), ref.clone())
    wav_loss = l1_loss(recon, audio)

    loss = (
        LOSS_WEIGHTS["waveform"] * wav_loss
        + LOSS_WEIGHTS["mel"] * mel_loss
        + LOSS_WEIGHTS["stft"] * stft_loss
        + LOSS_WEIGHTS["vq/commitment_loss"] * out["vq/commitment_loss"]
        + LOSS_WEIGHTS["vq/codebook_loss"] * out["vq/codebook_loss"]
    )
    metrics = {
        "loss": loss,
        "loss/waveform": wav_loss,
        "loss/mel": mel_loss,
        "loss/stft": stft_loss,
        "loss/commitment": out["vq/commitment_loss"],
        "loss/codebook": out["vq/codebook_loss"],
    }
    if return_recon:
        return loss, metrics, recon
    return loss, metrics


def make_train_step(model, optimizer, sample_rate: int):
    """Build a jittable ``(params, opt_state, audio) -> (params, opt_state,
    metrics)`` training step."""

    def train_step(params, opt_state, audio):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: codec_loss(model, p, audio, sample_rate), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return train_step


def shard_params_rules(mesh, tensor_axis: str = "tp"):
    """Partition rules for model parallelism: conv/dense kernels sharded on
    their output-feature dimension over the tensor axis (when divisible),
    biases/codebooks replicated. GSPMD propagates these through the network
    and inserts the ICI collectives."""
    tp_size = dict(zip(mesh.axis_names, mesh.devices.shape))[tensor_axis]

    def spec_for(path: str, leaf):
        if (
            leaf.ndim >= 2
            and ("Conv" in path or "Dense" in path or "proj" in path)
            and leaf.shape[-1] % tp_size == 0
            and leaf.shape[-1] >= tp_size
        ):
            spec = [None] * leaf.ndim
            spec[-1] = tensor_axis
            return P(*spec)
        return P()

    return spec_for


def shard_params(params, mesh, tensor_axis: str = "tp"):
    """Place a parameter pytree with output-channel sharding over
    ``tensor_axis`` (and replication elsewhere)."""
    spec_for = shard_params_rules(mesh, tensor_axis)
    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = []
    for path, leaf in flat[0]:
        name = jax.tree_util.keystr(path)
        leaves.append(
            jax.device_put(leaf, NamedSharding(mesh, spec_for(name, leaf)))
        )
    return jax.tree_util.tree_unflatten(flat[1], leaves)
