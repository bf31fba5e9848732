"""Waveform distance losses (mirror of
`/root/reference/audiotools/metrics/distance.py`), as pure jittable
callables over AudioSignals or arrays."""
import jax.numpy as jnp

from ..core import AudioSignal

__all__ = ["L1Loss", "SISDRLoss", "l1_loss", "sisdr_loss"]


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(x - y).mean()


class L1Loss:
    """L1 loss between any attribute of two AudioSignals
    (reference distance.py:7-42).

    Parameters
    ----------
    attribute : str
        Attribute of the signal to compare, default ``audio_data``.
    weight : float
        Weight of this loss, default 1.0.
    """

    def __init__(self, attribute: str = "audio_data", weight: float = 1.0):
        self.attribute = attribute
        self.weight = weight

    def __call__(self, x, y):
        if isinstance(x, AudioSignal):
            x = getattr(x, self.attribute)
            y = getattr(y, self.attribute)
        return l1_loss(x, y)

    forward = __call__


def sisdr_loss(
    references: jnp.ndarray,
    estimates: jnp.ndarray,
    scaling: bool = True,
    reduction: str = "mean",
    zero_mean: bool = True,
    clip_min: float = None,
) -> jnp.ndarray:
    """Negative scale-invariant SDR (reference distance.py:45-131)."""
    eps = 1e-8
    nb = references.shape[0]
    references = references.reshape(nb, 1, -1).transpose(0, 2, 1)
    estimates = estimates.reshape(nb, 1, -1).transpose(0, 2, 1)

    if zero_mean:
        mean_reference = references.mean(axis=1, keepdims=True)
        mean_estimate = estimates.mean(axis=1, keepdims=True)
    else:
        mean_reference = 0
        mean_estimate = 0

    _references = references - mean_reference
    _estimates = estimates - mean_estimate

    references_projection = (_references**2).sum(axis=-2) + eps
    references_on_estimates = (_estimates * _references).sum(axis=-2) + eps

    scale = (
        (references_on_estimates / references_projection)[:, None]
        if scaling
        else 1
    )

    e_true = scale * _references
    e_res = _estimates - e_true

    signal = (e_true**2).sum(axis=1)
    noise = (e_res**2).sum(axis=1)
    sdr = -10 * jnp.log10(signal / noise + eps)

    if clip_min is not None:
        sdr = jnp.maximum(sdr, clip_min)

    if reduction == "mean":
        sdr = sdr.mean()
    elif reduction == "sum":
        sdr = sdr.sum()
    return sdr


class SISDRLoss:
    """Scale-invariant source-to-distortion ratio loss
    (reference distance.py:45-131)."""

    def __init__(
        self,
        scaling: bool = True,
        reduction: str = "mean",
        zero_mean: bool = True,
        clip_min: float = None,
        weight: float = 1.0,
    ):
        self.scaling = scaling
        self.reduction = reduction
        self.zero_mean = zero_mean
        self.clip_min = clip_min
        self.weight = weight

    def __call__(self, x, y):
        if isinstance(x, AudioSignal):
            references = x.audio_data
            estimates = y.audio_data
        else:
            references = x
            estimates = y
        return sisdr_loss(
            references,
            estimates,
            scaling=self.scaling,
            reduction=self.reduction,
            zero_mean=self.zero_mean,
            clip_min=self.clip_min,
        )

    forward = __call__
