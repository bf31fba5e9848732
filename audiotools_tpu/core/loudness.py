"""Loudness meter class + mixin.

Mirror of `/root/reference/audiotools/core/loudness.py`; the math lives in
``ops/loudness.py`` as pure jittable functions, this module provides the
reference-shaped ``Meter`` object API and the ``LoudnessMixin``.
"""
import jax.numpy as jnp

from ..ops import loudness as loudness_ops


class Meter:
    """Tensorized ITU-R BS.1770-4 meter (reference loudness.py:11-260).

    Parameters
    ----------
    rate : int
        Audio sample rate in Hz.
    filter_class : str, optional
        Weighting filter class: "K-weighting" (default), "Fenton/Lee 1",
        "Fenton/Lee 2", "Dash et al.".
    block_size : float, optional
        Gating block size in seconds, by default 0.400.
    zeros : int, optional
        Taps in the truncated-FIR approximation, by default 512.
    use_fir : bool, optional
        Use the 512-tap FIR approximation (bit-level parity with the
        reference's GPU meter) instead of the exact cascade via block
        state-space lifting (``ops.filters.iir_cascade_blocked`` — also
        the faster path on TPU), by default False.
    """

    def __init__(
        self, rate: int, filter_class: str = "K-weighting",
        block_size: float = 0.400, zeros: int = 512, use_fir: bool = False,
    ):
        self.rate = rate
        self.filter_class = filter_class
        self.block_size = block_size
        self.zeros = zeros
        self.use_fir = use_fir

    @property
    def filters(self):
        """Per-stage ``(b, a, passband_gain)`` coefficients."""
        return [
            (b, a, g) for (b, a), g in loudness_ops.design_filters(self.rate, self.filter_class)
        ]

    def apply_filter(self, data):
        """Apply the weighting cascade to ``(nb, nt, nch)`` data."""
        data = jnp.asarray(data)
        if data.ndim == 2:
            data = data[None]
        out = loudness_ops.apply_k_weighting(
            jnp.swapaxes(data, -1, -2),
            self.rate,
            self.filter_class,
            self.use_fir,
            self.zeros,
        )
        return jnp.swapaxes(out, -1, -2)

    # aliases matching the reference's internal names
    apply_filter_gpu = apply_filter
    apply_filter_cpu = apply_filter

    def integrated_loudness(self, data):
        """Integrated gated loudness of ``(nb, nt, nch)`` data
        (reference loudness.py:176-247)."""
        out = loudness_ops.integrated_loudness(
            jnp.asarray(data),
            self.rate,
            filter_class=self.filter_class,
            block_size=self.block_size,
            use_fir=self.use_fir,
            zeros=self.zeros,
        )
        if out.shape == (1,):
            return out[0]
        return out

    def __call__(self, data):
        return self.integrated_loudness(data)

    forward = __call__


class LoudnessMixin:
    _loudness = None
    MIN_LOUDNESS = loudness_ops.MIN_LOUDNESS
    """Minimum loudness possible."""

    def loudness(
        self,
        filter_class: str = "K-weighting",
        block_size: float = 0.400,
        mesh=None,
        axis_name: str = "sp",
        **kwargs,
    ):
        """Integrated gated loudness per ITU-R BS.1770-4, cached on the
        signal (reference loudness.py:268-320). Returns shape ``(nb,)``.

        ``mesh``: a ``jax.sharding.Mesh`` routes the meter through the
        sequence-parallel path (``parallel.timeshard.sharded_loudness``)
        for signals time-sharded over ``mesh[axis_name]`` — both BS.1770
        gates run with one psum round each, matching this method's
        single-device numerics (see docs/tutorials/long_signals.md).
        """
        if self._loudness is not None:
            return self._loudness
        if mesh is not None:
            from ..parallel.timeshard import sharded_loudness

            loudness = jnp.maximum(
                sharded_loudness(
                    self.audio_data,
                    self.sample_rate,
                    mesh,
                    axis_name=axis_name,
                    filter_class=filter_class,
                    block_size=block_size,
                ),
                loudness_ops.MIN_LOUDNESS,
            )
        else:
            loudness = loudness_ops.loudness(
                self.audio_data,
                self.sample_rate,
                filter_class=filter_class,
                block_size=block_size,
                **kwargs,
            )
        self._loudness = loudness
        return self._loudness
