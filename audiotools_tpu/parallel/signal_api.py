"""AudioSignal-level entry to the sequence-parallel ops (SURVEY §5.7).

``timeshard`` provides the raw halo-exchange primitives over arrays;
this module lifts them to the public ``AudioSignal`` surface so the
long-signal story is usable without touching shard_map:

    from audiotools_tpu.parallel import make_mesh, shard_signal

    mesh = make_mesh({"sp": 8})
    sig = shard_signal(sig, mesh)          # time axis onto 8 devices
    lufs = sig.loudness(mesh=mesh)         # BS.1770, both gates, psum'd
    sig.stft(mesh=mesh); sig.istft(mesh=mesh)
    sig.resample(16000, mesh=mesh)

Each method matches its single-device counterpart's numerics (pinned in
tests/parallel/test_signal_api.py); the tutorial lives at
docs/tutorials/long_signals.md.
"""
import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def shard_signal(signal, mesh, axis_name: str = "sp"):
    """Place ``signal.audio_data`` time-sharded over ``mesh[axis_name]``.

    The array is laid out ``P(None, None, axis_name)`` — batch and
    channels replicated, time split across devices — which is the layout
    every ``sharded_*`` op and every ``mesh=`` method kwarg expects. The
    cached loudness/STFT are left untouched (the samples themselves are
    unchanged). Returns the same signal for chaining.

    The time length must divide evenly over the axis (the contract all
    timeshard primitives enforce).
    """
    n_dev = mesh.shape[axis_name]
    T = signal.audio_data.shape[-1]
    if T % n_dev:
        raise ValueError(
            f"signal length {T} must divide over {n_dev} '{axis_name}' "
            f"shards; zero_pad to a multiple first"
        )
    sharding = NamedSharding(mesh, P(None, None, axis_name))
    # bypass the audio_data setter: the samples are unchanged, so the
    # cached loudness stays valid
    signal._audio_data = jax.device_put(signal.audio_data, sharding)
    return signal
