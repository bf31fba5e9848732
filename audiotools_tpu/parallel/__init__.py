from .mesh import make_mesh
from .signal_api import shard_signal
from .timeshard import (
    sharded_fir_conv,
    sharded_frames,
    sharded_istft,
    sharded_loudness,
    sharded_resample,
    sharded_stft,
)
