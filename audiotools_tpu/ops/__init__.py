"""Pure, jittable DSP kernels (the TPU compute substrate).

Everything here is a function over jnp arrays with static configuration —
no AudioSignal objects, no host I/O — so whole pipelines (augment chain +
feature extraction + losses) compile into single XLA programs.
"""
from . import fft
from . import filters
from . import loudness
from . import nsim
from . import pesq
from . import resample
from . import stoi
from . import stretch
