"""audiotools_tpu: a TPU-native audio processing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
descriptinc/audiotools (object-oriented audio DSP, perceptual loudness,
GPU-style augmentation pipelines, datasets, losses and training
utilities), designed for TPU: batched device arrays, fused compiled
kernels, SPMD data parallelism over device meshes, and host-side async
I/O. See SURVEY.md at the repo root for the architecture map.

Top-level surface mirrors the reference's
(`/root/reference/audiotools/__init__.py`).
"""
__version__ = "0.1.0"

from .core import AudioSignal
from .core import STFTParams
from .core import Meter
from .core import util
from . import ops
from . import io
from . import metrics
from . import data
from . import ml
from .data import datasets
from .data import transforms
