from . import adversarial
from . import artifacts
from . import dac
from . import discriminators
from . import streaming
from . import train
from .artifacts import compress, decompress, load_artifact, save_artifact
from .dac import DAC
from .discriminators import Discriminator
from .streaming import (
    StreamingDecoder,
    StreamingEncoder,
    stream_decode,
    stream_encode,
)
