from . import util
from .signal import AudioSignal, STFTParams
from .loudness import Meter
