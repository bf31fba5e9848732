from . import dac
from . import train
from .dac import DAC
