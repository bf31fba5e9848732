from . import decorators
from . import layers
from .accelerator import Accelerator
from .experiment import Experiment
from .layers import BaseModel
