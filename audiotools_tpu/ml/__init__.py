from . import decorators
from . import layers
from . import profiling
from .accelerator import Accelerator
from .checkpoint import Checkpointer
from .experiment import Experiment
from .layers import BaseModel
