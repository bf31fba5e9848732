from . import distance
from . import quality
from . import spectral
