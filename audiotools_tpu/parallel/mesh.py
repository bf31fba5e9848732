"""Mesh construction helpers."""
import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(shape: dict = None) -> Mesh:
    """Build a mesh from an ``{axis: size}`` spec over available devices.

    ``make_mesh({"dp": 4, "sp": 2})`` -> 4x2 mesh. Defaults to a 1-D
    ``{"dp": n_devices}`` data mesh. Sizes must multiply to at most the
    device count; -1 means "fill with the remaining devices".
    """
    devices = np.array(jax.devices())
    if shape is None:
        return Mesh(devices, ("dp",))
    axes = list(shape.keys())
    sizes = list(shape.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    total = int(np.prod(sizes))
    return Mesh(devices[:total].reshape(sizes), tuple(axes))
