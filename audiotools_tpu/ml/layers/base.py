"""BaseModel: portable save/load for flax models (mirror of
`/root/reference/audiotools/ml/layers/base.py`).

The reference uses ``torch.package`` to ship code + weights in one file
(base.py:188-235). The equivalent here: models are ``flax.linen`` modules
whose constructor kwargs (dataclass fields) are captured automatically, and
``package=True`` bundles the *source code of the defining module* alongside
the weights, so ``load`` can re-materialize the class even where the
original import path doesn't exist.

Weights are serialized with ``flax.serialization`` (msgpack) — framework
portable, no pickle of arrays.
"""
import dataclasses
import importlib
import inspect
import pickle
import sys
import types
import typing
from pathlib import Path

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _capture_kwargs(model: nn.Module) -> dict:
    """Constructor kwargs of a linen module (dataclass fields), mirroring
    the reference's signature introspection (base.py:543-558)."""
    args = {}
    for field in dataclasses.fields(model):
        if field.name in ("parent", "name"):
            continue
        try:
            args[field.name] = getattr(model, field.name)
        except AttributeError:
            pass
    return args


def _params_to_numpy(params):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), params)


class BaseModel(nn.Module):
    """A ``flax.linen.Module`` with portable save/load
    (reference base.py:51-328).

    >>> class Model(ml.BaseModel):
    >>>     hidden: int = 8
    >>>     @nn.compact
    >>>     def __call__(self, x):
    >>>         return nn.Dense(self.hidden)(x)
    >>>
    >>> model = Model()
    >>> params = model.init(jax.random.PRNGKey(0), x)
    >>> model.save("model.pth", params)
    >>> model2, params2 = Model.load("model.pth")
    """

    def save(
        self,
        path: str,
        params=None,
        metadata: dict = None,
        package: bool = True,
    ):
        """Save the model: constructor kwargs + weights (+ source code when
        ``package=True``), reference base.py:506-569."""
        metadata = {} if metadata is None else dict(metadata)
        metadata["kwargs"] = _capture_kwargs(self)

        blob = {
            "class_name": type(self).__name__,
            "class_module": type(self).__module__,
            "metadata": metadata,
            "params": flax.serialization.to_bytes(_params_to_numpy(params))
            if params is not None
            else None,
        }
        if package:
            try:
                blob["source"] = inspect.getsource(sys.modules[type(self).__module__])
            except (OSError, TypeError, KeyError):
                blob["source"] = None

        with open(path, "wb") as f:
            pickle.dump(blob, f)
        return path

    @classmethod
    def load(
        cls, location: str, *args,
        package_name: str = None, strict: bool = False, **kwargs,
    ):
        """Load (model, params) from a file saved by ``save``
        (reference base.py:579-626). If the class can't be found on the
        import path and source was packaged, the source is executed to
        re-materialize it."""
        with open(location, "rb") as f:
            blob = pickle.load(f)

        metadata = blob["metadata"]
        metadata["kwargs"].update(kwargs)

        model_cls = cls
        if cls is BaseModel or cls.__name__ != blob["class_name"]:
            model_cls = _resolve_class(blob) or cls

        # Filter kwargs to the constructor signature.
        valid = {f.name for f in dataclasses.fields(model_cls)}
        ctor_kwargs = {
            k: v for k, v in metadata["kwargs"].items() if k in valid
        }

        model = model_cls(*args, **ctor_kwargs)
        params = None
        if blob["params"] is not None:
            params = flax.serialization.msgpack_restore(blob["params"])
            params = jax.tree_util.tree_map(jnp.asarray, params)
        model.metadata = metadata
        return model, params

    @staticmethod
    def device(params):
        """Device holding the first parameter leaf (reference
        base.py:131-137). flax params live outside the module, so this
        takes them explicitly; like the reference, the answer may not be
        meaningful when parameters are sharded across devices.
        """
        import jax

        leaves = jax.tree_util.tree_leaves(params)
        if not leaves:
            return jax.devices()[0]
        leaf = leaves[0]
        if hasattr(leaf, "devices"):
            return next(iter(leaf.devices()))
        return jax.devices()[0]

    def save_to_folder(
        self, folder: typing.Union[str, Path], params=None,
        extra_data: dict = None, package: bool = True,
    ):
        """Dump model as package + weights + extra data under
        ``folder/<classname>/`` (reference base.py:677-725)."""
        target_base = Path(folder) / type(self).__name__.lower()
        target_base.mkdir(exist_ok=True, parents=True)

        if package:
            package_path = target_base / "package.pth"
            self.save(package_path, params=params, package=True)

        weights_path = target_base / "weights.pth"
        self.save(weights_path, params=params, package=False)

        for path, obj in (extra_data or {}).items():
            with open(target_base / path, "wb") as f:
                pickle.dump(jax.tree_util.tree_map(_np_leaf, obj), f)

        return target_base

    @classmethod
    def load_from_folder(
        cls, folder: typing.Union[str, Path], package: bool = True,
        strict: bool = False, **kwargs,
    ):
        """Load (model, params, extra_data) from a ``save_to_folder``
        layout (reference base.py:727-768)."""
        folder = Path(folder) / cls.__name__.lower()
        model, params = cls.load(
            folder / ("package.pth" if package else "weights.pth"),
            strict=strict,
        )

        reserved = {"package.pth", "weights.pth"}
        extra_data = {}
        for item in folder.glob("*"):
            if item.is_file() and item.name not in reserved:
                with open(item, "rb") as fh:
                    extra_data[item.name] = pickle.load(fh)
        return model, params, extra_data


def _np_leaf(x):
    if isinstance(x, jnp.ndarray):
        return np.asarray(x)
    return x


def _resolve_class(blob):
    """Find the model class: import path first, then packaged source."""
    try:
        mod = importlib.import_module(blob["class_module"])
        return getattr(mod, blob["class_name"])
    except Exception:
        pass
    source = blob.get("source")
    if source is None:
        return None
    mod = types.ModuleType(f"_audiotools_tpu_packaged_{blob['class_name']}")
    mod.__dict__["__builtins__"] = __builtins__
    exec(compile(source, mod.__name__, "exec"), mod.__dict__)
    return getattr(mod, blob["class_name"], None)
