"""Generate the per-module API reference (markdown) from docstrings.

The reference publishes a Sphinx site with one RST stub per module
(/root/reference/docs/source/*.rst + conf.py); this environment has no
sphinx, so the equivalent is generated directly: one markdown page per
public module with signatures and docstrings, written to ``docs/api/``.

    python docs/gen_api.py          # writes docs/api/*.md + index
"""
import importlib
import inspect
import re
import sys
from pathlib import Path

MODULES = [
    "audiotools_tpu",
    "audiotools_tpu.core.signal",
    "audiotools_tpu.core.util",
    "audiotools_tpu.core.loudness",
    "audiotools_tpu.core.display",
    "audiotools_tpu.core.playback",
    "audiotools_tpu.core.ffmpeg",
    "audiotools_tpu.core.whisper",
    "audiotools_tpu.ops.fft",
    "audiotools_tpu.ops.filters",
    "audiotools_tpu.ops.loudness",
    "audiotools_tpu.ops.nsim",
    "audiotools_tpu.ops.pesq",
    "audiotools_tpu.ops.stoi",
    "audiotools_tpu.ops.resample",
    "audiotools_tpu.ops.stretch",
    "audiotools_tpu.ops.pallas_kernels",
    "audiotools_tpu.ops.benchmark",
    "audiotools_tpu.io",
    "audiotools_tpu.io.wav",
    "audiotools_tpu.io.codecs",
    "audiotools_tpu.io.amrnb",
    "audiotools_tpu.native",
    "audiotools_tpu.data.datasets",
    "audiotools_tpu.data.transforms",
    "audiotools_tpu.data.loader",
    "audiotools_tpu.data.preprocess",
    "audiotools_tpu.ml.accelerator",
    "audiotools_tpu.ml.decorators",
    "audiotools_tpu.ml.experiment",
    "audiotools_tpu.ml.checkpoint",
    "audiotools_tpu.ml.profiling",
    "audiotools_tpu.ml.layers.base",
    "audiotools_tpu.ml.layers.spectral_gate",
    "audiotools_tpu.metrics.distance",
    "audiotools_tpu.metrics.spectral",
    "audiotools_tpu.metrics.quality",
    "audiotools_tpu.models.dac",
    "audiotools_tpu.models.discriminators",
    "audiotools_tpu.models.adversarial",
    "audiotools_tpu.models.train",
    "audiotools_tpu.models.artifacts",
    "audiotools_tpu.models.streaming",
    "audiotools_tpu.parallel.mesh",
    "audiotools_tpu.parallel.timeshard",
    "audiotools_tpu.post",
    "audiotools_tpu.preference",
]


def _sig(obj):
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default-value reprs like "<_Sentinel object at 0x7f...>" embed a
    # memory address; scrub it so regenerated docs are deterministic
    return re.sub(r" at 0x[0-9a-f]+", "", sig)


def _doc(obj):
    d = inspect.getdoc(obj)
    # flax dataclass auto-docstrings repr default objects ("<_Sentinel
    # object at 0x7f...>"); scrub addresses like _sig does so the
    # generated pages are deterministic across runs
    return re.sub(r" at 0x[0-9a-f]+", "", d) if d else ""


def _is_public(name, obj, mod):
    if name.startswith("_"):
        return False
    owner = getattr(obj, "__module__", None)
    return owner == mod.__name__


def render_module(mod_name: str) -> str:
    mod = importlib.import_module(mod_name)
    lines = [f"# `{mod_name}`", ""]
    if _doc(mod):
        lines += [_doc(mod), ""]

    members = vars(mod).items()
    classes = [(n, o) for n, o in members if inspect.isclass(o) and _is_public(n, o, mod)]
    funcs = [(n, o) for n, o in members if inspect.isfunction(o) and _is_public(n, o, mod)]

    for name, cls in classes:
        lines += [f"## class `{name}{_sig(cls)}`", ""]
        if _doc(cls):
            lines += [_doc(cls), ""]
        # walk the MRO so mixin-provided methods (AudioSignal's DSP/effects
        # surface lives in core._dsp/_effects mixins) appear on the class
        seen = set()
        mro_members = []
        for klass in cls.__mro__:
            if not getattr(klass, "__module__", "").startswith("audiotools_tpu"):
                continue
            for mname, meth in vars(klass).items():
                if mname not in seen:
                    seen.add(mname)
                    mro_members.append((mname, meth))
        for mname, meth in sorted(mro_members):
            if mname.startswith("_") and mname != "__call__":
                continue
            target = meth
            if isinstance(meth, (staticmethod, classmethod)):
                target = meth.__func__
            elif isinstance(meth, property):
                doc = _doc(meth.fget) if meth.fget else ""
                lines += [f"### `{name}.{mname}` *(property)*", ""]
                if doc:
                    lines += [doc, ""]
                continue
            if not callable(target):
                continue
            lines += [f"### `{name}.{mname}{_sig(target)}`", ""]
            if _doc(target):
                lines += [_doc(target), ""]

    for name, fn in funcs:
        lines += [f"## `{name}{_sig(fn)}`", ""]
        if _doc(fn):
            lines += [_doc(fn), ""]

    return "\n".join(lines) + "\n"


def main(out_dir=None):
    out = Path(out_dir or Path(__file__).parent / "api")
    out.mkdir(parents=True, exist_ok=True)
    index = ["# API reference", "", "Generated by `docs/gen_api.py`.", ""]
    for mod_name in MODULES:
        page = render_module(mod_name)
        fname = mod_name.replace(".", "_") + ".md"
        (out / fname).write_text(page)
        index.append(f"- [`{mod_name}`]({fname})")
    (out / "index.md").write_text("\n".join(index) + "\n")
    print(f"wrote {len(MODULES)} pages to {out}")


if __name__ == "__main__":
    sys.path.insert(0, str(Path(__file__).parents[1]))
    main()
