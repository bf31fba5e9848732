"""Core utilities.

Mirror of `/root/reference/audiotools/core/util.py`, rebuilt for JAX:
``ensure_tensor`` produces jnp arrays, ``collate`` stacks onto device
arrays, ``prepare_batch`` moves pytrees to a jax device/sharding, and
``flatten``/``unflatten`` replace the external ``flatten_dict`` dependency.
"""
import csv
import glob
import math
import numbers
import os
import random
from contextlib import contextmanager, suppress
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np


# -----------------------------------------------------------------------------
# dict flattening (replaces flatten_dict; reference util.py:17-18)
# -----------------------------------------------------------------------------


def flatten(d: dict, parent: tuple = ()) -> dict:
    """Flatten a nested dict into {tuple_path: value}."""
    out = {}
    for k, v in d.items():
        path = parent + (k,)
        if isinstance(v, dict) and v:
            out.update(flatten(v, path))
        else:
            out[path] = v
    return out


def unflatten(d: dict) -> dict:
    """Invert ``flatten``."""
    out = {}
    for path, v in d.items():
        cur = out
        for k in path[:-1]:
            cur = cur.setdefault(k, {})
        cur[path[-1]] = v
    return out


# -----------------------------------------------------------------------------
# info / ensure_tensor (reference util.py:21-89)
# -----------------------------------------------------------------------------


@dataclass
class Info:
    """File metadata shim (reference util.py:21-31)."""

    sample_rate: float
    num_frames: int

    @property
    def duration(self) -> float:
        return self.num_frames / self.sample_rate


def info(audio_path: str) -> Info:
    """Audio file metadata without decoding (reference util.py:33-53)."""
    from ..io import audio_info

    i = audio_info(str(audio_path))
    return Info(sample_rate=i.sample_rate, num_frames=i.num_frames)


def ensure_tensor(
    x,
    ndim: int = None,
    batch_size: int = None,
) -> jnp.ndarray:
    """Coerce ``x`` to a jnp array of the given ndim/batch size
    (reference util.py:56-89)."""
    if not isinstance(x, jnp.ndarray):
        x = jnp.asarray(x)
    if x.dtype == jnp.float64:
        x = x.astype(jnp.float32)
    if ndim is not None:
        assert x.ndim <= ndim
        while x.ndim < ndim:
            x = x[..., None]
    if batch_size is not None:
        if x.shape[0] != batch_size:
            shape = list(x.shape)
            shape[0] = batch_size
            x = jnp.broadcast_to(x, shape)
    return x


def _get_value(other):
    from .signal import AudioSignal

    if isinstance(other, AudioSignal):
        return other.audio_data
    return other


def hz_to_bin(hz, n_fft: int, sample_rate: int):
    """Closest frequency bin for frequencies in Hz (reference util.py:100-126)."""
    hz = jnp.asarray(hz)
    shape = hz.shape
    hz = jnp.minimum(hz.reshape(-1), sample_rate / 2)
    freqs = jnp.linspace(0, sample_rate / 2, 2 + n_fft // 2)
    closest = jnp.abs(hz[None, :] - freqs[:, None])
    closest_bins = jnp.argmin(closest, axis=0)
    return closest_bins.reshape(shape)


# -----------------------------------------------------------------------------
# randomness (reference util.py:129-188)
# -----------------------------------------------------------------------------


def random_state(seed):
    """Turn a seed into a np.random.RandomState (reference util.py:129-160):
    None/np.random -> the global state; ints seed a fresh state; an
    existing state passes through."""
    if isinstance(seed, np.random.RandomState):
        return seed
    if seed is None or seed is np.random:
        return np.random.mtrand._rand
    if isinstance(seed, (numbers.Integral, np.integer, int)):
        return np.random.RandomState(seed)
    raise ValueError(
        f"{seed!r} cannot be used to seed a numpy.random.RandomState instance"
    )


def seed(random_seed):
    """Seed numpy and python RNGs (reference util.py:163-188; the cudnn
    determinism knob has no TPU analog — XLA is deterministic by default)."""
    np.random.seed(random_seed)
    random.seed(random_seed)


# -----------------------------------------------------------------------------
# file discovery (reference util.py:222-323)
# -----------------------------------------------------------------------------

# The reference also lists ".mp4" (util.py:222); no decoder for it exists
# in this environment, so find_audio only advertises loadable formats.
AUDIO_EXTENSIONS = [".wav", ".flac", ".mp3", ".ogg"]


def find_audio(folder: str, ext: List[str] = AUDIO_EXTENSIONS):
    """Find all audio files in a directory recursively (reference
    util.py:225-251). A path that itself names an audio file (or a glob
    pattern of one) is returned as-is."""
    name = str(folder)
    if name.endswith(tuple(ext)):
        if "*" not in name:
            return [Path(folder)]
        return glob.glob(name, recursive="**" in name)
    found = []
    for suffix in ext:
        found.extend(Path(folder).glob(f"**/*{suffix}"))
    return found


def read_sources(
    sources: List[str],
    remove_empty: bool = True,
    relative_path: str = None,
    ext: List[str] = AUDIO_EXTENSIONS,
):
    """Convert folders/CSVs into a list of lists of {"path": ...} rows
    (reference util.py:254-299).

    ``relative_path`` anchors relative CSV paths; when not given, CSV
    rows fall back to the ``PATH_TO_DATA`` environment variable, making
    the portable-manifest convention documented by the reference
    (transforms.py:724-727) actually work without per-call plumbing.
    Absolute CSV paths are unaffected, and folder sources are never
    re-anchored by the env var (their globbed paths are already real).
    """
    csv_anchor = relative_path
    if csv_anchor is None:
        csv_anchor = os.getenv("PATH_TO_DATA", "")
    csv_anchor = Path(csv_anchor)
    files = []
    relative_path = Path(relative_path or "")
    def rows_from_csv(path):
        with open(path, "r") as f:
            for row in csv.DictReader(f):
                if row["path"]:
                    row["path"] = str(csv_anchor / row["path"])
                    yield row
                elif not remove_empty:
                    yield row

    for source in sources:
        source = str(source)
        if source.endswith(".csv"):
            entries = list(rows_from_csv(source))
        else:
            entries = [
                {"path": str(relative_path / found)}
                for found in find_audio(source, ext=ext)
            ]
        files.append(sorted(entries, key=lambda row: row["path"]))
    return files


def choose_from_list_of_lists(state: np.random.RandomState, list_of_lists, p=None):
    """Choose an item from a list of lists (reference util.py:302-323)."""
    source_idx = state.choice(list(range(len(list_of_lists))), p=p)
    item_idx = state.randint(len(list_of_lists[source_idx]))
    return list_of_lists[source_idx][item_idx], source_idx, item_idx


@contextmanager
def chdir(newdir):
    """Context-managed directory change (reference util.py:326-343)."""
    curdir = os.getcwd()
    try:
        os.chdir(newdir)
        yield
    finally:
        os.chdir(curdir)


# -----------------------------------------------------------------------------
# batching (reference util.py:346-479)
# -----------------------------------------------------------------------------


def dequantize_batch(batch):
    """Invert the loader's int16 wire staging for EVERY AudioSignal in a
    (possibly nested) batch — ``transform_args`` carry AudioSignals too
    (BackgroundNoise's noise, RoomImpulseResponse's IR), and a consumer
    that only dequantized the top-level signal would silently feed int16
    audio into the transform math. The dtype tests are static under
    trace, so calling this first inside a jitted step folds every
    dequantization into the program. Returns a new structure; signals
    are cloned (`dequantize_wire` mutates in place)."""
    from .signal import AudioSignal

    def walk(v):
        if isinstance(v, AudioSignal):
            return v.clone().dequantize_wire()
        if isinstance(v, dict):
            return {k: walk(x) for k, x in v.items()}
        if isinstance(v, (list, tuple)):
            return type(v)(walk(x) for x in v)
        return v

    return walk(batch)


def prepare_batch(batch, device=None):
    """Move a (possibly nested) batch onto a jax device or sharding
    (reference util.py:346-380; the host->device boundary)."""
    from .signal import AudioSignal

    def _put(v):
        if isinstance(v, (jnp.ndarray, np.ndarray, AudioSignal)):
            return jax.device_put(v, device) if device is not None else v
        return v

    if isinstance(batch, dict):
        flat = flatten(batch)
        flat = {k: _put(v) for k, v in flat.items()}
        return unflatten(flat)
    elif isinstance(batch, (list, tuple)):
        return type(batch)(_put(v) for v in batch)
    return _put(batch)


def sample_from_dist(dist_tuple: tuple, state: np.random.RandomState = None):
    """Sample from a distribution tuple like ("uniform", 0, 1)
    (reference util.py:383-423)."""
    if dist_tuple[0] == "const":
        return dist_tuple[1]
    state = random_state(state)
    dist_fn = getattr(state, dist_tuple[0])
    return dist_fn(*dist_tuple[1:])


def dist_lower_bound(dist_tuple, default: float = None):
    """Static lower bound of a distribution tuple, if derivable.

    Used to bound filter-kernel supports at trace time (e.g. the smallest
    possible ``LowPass`` cutoff fixes the longest sinc kernel needed).
    Returns ``default`` when the bound can't be derived.
    """
    if isinstance(dist_tuple, (int, float)):
        return float(dist_tuple)
    if isinstance(dist_tuple, (tuple, list)) and dist_tuple:
        kind = dist_tuple[0]
        if kind == "const":
            return float(dist_tuple[1])
        if kind == "uniform":
            return float(dist_tuple[1])
        if kind == "choice":
            return float(min(dist_tuple[1]))
    return default


class AlwaysTrue:
    """Static all-true transform mask, emitted by
    ``BaseTransform.instantiate`` when ``prob == 1.0`` (whose Bernoulli
    draw is true by construction).

    Registered as a *leafless* pytree node, so ``jit`` / ``device_put`` /
    ``tree_map`` treat it as static structure rather than a traced array:
    inside a jitted program its truth is inspectable at trace time, which
    is what lets always-on transforms skip the clone + ``where``-merge
    safely. The moment a caller replaces it with a real mask (array or
    bool) the static evidence is gone and the masked path runs — a
    hand-edited mask can never be silently ignored.
    """

    __slots__ = ()

    def __bool__(self):
        return True

    def __array__(self, dtype=None, copy=None):
        return np.asarray(True, dtype=dtype)

    def __repr__(self):
        return "AlwaysTrue()"

    def __eq__(self, other):
        return isinstance(other, AlwaysTrue)

    def __hash__(self):
        return hash(AlwaysTrue)


jax.tree_util.register_pytree_node(
    AlwaysTrue,
    lambda m: ((), None),
    lambda aux, children: AlwaysTrue(),
)


def _default_collate(values):
    """Stack a list of scalars/arrays into one array (host-side)."""
    v0 = values[0]
    if all(isinstance(v, AlwaysTrue) for v in values):
        # a batch of static all-true masks is still statically all-true
        return AlwaysTrue()
    if isinstance(v0, AlwaysTrue) or any(
        isinstance(v, AlwaysTrue) for v in values
    ):
        # mixed with concrete values (hand-edited batch): materialize
        values = [bool(v) if isinstance(v, AlwaysTrue) else v for v in values]
        v0 = values[0]
    if isinstance(v0, (np.ndarray, jnp.ndarray)):
        # all-host columns stack on host (numpy); any device value keeps
        # the stack on device. The batch crosses to HBM once, later
        # (prepare_batch / the consumer's jit), not per column.
        if any(isinstance(v, jnp.ndarray) for v in values):
            return jnp.stack([jnp.asarray(v) for v in values])
        return np.stack(values)
    if isinstance(v0, (bool, np.bool_)):
        return np.asarray(values, dtype=bool)
    if isinstance(v0, (int, np.integer)):
        return np.asarray(values, dtype=np.int32)
    if isinstance(v0, (float, np.floating)):
        return np.asarray(values, dtype=np.float32)
    return values


def collate(list_of_dicts: list, n_splits: int = None):
    """AudioSignal-aware collation with optional sub-batch splitting
    (reference util.py:426-479)."""
    from .._hostprof import span

    with span("collate"):
        return _collate_impl(list_of_dicts, n_splits)


def _collate_impl(list_of_dicts: list, n_splits: int = None):
    from .signal import AudioSignal

    def collate_chunk(items):
        """Collate one sub-batch of flattened item dicts, key by key."""
        flat_items = [flatten(d) for d in items]
        merged = {}
        for key in flat_items[0]:
            column = [d[key] for d in flat_items]
            if all(isinstance(s, AudioSignal) for s in column):
                merged[key] = AudioSignal.batch(column, pad_signals=True)
            else:
                merged[key] = _default_collate(column)
        return unflatten(merged)

    if n_splits is None:
        return collate_chunk(list_of_dicts)

    per_split = int(math.ceil(len(list_of_dicts) / n_splits))
    return [
        collate_chunk(list_of_dicts[i : i + per_split])
        for i in range(0, len(list_of_dicts), per_split)
    ]


# -----------------------------------------------------------------------------
# plotting (reference util.py:482-591)
# -----------------------------------------------------------------------------

BASE_SIZE = 864
DEFAULT_FIG_SIZE = (9, 3)


def _inset_tick_labels(host_ax, ax, axis: str, color: str, fontsize: float):
    """Redraw one axis' tick labels as translucent in-plot annotations.

    Tick values come from ``ax`` but the text artists land on ``host_ax``
    (the figure's first axes) so stacked subplots label once.  The first
    two ticks and the last are dropped: edge labels would collide with the
    figure border once the real axes are hidden.
    """
    if axis == "y":
        anchor = ax.get_xlim()[0]  # pin labels to the left edge
        keep = ax.get_yticks()[2:-1]
    else:
        anchor = ax.get_ylim()[0]  # pin labels to the bottom edge
        keep = ax.get_xticks()[2:-1]

    for value in keep:
        if axis == "y":
            xy = (anchor, value)
            text = f"{value / 1000:2.1f}k"  # Hz -> kHz
            offset, ha, va = (5, -5), "left", "top"
        else:
            xy = (value, anchor)
            text = f"{value:2.1f}s"
            offset, ha, va = (5, 5), "center", "bottom"
        host_ax.annotate(
            text,
            xy=xy,
            xycoords="data",
            xytext=offset,
            textcoords="offset points",
            ha=ha,
            va=va,
            color=color,
            fontsize=fontsize,
            alpha=0.75,
        )


def format_figure(
    fig_size: tuple = None, title: str = None, fig=None,
    format_axes: bool = True, format: bool = True, font_color: str = "white",
):
    """Borderless audio-plot styling: hide the matplotlib chrome, redraw
    tick labels *inside* the data area, and optionally inset a boxed title
    in the top-right corner (behavior of reference util.py:486-591).

    Used by specshow/waveplot/wavespec in ``core/display.py``.  Pass
    ``format=False`` from those call sites to skip styling entirely.
    """
    import matplotlib.pyplot as plt

    if not format:
        return
    if fig is None:
        fig = plt.gcf()
    fig.set_size_inches(*(fig_size or DEFAULT_FIG_SIZE))
    if not fig.axes:
        return
    host_ax = fig.axes[0]

    # Scale fonts with rendered width so labels stay readable at any dpi.
    width_px = fig.get_size_inches()[0] * fig.dpi
    scale = width_px / BASE_SIZE

    if format_axes:
        for ax in fig.axes:
            _inset_tick_labels(host_ax, ax, "y", font_color, 12 * scale)
            _inset_tick_labels(host_ax, ax, "x", font_color, 12 * scale)
            # Data fills the whole canvas: no margins, spines, or ticks.
            ax.margins(0, 0)
            ax.set_axis_off()
            ax.xaxis.set_major_locator(plt.NullLocator())
            ax.yaxis.set_major_locator(plt.NullLocator())
        plt.subplots_adjust(top=1, bottom=0, right=1, left=0, hspace=0, wspace=0)

    if title is not None:
        label = host_ax.annotate(
            title,
            xy=(1, 1),
            xycoords="axes fraction",
            xytext=(-5, -5),
            textcoords="offset points",
            ha="right",
            va="top",
            color="white",
            fontsize=20 * scale,
        )
        label.set_bbox(dict(facecolor="black", edgecolor="black", alpha=0.5))


# -----------------------------------------------------------------------------
# synthetic fixtures (reference util.py:593-671)
# -----------------------------------------------------------------------------

_NOTE_OFFSETS = {"C": 0, "D": 2, "E": 4, "F": 5, "G": 7, "A": 9, "B": 11}


def note_to_midi(note: str) -> int:
    """Minimal note-name -> midi (replaces librosa.note_to_midi)."""
    name = note[0].upper()
    rest = note[1:]
    accidental = 0
    while rest and rest[0] in "#b!":
        accidental += 1 if rest[0] == "#" else -1
        rest = rest[1:]
    octave = int(rest)
    return 12 * (octave + 1) + _NOTE_OFFSETS[name] + accidental


def midi_to_hz(midi: float) -> float:
    return 440.0 * (2.0 ** ((midi - 69) / 12.0))


def generate_chord_dataset(
    max_voices: int = 8, sample_rate: int = 44100, num_items: int = 5,
    duration: float = 1.0, min_note: str = "C2", max_note: str = "C6",
    output_dir: Path = "chords",
):
    """Toy multitrack dataset of sine chords (parity with reference
    util.py:593-671): ``num_items`` tracks of 1..max_voices sine voices,
    written as per-track wav folders plus one aligned CSV per voice name
    (empty cells where a track lacks that voice)."""
    from .signal import AudioSignal
    from ..data.preprocess import create_csv

    midi_range = (note_to_midi(min_note), note_to_midi(max_note))
    output_dir = Path(output_dir)
    output_dir.mkdir(exist_ok=True)

    def random_voice():
        return AudioSignal.wave(
            frequency=midi_to_hz(random.randint(*midi_range)),
            duration=random.uniform(0.85 * duration, duration),
            sample_rate=sample_rate,
            shape="sine",
        )

    # draw order (voices before durations per voice, tracks in sequence)
    # matches the reference so seeded runs make the same dataset
    tracks = []
    for idx in range(num_items):
        voices = {
            f"voice_{v}": random_voice()
            for v in range(random.randint(1, max_voices))
        }
        track_dir = output_dir / f"track_{idx}"
        track_dir.mkdir(exist_ok=True)
        for name, sig in voices.items():
            sig.write(track_dir / f"{name}.wav")
        tracks.append(voices)

    for name in {name for track in tracks for name in track}:
        column = [
            str(track[name].path_to_file) if name in track else ""
            for track in tracks
        ]
        create_csv(column, output_dir / f"{name}.csv", loudness=True)

    return output_dir


@contextmanager
def _close_temp_files(tmpfiles: list):
    """Close and unlink temp files when the block exits, whether by
    success or error (reference util.py:191-219)."""
    try:
        yield
    finally:
        for handle in tmpfiles:
            with suppress(Exception):
                handle.close()
                os.unlink(handle.name)
