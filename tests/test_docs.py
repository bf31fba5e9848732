"""The API-reference generator must run against the live package (a
module rename or import error shows up here, not when publishing)."""
import sys
from pathlib import Path


def test_migration_guide_symbols_resolve():
    """Every dotted `audiotools_tpu...` path in the migration guide must
    exist in the live package — the guide is the contract a reference
    user follows, so a rename breaks this test, not the user."""
    import importlib
    import re

    doc = (
        Path(__file__).parents[1] / "docs" / "tutorials" / "migrating.md"
    ).read_text()
    paths = sorted(set(re.findall(r"\baudiotools_tpu(?:\.\w+)+", doc)))
    assert len(paths) > 25  # the guide names a broad surface
    for dotted in paths:
        parts = dotted.split(".")
        obj = None
        # longest importable module prefix, then attribute walk
        for k in range(len(parts), 0, -1):
            try:
                obj = importlib.import_module(".".join(parts[:k]))
                break
            except ImportError:
                continue
        assert obj is not None, dotted
        for attr in parts[k:]:
            assert hasattr(obj, attr), f"{dotted}: missing {attr!r}"
            obj = getattr(obj, attr)

    # spot-check method names the prose promises on AudioSignal
    from audiotools_tpu import AudioSignal

    for name in (
        "mix", "convolve", "apply_ir", "pitch_shift", "time_stretch",
        "apply_codec", "where", "salient_excerpt", "mel_spectrogram",
        "decompose_ir", "measure_drr", "alter_drr", "ffmpeg_loudness",
    ):
        assert hasattr(AudioSignal, name), name


def test_gen_api_builds_all_pages(tmp_path):
    sys.path.insert(0, str(Path(__file__).parents[1] / "docs"))
    try:
        import gen_api
    finally:
        sys.path.pop(0)

    gen_api.main(out_dir=tmp_path)
    pages = list(tmp_path.glob("*.md"))
    assert len(pages) == len(gen_api.MODULES) + 1  # + index
    sig_page = (tmp_path / "audiotools_tpu_core_signal.md").read_text()
    # the mixin surface must be documented on AudioSignal
    for name in ("convolve", "low_pass", "loudness", "stft", "salient_excerpt"):
        assert f"`AudioSignal.{name}" in sig_page, name
