"""The API-reference generator must run against the live package (a
module rename or import error shows up here, not when publishing)."""
import sys
from pathlib import Path


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
