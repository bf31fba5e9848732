"""End-to-end smoke of examples/train_dac.py incl. checkpoint resume."""
import runpy
import sys
from pathlib import Path

import pytest


def _run(tmp_path, steps, *extra):
    argv = [
        "train_dac.py", "--steps", str(steps), "--batch-size", "8", "--toy",
        "--duration", "0.2", "--sample-rate", "16000",
        "--ckpt-every", "2", "--ckpt-dir", str(tmp_path / "ckpt"),
        *extra,
    ]
    old = sys.argv
    sys.argv = argv
    try:
        ns = runpy.run_path(
            str(Path(__file__).parents[2] / "examples" / "train_dac.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = old
    return ns


@pytest.mark.slow
def test_train_example_runs_and_resumes(tmp_path):
    _run(tmp_path, steps=2)

    from audiotools_tpu.ml.checkpoint import Checkpointer

    ckpt = Checkpointer(tmp_path / "ckpt")
    assert ckpt.latest_step() == 2

    # second invocation restores step 2 and continues to 4
    _run(tmp_path, steps=4)
    ckpt = Checkpointer(tmp_path / "ckpt")
    assert ckpt.latest_step() == 4


@pytest.mark.slow
def test_train_example_adversarial_runs_and_resumes(tmp_path):
    """The --adversarial path (generator + discriminator ensemble, two
    optimizers in one checkpointed pytree) trains and resumes."""
    _run(tmp_path, 2, "--adversarial")

    from audiotools_tpu.ml.checkpoint import Checkpointer

    ckpt = Checkpointer(tmp_path / "ckpt")
    assert ckpt.latest_step() == 2

    _run(tmp_path, 4, "--adversarial")
    ckpt = Checkpointer(tmp_path / "ckpt")
    assert ckpt.latest_step() == 4
