"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU build is validated on CPU (jax semantics are identical across
backends); multi-chip sharding tests use the 8 virtual host devices.
Benchmarks (bench.py) run on the real TPU chip.
"""
import os

# No network in this environment: make hub-backed code (Whisper) fail
# fast instead of burning a minute in connect timeouts.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def audio_dir(tmp_path_factory):
    """Synthesized audio fixtures (the reference's committed WAVs are not
    available here, so speech/noise/IR files are generated)."""
    from tests.fixtures import build_fixture_tree

    root = tmp_path_factory.mktemp("audio")
    build_fixture_tree(root)
    return root
