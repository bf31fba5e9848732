"""Real multi-process tests: 2 JAX processes over a local Gloo cluster.

Closes the SURVEY §4.8 gap — the reference never tests its DDP paths
("there are no fake backends"); here the actual cross-process metric
averaging and rank-sharded sampling run under 2 live processes.
"""
import socket
import subprocess
import sys
from pathlib import Path

import pytest

WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port():
    with socket.socket() as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def _parse(path):
    checks = {}
    for line in Path(path).read_text().splitlines():
        if line.startswith("CHECK "):
            _, key, val = line.split(" ", 2)
            checks[key] = val
    return checks


@pytest.mark.slow
def test_two_process_tracker_and_sampler(tmp_path):
    port = _free_port()
    files = [tmp_path / f"out{i}.txt" for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(i), str(port), str(f)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i, f in enumerate(files)
    ]
    outs = [p.communicate(timeout=240)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]

    c0, c1 = _parse(files[0]), _parse(files[1])
    for c in (c0, c1):
        assert c["process_count"] == "2"
        assert c["device_count"] == "4"
        assert c["done"] == "1"
        # proc0 reports loss i, proc1 reports 10+i: averaged -> 5+i on BOTH
        assert c["tracked_losses"] == "5.0,6.0,7.0"

    # rank-sharded sampling: disjoint, covering, interleaved indices
    i0 = [int(x) for x in c0["sampler_indices"].split(",")]
    i1 = [int(x) for x in c1["sampler_indices"].split(",")]
    assert set(i0) & set(i1) == set()
    assert sorted(i0 + i1) == list(range(10))
