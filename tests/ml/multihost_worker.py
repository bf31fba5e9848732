"""Worker for the real multi-process tests (spawned by
test_multihost.py): forms a 2-process JAX CPU cluster and exercises the
cross-process pieces that single-process tests cannot reach —
``Tracker.track(multihost_average=True)`` and the process-ranked
``ResumableDistributedSampler``.

Usage: python multihost_worker.py <process_id> <port> <out_file>
Writes machine-checkable `CHECK <name> <value>` lines to <out_file>
(stdout is unreliable next to the Tracker's rich Live rendering).
"""
import os
import sys

proc_id = int(sys.argv[1])
port = sys.argv[2]
out_file = open(sys.argv[3], "w")


def check(name, value):
    print(f"CHECK {name} {value}", file=out_file, flush=True)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=proc_id
)

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from audiotools_tpu.data.datasets import ResumableDistributedSampler
from audiotools_tpu.ml.decorators import Tracker

check("process_count", jax.process_count())
check("device_count", jax.device_count())

# --- Tracker multihost averaging (reference: dist.all_reduce(AVG),
# ml/decorators.py:325-337) -------------------------------------------------
tracker = Tracker(rank=jax.process_index())


@tracker.track("train", 3, multihost_average=True)
def step(i):
    # each process reports a different loss; the tracked value must be the
    # cross-process mean
    return {"loss": float(proc_id * 10 + i)}


with tracker.live:
    outs = [step(i) for i in range(3)]
# proc0 reports i, proc1 reports 10+i -> mean = 5 + i
check("tracked_losses", ",".join(f"{o['loss']:.1f}" for o in outs))

# --- process-ranked distributed sampler -------------------------------------
class _DS:
    def __len__(self):
        return 10


s = ResumableDistributedSampler(
    _DS(), num_replicas=jax.process_count(), rank=jax.process_index()
)
check("sampler_indices", ",".join(map(str, list(s))))
check("done", 1)
out_file.close()
