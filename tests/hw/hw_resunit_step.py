"""A/B the full DAC train step: conv vs shifted-matmul residual units.

hw_resunit_matmul.py measured the 3-unit C=64 chain at 12.8 ms (conv)
vs 11.3 ms (matmul) fwd+bwd — XLA's conv backward loses to plain matmul
transposes. This probe measures the number that matters: the end-to-end
train step (fwd+bwd+adamw) with the SAME params under both formulations.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_resunit_step.py
"""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from pathlib import Path

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audiotools_tpu.models import DAC
from audiotools_tpu.models.train import make_train_step
from audiotools_tpu.ops.benchmark import device_time

B, T, SR = 16, 16896, 44100
print("platform:", jax.devices()[0].platform, flush=True)

audio = jnp.asarray(
    (np.random.RandomState(0).randn(B, 1, T) * 0.1).astype(np.float32)
)
opt = optax.adamw(1e-4)

model_conv = DAC()
params = jax.jit(model_conv.init)(jax.random.PRNGKey(0), audio[:1])
opt_state = opt.init(params)

for name, model in (
    ("conv", model_conv),
    ("matmul", DAC(formulation="matmul")),
    ("hybrid", DAC(formulation="hybrid")),
):
    step = make_train_step(model, opt, SR)

    def timed(a, step=step):
        p2, _, m = step(params, opt_state, a)
        return m["loss"], p2

    t = device_time(timed, audio, iters=5)
    print(
        f"train step [{name}]: {t*1e3:.1f} ms ({B/t:.1f} clips/s, "
        f"{B / t * (T / SR):.1f}x realtime)",
        flush=True,
    )

print("DONE", flush=True)

# RESULT (v5e, 2026-08-18, same-process run so legs share tunnel
# conditions): conv 69.6 ms (229.9 clips/s) / matmul-everywhere 91.9 ms
# (NEGATIVE — the wide C>=128 stages lose badly on 7 small einsums) /
# hybrid (matmul only at C<=64) 67.4 ms (237.3 clips/s, +3%). The
# hybrid's 2.2 ms win matches hw_resunit_matmul.py's micro prediction
# (~1.5 ms encoder + ~1 ms decoder C=64 backward). Adopted: bench.py,
# examples/train_dac.py and the graft dryrun train with
# formulation="hybrid"; inference default stays "conv" (matmul forward
# is slower).
