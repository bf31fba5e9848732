"""Time the block state-space IIR cascade vs the meter's other paths.

The exact meter previously evaluated the K-weighting cascade as one
composed-impulse-response FFT conv (2^19-point rfft/irfft per call,
~13 ms at 64 x 5 s). iir_cascade_blocked replaces that with per-block
Toeplitz matmuls + a 431-step block-state scan.

Run: PYTHONPATH=/root/repo:/root/.axon_site timeout 1150 python tests/hw/hw_iir_blocked.py

RESULT (v5e, 2026-08-19, b64 x 5 s @ 44.1 kHz):
    blocked IIR blk= 128:  1.86 ms
    blocked IIR blk= 512:  1.16 ms   <- production block size
    blocked IIR blk=1024:  1.76 ms
    composed-FIR FFT conv: 10.92 ms  (the path it replaces: 9.4x)
    exact meter e2e:        1.44 ms
    fast FIR meter e2e:     2.86 ms  (512-tap Pallas parity mode)
The exact meter is now both the BS.1770-compliant path AND the fastest
one — bench.py's headline chain runs it by default; the FIR mode is
kept as a reference-GPU-parity companion.
"""
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[2] / ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from audiotools_tpu.ops import filters as F
from audiotools_tpu.ops import loudness as L
from audiotools_tpu.ops.benchmark import device_time

B, T, SR = 64, 220500, 44100
print("platform:", jax.devices()[0].platform, flush=True)


def main():
    audio = jnp.asarray(
        (np.random.RandomState(0).randn(B, 1, T) * 0.1).astype(np.float32)
    )
    stages = [(b, a, g) for (b, a), g in L.design_filters(SR, "K-weighting")]
    kernel = L._exact_fir(SR, "K-weighting")
    print(f"composed exact FIR taps: {len(kernel)}", flush=True)

    for blk in (128, 512, 1024):
        t = device_time(
            lambda a, b=blk: F.iir_cascade_blocked(a, stages, block=b),
            audio, iters=10,
        )
        print(f"blocked IIR blk={blk:4d}: {t*1e3:7.2f} ms", flush=True)

    t = device_time(
        lambda a: F.causal_fft_conv1d(a, jnp.asarray(kernel)), audio, iters=10
    )
    print(f"composed-FIR FFT conv : {t*1e3:7.2f} ms", flush=True)

    # end to end (the (B, C, T) loudness wrapper): exact vs fast meter
    t = device_time(lambda a: L.loudness(a, SR), audio, iters=10)
    print(f"exact meter e2e       : {t*1e3:7.2f} ms", flush=True)
    t = device_time(
        lambda a: L.loudness(a, SR, use_fir=True, conv_method="pallas"),
        audio, iters=10,
    )
    print(f"fast FIR meter e2e    : {t*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
