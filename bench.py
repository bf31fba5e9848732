"""Headline benchmark: batch-64 full augmentation chain + feature stack.

Measures the BASELINE.json north-star workload on the attached accelerator:
a seed-reproducible Compose chain (RoomImpulseResponse + BackgroundNoise +
Equalizer + VolumeNorm) plus pitch shift and the mel/LUFS feature stack,
all compiled into one XLA program over a batch of 64 five-second
44.1 kHz clips. Prints one JSON line per metric; the LAST line is the
headline (the driver parses the final line):

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is the achieved aggregate real-time factor divided by the
50x-per-chip target (BASELINE.md). The preceding lines report the
BASELINE "measure & report" metrics (STFT+mel throughput, LUFS meter
real-time factor) and a hardware fast-path gate (Pallas FIR + matmul
STFT vs their reference paths) so kernel regressions surface in
BENCH_r*.json rather than waiting for a manual tests/hw pass.
"""
import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

DURATION = 5.0
SAMPLE_RATE = 44100
BATCH = 64
TARGET_RTF = 50.0

# First committed value of each "measure & report" metric (BENCH_r02 /
# this round for the train steps); later rounds ratio against these so a
# kernel regression is visible in the JSON itself (VERDICT r2 weak #6).
MEASURED_BASELINES = {
    "stft_mel_throughput_b64_5s_matmul": 6.57,  # GB/s, BENCH_r02
    "lufs_meter_rtf_b64_5s_fast_meter": 109287.0,  # x realtime, BENCH_r02
    "lufs_meter_rtf_b64_5s_exact_meter": 222222.0,  # x realtime, r04
    # (exact blocked-IIR meter first measured r04: 1.44 ms / b64 x 5 s,
    # tests/hw/hw_iir_blocked.py)
    "dac_train_step_b16_clips_per_sec": 238.4,  # clips/s, established r03
    "adversarial_train_step_b16_clips_per_sec": 108.8,  # clips/s, r03
    # BASELINE configs 1 and 3, first measured r05 (spread 0.18 / 0.008)
    "quickstart_lowpass_stft_istft_mono_5s_rtf": 3279.0,  # x realtime
    "resample_eq_reverb_b64_5s_clips_per_sec": 9440.0,  # clips/s
}


def _vs(metric, value):
    base = MEASURED_BASELINES.get(metric)
    return round(value / base, 2) if base else 1.0


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: the chain + Pallas meter cost ~5 min
    # of XLA/Mosaic compile on the tunneled TPU; cached reruns skip it.
    jax.config.update(
        "jax_compilation_cache_dir", str(Path(__file__).parent / ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    sys.path.insert(0, str(Path(__file__).parent / "tests"))
    from fixtures import build_fixture_tree

    from audiotools_tpu.core import util
    from audiotools_tpu.data import transforms as tfm
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader
    from audiotools_tpu.data.loader import DataLoader
    from audiotools_tpu.ops import fft as F
    from audiotools_tpu.ops import loudness as L
    from audiotools_tpu.ops import stretch as S

    # Headline meter: the EXACT BS.1770 cascade via block state-space
    # lifting (filters.iir_cascade_blocked — per-block Toeplitz matmuls on
    # the MXU + a block-state scan). v5e batch-64 x 5 s: 1.44 ms e2e vs
    # 2.86 ms for the 512-tap Pallas FIR approximation — the exact meter
    # is now both the compliant one and the fastest one
    # (tests/hw/hw_iir_blocked.py), so the headline no longer rides an
    # approximation (VERDICT r3 weak #3, fully closed).
    L.set_fast_meter(False)

    root = Path(tempfile.mkdtemp())
    build_fixture_tree(root)

    transform = tfm.Compose(
        tfm.RoomImpulseResponse(sources=[str(root / "ir.csv")]),
        tfm.BackgroundNoise(sources=[str(root / "nz.csv")]),
        tfm.Equalizer(),
        tfm.VolumeNorm(),
    )
    ds = AudioDataset(
        AudioLoader(sources=[str(root / "spk.csv")]),
        sample_rate=SAMPLE_RATE,
        n_examples=BATCH,
        duration=DURATION,
        transform=transform,
    )
    dl = DataLoader(ds, batch_size=BATCH, num_workers=8)
    batch = next(iter(dl))

    def pipeline(sig, kw):
        out = ds.transform(sig, **kw)
        # bf16 synthesis iDFT: no phase accumulation on the synthesis
        # side, ~3e-3 waveform perturbation (~0.026 dB) — analysis stays
        # at 3-pass precision (ops/stretch.py docstring, hw_pv_mm.py).
        # phasor_fused: the Pallas in-VMEM rotation scan, 2.2x the angle
        # path's PV core at 2.5e-5 accuracy (hw_pv_fused.py RESULT).
        audio = S.pitch_shift(
            out.audio_data, 2.0, SAMPLE_RATE, synthesis_method="matmul_bf16",
            pv_formulation="phasor_fused",
        )
        # MXU DFT-matmul mel: hardware-validated at ~1e-5 rel accuracy,
        # ~1.5x faster than the VPU FFT path
        mel = F.mel_spectrogram(audio, SAMPLE_RATE, 80, method="matmul")
        lufs = L.loudness(audio, SAMPLE_RATE)
        return audio, mel, lufs

    # Host->device transfer happens once, up front: the production input
    # path overlaps H2D with compute (data/loader.py prefetches), but a
    # naive per-iteration numpy handoff through the tunneled transport
    # serializes ~13 ms of transfer into every step and measures the
    # link, not the chip.
    sig, kw = jax.device_put((batch["signal"], batch["transform_args"]))

    def _checksum(s, k):
        audio, mel, lufs = pipeline(s, k)
        # sum over every output so XLA cannot dead-code-eliminate a stage
        return jnp.sum(audio) + jnp.sum(mel) + jnp.sum(lufs)

    jitted = jax.jit(_checksum)

    # compile + settle
    float(jitted(sig, kw))

    # Dispatch-inclusive steady state: drain N queued calls, synced by
    # fetching the last scalar. On the tunneled transport every program
    # invocation pays a ~13 ms network round trip that a production-local
    # host does not (its dispatch is ~50 us), so this number bounds the
    # headline from below; it is reported as its own metric.
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jitted(sig, kw)
    float(out)
    t1 = time.perf_counter()
    dispatch_inclusive = (t1 - t0) / iters

    # Headline: pure device time per step via the repo's calibrated
    # two-point chained loop (the device_time methodology, CLAUDE.md):
    # the whole pipeline runs inside one fori_loop program at N and 2N
    # iterations so the fixed per-program invocation overhead cancels.
    # Every FLOAT leaf of the carry — the audio AND all transform
    # kwargs — is perturbed by 1e-12 x the step checksum, so XLA cannot
    # hoist any kwarg-derived computation (IR prep, noise EQ, ...) out
    # of the loop as loop-invariant.
    def _perturb(tree, eps):
        return jax.tree_util.tree_map(
            lambda l: l + eps.astype(l.dtype)
            if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)
            else l,
            tree,
        )

    def build_chain_loop():
        # fresh function object => fresh jit cache entry, so the meter
        # mode global (L.set_fast_meter) is re-read at trace time
        @jax.jit
        def _chain_loop(a, k, n):
            def body(_, carry):
                a_c, k_c = carry
                s2 = sig.clone()
                s2.audio_data = a_c
                c = _checksum(s2, k_c)
                eps = 1e-12 * c
                return a_c + eps, _perturb(k_c, eps)

            a_f, _ = jax.lax.fori_loop(0, n, body, (a, k))
            return jnp.sum(a_f[:1, :1, :1])

        return _chain_loop

    _chain_loop = build_chain_loop()
    n1, n2 = jnp.asarray(10), jnp.asarray(20)
    float(_chain_loop(sig.audio_data, kw, n1))
    float(_chain_loop(sig.audio_data, kw, n2))
    # Each leg is single-shot over a jittery tunneled transport, so one
    # stall skews a lone pair by +-15%; take the median of three pairs.
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(_chain_loop(sig.audio_data, kw, n1))
        t1 = time.perf_counter()
        float(_chain_loop(sig.audio_data, kw, n2))
        t2 = time.perf_counter()
        diffs.append(((t2 - t1) - (t1 - t0)) / 10)
    steady = float(np.median(diffs))
    # Calibration sanity: the dispatch-inclusive time is a hard upper
    # bound on true device time — fall back to it (conservative)
    # whenever the calibrated number is not credible.
    if not (0.0 < steady <= dispatch_inclusive):
        steady = dispatch_inclusive

    clips_per_sec = BATCH / steady
    rtf = clips_per_sec * DURATION
    print(
        json.dumps(
            {
                "metric": "clips_per_sec_chip_dispatch_inclusive_tunneled",
                "value": round(BATCH / dispatch_inclusive, 2),
                "unit": "clips/s/chip incl. ~13ms/step tunnel RTT",
                "vs_baseline": round(BATCH / dispatch_inclusive * DURATION / TARGET_RTF, 2),
            }
        ),
        flush=True,
    )

    # Reference-parity companion: the SAME chain with the 512-tap
    # truncated-FIR meter (bit-level parity with the reference's own GPU
    # meter, loudness.py:54-100; 0.63 dB worst-case on a 25 Hz sine).
    # Until r4 this approximation was the FAST path and the headline rode
    # it; the blocked-IIR exact meter now beats it (1.44 vs 2.86 ms e2e,
    # tests/hw/hw_iir_blocked.py), so the headline above is the exact
    # meter and this line tracks the parity mode. One calibration pair
    # (not three): it contextualizes the headline, it is not the headline.
    L.set_fast_meter(True)
    try:
        _chain_loop_fir = build_chain_loop()
        float(_chain_loop_fir(sig.audio_data, kw, n1))
        t0 = time.perf_counter()
        float(_chain_loop_fir(sig.audio_data, kw, n1))
        t1 = time.perf_counter()
        float(_chain_loop_fir(sig.audio_data, kw, n2))
        t2 = time.perf_counter()
        steady_fir = ((t2 - t1) - (t1 - t0)) / 10
        # Timing noise can make the two-point difference non-positive;
        # emit null rather than bare NaN (invalid JSON) in that case.
        noisy = not (0.0 < steady_fir)
        print(
            json.dumps(
                {
                    "metric": "clips_per_sec_chip_b64_5s_chain_fir_meter",
                    "value": None if noisy else round(BATCH / steady_fir, 2),
                    "unit": "clips/s/chip (512-tap reference-parity FIR "
                    "meter chain; headline uses the exact blocked-IIR "
                    "meter, which is also the faster one)",
                    "vs_baseline": None if noisy else round(
                        BATCH / steady_fir * DURATION / TARGET_RTF, 2
                    ),
                }
            ),
            flush=True,
        )
    finally:
        L.set_fast_meter(False)

    # ---- BASELINE "measure & report" metrics + hardware fast-path gate ----
    from audiotools_tpu.ops.benchmark import device_time, device_time_stats
    from audiotools_tpu.ops.pallas_kernels import fir_conv_causal

    T = int(DURATION * SAMPLE_RATE)
    audio = jnp.asarray(
        (np.random.RandomState(0).randn(BATCH, 1, T) * 0.1).astype(np.float32)
    )

    # gate 1: Pallas FIR kernel vs the FFT evaluation of the same kernel
    h = L._composed_fir(SAMPLE_RATE, "K-weighting", 512)
    from audiotools_tpu.ops.filters import causal_fft_conv1d

    y_pl = jax.jit(lambda a: fir_conv_causal(a, h))(audio[:, 0, :])
    y_ff = jax.jit(lambda a: causal_fft_conv1d(a, jnp.asarray(h)))(audio[:, 0, :])
    err_pl = float(jnp.max(jnp.abs(y_pl - y_ff)) / jnp.max(jnp.abs(y_ff)))
    # gate 2: matmul STFT vs the FFT STFT
    sp_mm = jax.jit(lambda a: F.stft(a[:, 0], 2048, 512, method="matmul"))(audio)
    sp_ff = jax.jit(lambda a: F.stft(a[:, 0], 2048, 512, method="fft"))(audio)
    err_mm = float(
        jnp.max(jnp.abs(jnp.abs(sp_mm) - jnp.abs(sp_ff))) / jnp.max(jnp.abs(sp_ff))
    )
    hw_ok = err_pl < 1e-4 and err_mm < 1e-4
    print(
        json.dumps(
            {
                "metric": "hw_fast_path_checks_pallas_fir_matmul_stft",
                "value": 1.0 if hw_ok else 0.0,
                "unit": f"pass (pallas {err_pl:.1e}, matmul {err_mm:.1e})",
                "vs_baseline": 1.0 if hw_ok else 0.0,
            }
        ),
        flush=True,
    )

    # STFT+mel throughput (input bytes / device time, batch-64 x 5 s f32).
    # Sub-5 ms programs carry a spread field: median-of-5 two-point pairs,
    # spread = (max - min) / median (VERDICT r4 weak #4: without it a
    # committed regression ratio can't be told from tunnel jitter).
    st_mel = device_time_stats(
        lambda a: F.mel_spectrogram(a, SAMPLE_RATE, 80, method="matmul"),
        audio,
        iters=10,
    )
    gbps = audio.size * 4 / st_mel["seconds"] / 1e9
    print(
        json.dumps(
            {
                "metric": "stft_mel_throughput_b64_5s_matmul",
                "value": round(gbps, 2),
                "unit": "GB/s input",
                "vs_baseline": _vs("stft_mel_throughput_b64_5s_matmul", gbps),
                "spread": st_mel["spread"],
            }
        ),
        flush=True,
    )

    # LUFS meter real-time factor (audio seconds metered per second):
    # the exact blocked-IIR default, plus the 512-tap Pallas FIR parity
    # mode tracked against its BENCH_r02 first measurement.
    # iters=40: the 1.4 ms program must dwarf the ~13 ms tunnel RTT per
    # leg or the spread is all jitter (measured 0.53 at iters=10)
    st_lufs = device_time_stats(
        lambda a: L.loudness(a, SAMPLE_RATE), audio, iters=40
    )
    lufs_rtf = BATCH * DURATION / st_lufs["seconds"]
    print(
        json.dumps(
            {
                "metric": "lufs_meter_rtf_b64_5s_exact_meter",
                "value": round(lufs_rtf, 0),
                "unit": "x realtime (blocked-IIR exact BS.1770 cascade)",
                "vs_baseline": _vs(
                    "lufs_meter_rtf_b64_5s_exact_meter", lufs_rtf
                ),
                "spread": st_lufs["spread"],
            }
        ),
        flush=True,
    )
    st_lufs_fir = device_time_stats(
        lambda a: L.loudness(a, SAMPLE_RATE, use_fir=True, conv_method="pallas"),
        audio, iters=20,
    )
    lufs_rtf_fir = BATCH * DURATION / st_lufs_fir["seconds"]
    print(
        json.dumps(
            {
                "metric": "lufs_meter_rtf_b64_5s_fast_meter",
                "value": round(lufs_rtf_fir, 0),
                "unit": "x realtime (512-tap Pallas FIR parity mode)",
                "vs_baseline": _vs(
                    "lufs_meter_rtf_b64_5s_fast_meter", lufs_rtf_fir
                ),
                "spread": st_lufs_fir["spread"],
            }
        ),
        flush=True,
    )

    # ---- BASELINE config 1: README-quickstart round trip (mono 5 s:
    # low_pass(8000) -> STFT -> ISTFT), jitted as one program ----
    from audiotools_tpu.ops import filters as FL

    mono = audio[:1]  # (1, 1, T)

    def quickstart(a):
        y = FL.low_pass(a, 8000.0, SAMPLE_RATE)
        spec = F.stft(y[:, 0, :], 2048, 512, "hann", method="matmul")
        return F.istft(
            spec, 2048, 512, "hann", length=a.shape[-1], method="matmul"
        )

    st_q = device_time_stats(quickstart, mono, iters=40)
    q_rtf = DURATION / st_q["seconds"]
    print(
        json.dumps(
            {
                "metric": "quickstart_lowpass_stft_istft_mono_5s_rtf",
                "value": round(q_rtf, 0),
                "unit": "x realtime (BASELINE config 1; host WAV decode "
                "cost is the pipeline line's `decode` fraction)",
                "vs_baseline": _vs(
                    "quickstart_lowpass_stft_istft_mono_5s_rtf", q_rtf
                ),
                "spread": st_q["spread"],
            }
        ),
        flush=True,
    )

    # ---- BASELINE config 3: resample 44.1k->16k + biquad EQ cascade +
    # FFT-conv reverb, batch-64 x 5 s, one jitted program ----
    from audiotools_tpu.ops import resample as R

    # a 0.5 s synthetic RIR and a 3-stage peaking-EQ cascade (musical
    # low-shelf / presence / high-shelf), reverb applied at 16 kHz
    rir = (
        np.random.RandomState(7).randn(8000).astype(np.float32)
        * np.exp(-np.linspace(0.0, 8.0, 8000, dtype=np.float32))
    )
    rir[0] = 1.0
    rir_dev = jnp.asarray(rir[None, :])
    from scipy.signal import iirpeak

    eq_coeffs = []
    for f0, q in ((200.0, 0.7), (1000.0, 1.0), (4000.0, 0.9)):
        b, a = iirpeak(f0, q, fs=16000)
        eq_coeffs.append((b, a, 1.0))

    def config3(x):
        y = R.resample(x, SAMPLE_RATE, 16000)
        y = FL.iir_cascade_blocked(y[:, 0, :], eq_coeffs)
        return FL.fft_conv1d(y, rir_dev)

    st_c3 = device_time_stats(config3, audio, iters=10)
    c3_cps = BATCH / st_c3["seconds"]
    print(
        json.dumps(
            {
                "metric": "resample_eq_reverb_b64_5s_clips_per_sec",
                "value": round(c3_cps, 2),
                "unit": "clips/s (BASELINE config 3: polyphase 44.1k->16k "
                "+ 3-stage blocked-IIR biquad EQ + FFT-conv reverb, "
                f"{c3_cps * DURATION:.0f}x realtime)",
                "vs_baseline": _vs(
                    "resample_eq_reverb_b64_5s_clips_per_sec", c3_cps
                ),
                "spread": st_c3["spread"],
            }
        ),
        flush=True,
    )

    # ---- end-to-end input pipeline (reference measures dataloader
    # items/s incl. salient-excerpt cost, tests/profilers/profile_load.py;
    # this measures the full path: host decode+instantiate -> collate ->
    # int16 wire staging + device_put inside the producer pipeline ->
    # jitted chain with in-program dequantization) ----
    from audiotools_tpu import _hostprof as hostprof

    N_PIPE = 4 * BATCH
    ds_pipe = AudioDataset(
        AudioLoader(sources=[str(root / "spk.csv")]),
        sample_rate=SAMPLE_RATE,
        n_examples=N_PIPE,
        duration=DURATION,
        transform=transform,
    )

    # (a) host-only pass with the cost profiler armed: where the host
    # milliseconds actually go (exclusive self-times; VERDICT r4 weak #1)
    dl_host = DataLoader(
        ds_pipe, batch_size=BATCH, num_workers=8, drop_last=True
    )
    hostprof.reset()
    hostprof.enable()
    t0 = time.perf_counter()
    for _b in dl_host:
        pass
    t_host_only = time.perf_counter() - t0
    hostprof.disable()
    spans = hostprof.totals()
    hostprof.reset()
    # spans accumulate across 8 concurrent worker threads, so their sum
    # exceeds wall clock; report each phase as its SHARE of total span
    # time plus the concurrency factor (span-sum / wall) so the wall
    # cost of any phase is share * concurrency * wall.
    span_sum = sum(spans.values()) or 1.0
    breakdown = {
        k: round(v / span_sum, 3) for k, v in sorted(spans.items())
    }
    breakdown["thread_concurrency"] = round(span_sum / t_host_only, 2)

    # (b) overlapped end-to-end pass: the loader stages each batch onto
    # the device as int16 (half the tunnel bytes) from its producer
    # thread, so batch N+1's host decode and batch N's transfer overlap
    # the consumer's device step; the consumer dequantizes in-jit.
    def _checksum_wire(s, k):
        # transform_args carry AudioSignals too (noise, IR): dequantize
        # the WHOLE batch tree in-program (util.dequantize_batch)
        deq = util.dequantize_batch({"signal": s, "kw": k})
        return _checksum(deq["signal"], deq["kw"])

    jitted_wire = jax.jit(_checksum_wire)
    dl_dev = DataLoader(
        ds_pipe, batch_size=BATCH, num_workers=8, drop_last=True,
        to_device=True, wire_dtype="int16", prefetch_batches=2,
    )
    # compile the wire consumer once outside the timed loop, reusing the
    # host pass's final batch (staging it exactly as the loader would)
    warm = dl_dev._stage(
        {"signal": _b["signal"], "transform_args": _b["transform_args"]}
    )
    float(jitted_wire(warm["signal"], warm["transform_args"]))

    t0 = time.perf_counter()
    out = None
    for _b in dl_dev:
        out = jitted_wire(_b["signal"], _b["transform_args"])
    float(out)
    t_pipe = time.perf_counter() - t0
    pipe_ips = N_PIPE / t_pipe
    # Unhidden overhead: the end-to-end time not accounted for by host
    # work. With a perfect pipeline (decode of batch N+1 overlapping the
    # wire+device of batch N) and the host as bottleneck this tends to
    # the last batch's wire+device tail; serial execution reads the full
    # wire+device cost. The staging thread (data/loader.py) exists to
    # push this toward zero.
    unhidden = max(0.0, (t_pipe - t_host_only) / t_pipe)
    print(
        json.dumps(
            {
                "metric": "pipeline_items_per_sec",
                "value": round(pipe_ips, 1),
                "unit": f"items/s end-to-end (host alone "
                f"{N_PIPE / t_host_only:.0f} items/s on this 1-core box; "
                f"int16 wire halves transfer bytes; unhidden wire+device "
                f"overhead {unhidden * 100:.0f}% of end-to-end)",
                "vs_baseline": 1.0,
                "host_breakdown": breakdown,
            }
        ),
        flush=True,
    )

    # ---- BASELINE config 5: the DAC codec-training loop (VERDICT r2 #1) ----
    # Full-size published-architecture models, batch 16 x 0.38 s @ 44.1 kHz
    # (16764 samples = 33 frames x 512-hop, padded to 16896): (a) the
    # reconstruction step (multi-scale STFT + mel + SI-SDR + VQ losses,
    # fwd+bwd+adamw) and (b) the adversarial two-optimizer step adding the
    # MPD(2/3/5/7/11)+MRD(2048/1024/512) ensemble with LSGAN + feature
    # matching. Same quantities as tests/hw/hw_dac_step.py / hw_adv_step.py.
    import optax

    from audiotools_tpu.models import DAC, Discriminator
    from audiotools_tpu.models.adversarial import make_adversarial_train_step
    from audiotools_tpu.models.train import make_train_step

    TB, TT = 16, 16896
    train_audio = jnp.asarray(
        (np.random.RandomState(1).randn(TB, 1, TT) * 0.1).astype(np.float32)
    )
    # hybrid: shifted-matmul lowering for the narrow (C<=64) residual
    # units only — their conv backward is XLA's worst case (v5e: 67.4 ms
    # vs 69.6 conv / 91.9 all-matmul, tests/hw/hw_resunit_step.py)
    gen = DAC(formulation="hybrid")
    g_params = jax.jit(gen.init)(jax.random.PRNGKey(0), train_audio[:1])
    g_opt = optax.adamw(1e-4)
    g_state = g_opt.init(g_params)

    dac_step = make_train_step(gen, g_opt, SAMPLE_RATE)

    def timed_dac_step(a):
        # consume the updated params so XLA cannot dead-code-eliminate
        # the backward pass + optimizer update
        p2, _, m = dac_step(g_params, g_state, a)
        return m["loss"], p2

    # median-of-3 pairs: a single stalled tunnel leg once read this step
    # at 0.52x its baseline while the adversarial step (a superset of
    # the same generator fwd+bwd) read 0.97x — one pair cannot tell a
    # stall from a regression
    st_dac = device_time_stats(timed_dac_step, train_audio, iters=5, repeats=3)
    t_dac = st_dac["seconds"]
    dac_cps = TB / t_dac
    # Absolute accounting (docs/perf.md): analytic conv/matmul-core FLOPs
    # over the v5e bf16 peak. The generator computes in f32, so ~33% of
    # the bf16 peak is its structural ceiling.
    from audiotools_tpu.ops import perf

    dac_mfu = perf.mfu(perf.dac_train_step_flops(TB, TT), t_dac)
    print(
        json.dumps(
            {
                "metric": "dac_train_step_b16_clips_per_sec",
                "value": round(dac_cps, 2),
                "unit": f"clips/s ({t_dac*1e3:.1f} ms/step, "
                f"{dac_cps * (TT / SAMPLE_RATE):.1f}x realtime, b16 x 0.38s)",
                "vs_baseline": _vs("dac_train_step_b16_clips_per_sec", dac_cps),
                "mfu": round(dac_mfu, 4),
                "spread": st_dac["spread"],
            }
        ),
        flush=True,
    )

    disc = Discriminator()
    d_params = jax.jit(disc.init)(jax.random.PRNGKey(1), train_audio[:1])
    d_opt = optax.adamw(1e-4)
    d_state = d_opt.init(d_params)
    adv_step = make_adversarial_train_step(gen, disc, g_opt, d_opt, SAMPLE_RATE)

    # The adversarial step's fori_loop-wrapped HLO exceeds the tunneled
    # remote-compile upload cap (HTTP 413), and so does the single-step
    # program if the parameter/optimizer trees are closed over (they get
    # inlined as literals; measured in tests/hw/hw_adv_upload.py). Time
    # the RAW step with params as explicit jit arguments (10.7 MB upload)
    # via the queued two-point method, syncing on the loss scalar — the
    # full output (updated params trees) is returned, so nothing in the
    # backward/optimizer path can be dead-code-eliminated.
    from audiotools_tpu.ops.benchmark import device_time_queued

    t_adv = device_time_queued(
        adv_step,
        g_params,
        d_params,
        g_state,
        d_state,
        train_audio,
        iters=5,
        sync=lambda out: out[4]["loss"],
    )
    adv_cps = TB / t_adv
    adv_mfu = perf.mfu(perf.adversarial_train_step_flops(TB, TT), t_adv)
    print(
        json.dumps(
            {
                "metric": "adversarial_train_step_b16_clips_per_sec",
                "value": round(adv_cps, 2),
                "unit": f"clips/s ({t_adv*1e3:.1f} ms/step, "
                f"{adv_cps * (TT / SAMPLE_RATE):.1f}x realtime, b16 x 0.38s, "
                f"MPD+MRD two-optimizer step)",
                "vs_baseline": _vs(
                    "adversarial_train_step_b16_clips_per_sec", adv_cps
                ),
                "mfu": round(adv_mfu, 4),
            }
        ),
        flush=True,
    )

    # The augment chain is HBM-bound (docs/perf.md): report the fraction
    # of the 819 GB/s roofline from XLA's own byte counts when the
    # backend exposes them (zeros otherwise — some tunneled plugins
    # don't).
    chain_cost = perf.xla_cost(_checksum, sig, kw)
    chain_roofline = perf.summarize("chain", steady, cost=chain_cost)

    # headline LAST — the driver parses the final JSON line
    print(
        json.dumps(
            {
                "metric": "clips_per_sec_chip_b64_5s_augment_pitch_mel_lufs",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s/chip",
                "vs_baseline": round(rtf / TARGET_RTF, 2),
                **chain_roofline,
            }
        )
    )


if __name__ == "__main__":
    main()
