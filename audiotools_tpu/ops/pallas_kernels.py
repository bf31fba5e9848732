"""Pallas TPU kernels for the hot DSP paths.

``fir_conv_causal``: causal FIR convolution ``y[n] = sum_k h[k] x[n-k]``
as a blocked Toeplitz matmul on the MXU.

Why a kernel: XLA evaluates long-FIR convolution either via FFT (VPU
bound — measured ~14 ms for batch-64 x 5 s with the BS.1770 composed
kernel) or via an im2col that materializes a (T, K) matrix (gigabytes).
This kernel streams the signal once per grid step (HBM -> VMEM DMA) and
accumulates the convolution as a sum of (ROWS, 128) @ (128, 128) matmuls
against static Toeplitz slices of the kernel — im2col without ever
touching HBM with it.

Derivation: with the signal viewed as 128-wide blocks ``s[p, c]``
(``n = p*128 + c``) and the output tile ``y[r*128 + j]`` for ``r`` in a
chunk of ROWS rows, causality gives

    y[r, j] = sum_k h[k] x[r*128 + j - k]
            = sum_q  s[r + q, :] . M_q[:, j]

where ``q`` indexes kernel blocks and ``M_q[c, j] = h[KP + j - q*128 - c]``
(zero outside [0, K)) — each ``q`` contributes one MXU matmul over a
sublane-shifted slice of the span.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fir_conv_causal",
    "fir_conv_causal_batch",
    "istft_synthesis_fused",
    "rotation_cumprod",
]

BLK = 128        # output tile width (lane dim)
ROWS = 64        # output rows per grid step (sublane dim of the matmul)
CHUNK = BLK * ROWS  # outputs per grid step
MAX_TAPS = 8192  # hardware-validated kernel-length envelope (see docstring)


def _round_up(x, m):
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=16)
def _toeplitz_blocks(h_bytes):
    """M[q, c, j] = h[KP + j - (q*128 + c)] (zero out of range), built
    with the same static gather map as the traced path.

    ``KP`` is rounded to 8 blocks (1024) so the per-tile DMA span
    ``S_blk = ROWS + KP // BLK`` stays a multiple of the f32 sublane tile
    (8): an unaligned 94-row span (3723-tap kernel) deterministically
    faulted the TPU runtime, while 72/80/96-row spans are fine.

    Keyed on the raw kernel bytes with a small bound: each entry is up to
    ~4.3 MB (8192 taps) and distinct kernels are few in practice (meter
    FIRs, filter banks) — unbounded growth under kernel sweeps is not.
    """
    h = np.frombuffer(h_bytes, dtype=np.float32)
    idx, KP, W_blk = _toeplitz_gather_indices(len(h))
    hz = np.append(h, np.float32(0.0))
    return hz[idx], KP, W_blk


def _make_kernel(W_blk, S_blk, per_item=False):
    """One factory for both the shared-kernel and per-item-kernel convs;
    ``per_item`` selects the (B, W_blk, BLK, BLK) block indexing."""

    def _kernel(x_ref, m_ref, o_ref, span, sem):
        b = pl.program_id(0)
        t = pl.program_id(1)

        dma = pltpu.make_async_copy(
            x_ref.at[b, pl.ds(t * ROWS, S_blk), :], span, sem
        )
        dma.start()
        dma.wait()

        acc = jnp.zeros((ROWS, BLK), dtype=jnp.float32)
        for q in range(W_blk):
            # HIGHEST: multi-pass bf16 on the MXU, fp32-accurate — a raw
            # single-pass matmul costs ~3.6e-3 rel err on hardware
            acc = acc + jax.lax.dot_general(
                span[pl.ds(q, ROWS), :],
                m_ref[0, q, :, :] if per_item else m_ref[q, :, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        o_ref[0, :, :] = acc

    return _kernel


def fir_conv_causal(x: jnp.ndarray, h: np.ndarray, interpret: bool = False):
    """Causal convolution of ``(..., T)`` signals with a shared FIR kernel
    ``h`` (host-side numpy), truncated to ``T`` samples.

    Matches ``filters.causal_fft_conv1d`` to float32 accuracy; runs on the
    MXU instead of the VPU FFT path.

    Hardware-validated envelope: kernels up to ``MAX_TAPS`` (v5e-measured
    ~6e-7 rel err at 1023/2048/3723/8192 taps). Cost grows linearly with
    taps while the FFT path is ~flat, so the crossover is ~8k taps
    (1023 taps: 5.3 ms vs 12.3 ms FFT; 8192 taps: 15.8 vs 16.4) — prefer
    ``filters.causal_fft_conv1d`` beyond that.
    """
    h = np.asarray(h, dtype=np.float32)
    if len(h) > MAX_TAPS and not interpret:
        raise ValueError(
            f"fir_conv_causal validated only up to {MAX_TAPS} taps on "
            f"hardware (got {len(h)}); use filters.causal_fft_conv1d"
        )
    M_np, KP, W_blk = _toeplitz_blocks(h.tobytes())

    T = x.shape[-1]
    batch_shape = x.shape[:-1]
    xf = x.reshape((-1, T)).astype(jnp.float32)
    B = xf.shape[0]

    T_out = _round_up(T, CHUNK)
    n_chunks = T_out // CHUNK
    # front-pad with KP zeros (causal history); the tail pad also covers
    # the last chunk's span over-read
    xp = jnp.pad(xf, ((0, 0), (KP, T_out - T + BLK)))
    n_blk_total = xp.shape[-1] // BLK
    xb = xp.reshape(B, n_blk_total, BLK)

    S_blk = ROWS + KP // BLK  # span blocks needed per grid step

    out = pl.pallas_call(
        _make_kernel(W_blk, S_blk),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (W_blk, BLK, BLK), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        # NB: index_map returns BLOCK indices (scaled by block_shape)
        out_specs=pl.BlockSpec(
            (1, ROWS, BLK), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T_out // BLK, BLK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S_blk, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T_out * W_blk * BLK,
            bytes_accessed=4 * (B * T_out * 2 + W_blk * BLK * BLK),
            transcendentals=0,
        ),
    )(xb, jnp.asarray(M_np))

    y = out.reshape(B, T_out)[:, :T]
    return y.reshape(batch_shape + (T,))


@functools.lru_cache(maxsize=None)
def _toeplitz_gather_indices(K: int):
    """Static (W_blk, BLK, BLK) gather map m -> h-index for building the
    Toeplitz blocks of a TRACED kernel in-graph: index KP + j - (q*BLK + c),
    with out-of-range entries redirected to a zero slot at position K."""
    KP = _round_up(K - 1, 8 * BLK) if K > 1 else 0
    W_blk = KP // BLK + 1
    q = np.arange(W_blk)[:, None, None]
    c = np.arange(BLK)[None, :, None]
    j = np.arange(BLK)[None, None, :]
    idx = KP + j - (q * BLK + c)
    valid = (idx >= 0) & (idx < K)
    idx = np.where(valid, idx, K)  # K = zero slot
    return idx.astype(np.int32), KP, W_blk


def fir_conv_causal_batch(
    x: jnp.ndarray, h: jnp.ndarray, interpret: bool = False
):
    """Causal convolution of ``(B, T)`` signals with PER-ITEM (traced)
    FIR kernels ``h`` of shape ``(B, K)`` — the MXU path for per-item
    filter banks (telescoped equalizer, per-item low-pass cutoffs), where
    :func:`fir_conv_causal`'s host-precomputed Toeplitz blocks don't
    apply. The blocks are built in-graph with one static gather
    (~W_blk*16K floats per item) and streamed per batch row; grid
    iteration keeps each item's blocks VMEM-resident across its time
    steps.
    """
    B, T = x.shape
    K = h.shape[-1]
    if h.shape[0] != B:
        raise ValueError(f"kernel batch {h.shape[0]} != signal batch {B}")
    if K > MAX_TAPS and not interpret:
        raise ValueError(
            f"fir_conv_causal_batch validated only up to {MAX_TAPS} taps "
            f"(got {K}); use filters.overlap_save_valid"
        )
    idx, KP, W_blk = _toeplitz_gather_indices(K)
    hz = jnp.concatenate(
        [h.astype(jnp.float32), jnp.zeros((B, 1), jnp.float32)], axis=-1
    )
    M = hz[:, idx]  # (B, W_blk, BLK, BLK)

    xf = x.astype(jnp.float32)
    T_out = _round_up(T, CHUNK)
    n_chunks = T_out // CHUNK
    xp = jnp.pad(xf, ((0, 0), (KP, T_out - T + BLK)))
    xb = xp.reshape(B, xp.shape[-1] // BLK, BLK)

    S_blk = ROWS + KP // BLK

    out = pl.pallas_call(
        _make_kernel(W_blk, S_blk, per_item=True),
        grid=(B, n_chunks),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                (1, W_blk, BLK, BLK),
                lambda b, t: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, ROWS, BLK), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, T_out // BLK, BLK), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((S_blk, BLK), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T_out * W_blk * BLK,
            bytes_accessed=4 * (B * T_out * 2 + B * W_blk * BLK * BLK),
            transcendentals=0,
        ),
    )(xb, M)

    y = out.reshape(B, T_out)[:, :T]
    return y


# ---------------------------------------------------------------------------
# fused phase vocoder (phasor formulation)
# ---------------------------------------------------------------------------

_PV_ROW_TILE = 1024  # lanes per grid step


def _pv_kernel(n_steps: int, with_phasor: bool = False):
    """``with_phasor=True`` additionally emits the unit phasor track
    ``P[s]`` (the scan carry, free to write) — the custom VJP's residual,
    which saves the backward a full re-scan + relayout of the rotation
    planes (measured 7.5 ms of the first backward cut's 23 ms,
    tests/hw/hw_pv_bwd_parts.py)."""

    def kernel(i0_ref, i1_ref, frac_ref, zr_ref, zi_ref, or_ref, oi_ref,
               *p_refs):
        # seed: the first analysis frame's unit phasor (frame i0[0] == 0)
        sr = zr_ref[pl.ds(0, 1), :]
        si = zi_ref[pl.ds(0, 1), :]
        s_mag = jnp.sqrt(sr * sr + si * si)
        nonzero = s_mag > 0.0
        safe = jnp.where(nonzero, s_mag, 1.0)
        acc_r = jnp.where(nonzero, sr / safe, 1.0)
        acc_i = jnp.where(nonzero, si / safe, 0.0)

        def body(s, carry):
            acc_r, acc_i = carry
            a = i0_ref[s]
            b = i1_ref[s]
            f = frac_ref[s]
            z0r = zr_ref[pl.ds(a, 1), :]
            z0i = zi_ref[pl.ds(a, 1), :]
            z1r = zr_ref[pl.ds(b, 1), :]
            z1i = zi_ref[pl.ds(b, 1), :]
            a0 = jnp.sqrt(z0r * z0r + z0i * z0i)
            a1 = jnp.sqrt(z1r * z1r + z1i * z1i)

            # emit BEFORE advancing: out[s] = mag[s] * prod_{k<s} u[k]
            mag = (1.0 - f) * a0 + f * a1
            or_ref[pl.ds(s, 1), :] = mag * acc_r
            oi_ref[pl.ds(s, 1), :] = mag * acc_i
            if with_phasor:
                p_refs[0][pl.ds(s, 1), :] = acc_r
                p_refs[1][pl.ds(s, 1), :] = acc_i

            # unit rotation u[s] = z1 * conj(z0) / (|z0||z1|); zero frames
            # contribute the identity rotation (matches ops/stretch.py)
            wr = z1r * z0r + z1i * z0i
            wi = z1i * z0r - z1r * z0i
            norm = a0 * a1
            ok = norm > 0.0
            inv = 1.0 / jnp.where(ok, norm, 1.0)
            ur = jnp.where(ok, wr * inv, 1.0)
            ui = jnp.where(ok, wi * inv, 0.0)
            return acc_r * ur - acc_i * ui, acc_r * ui + acc_i * ur

        jax.lax.fori_loop(0, n_steps, body, (acc_r, acc_i))

    return kernel


def phase_vocoder_fused(
    stft_data: jnp.ndarray,
    i0: np.ndarray,
    i1: np.ndarray,
    frac: np.ndarray,
    interpret: bool = False,
    with_phasor: bool = False,
):
    """Fused phasor-formulation phase vocoder: one pass over the spectrum.

    The XLA evaluations materialize several (B, F, T) planes in HBM
    (magnitudes, gathers, the scan planes); this kernel keeps the whole
    per-row rotation scan in VMEM. Layout: time on sublanes, (B*F) rows
    on lanes, so the per-step frame loads are dynamic sublane slices.

    ``i0``/``i1``/``frac`` are the static step index/interpolation arrays
    (``ops.stretch._pv_indices``). Returns ``(..., F, n_steps)`` complex;
    with ``with_phasor=True`` returns ``(out, (Pr, Pi))`` where ``P`` is
    the unit phasor track ``out = mag * P`` — the custom VJP's residual
    (its backward needs ``P``, and emitting the scan carry here is far
    cheaper than re-scanning: tests/hw/hw_pv_bwd_parts.py).
    """
    *lead, F_bins, T = stft_data.shape
    n_steps = int(i0.shape[0])
    rows = int(np.prod(lead, dtype=np.int64)) * F_bins if lead else F_bins

    # 4 double-buffered output blocks (out + P) blow the 16 MB scoped
    # VMEM limit at the 1024-lane tile; halve the tile for that variant
    tile = _PV_ROW_TILE // 2 if with_phasor else _PV_ROW_TILE

    # (rows, T) -> (T, rows); pad rows to the lane tile
    zr = jnp.real(stft_data).reshape(rows, T).T
    zi = jnp.imag(stft_data).reshape(rows, T).T
    r_pad = -rows % tile
    if r_pad:
        zr = jnp.pad(zr, ((0, 0), (0, r_pad)))
        zi = jnp.pad(zi, ((0, 0), (0, r_pad)))
    t_pad = -T % 8
    if t_pad:
        zr = jnp.pad(zr, ((0, t_pad), (0, 0)))
        zi = jnp.pad(zi, ((0, t_pad), (0, 0)))
    s_pad = -n_steps % 8
    rows_p = rows + r_pad

    n_out = 4 if with_phasor else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(rows_p // tile,),
        in_specs=[
            pl.BlockSpec((T + t_pad, tile), lambda j, *_: (0, j)),
            pl.BlockSpec((T + t_pad, tile), lambda j, *_: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((n_steps + s_pad, tile), lambda j, *_: (0, j))
        ]
        * n_out,
    )
    outs = pl.pallas_call(
        _pv_kernel(n_steps, with_phasor=with_phasor),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_steps + s_pad, rows_p), jnp.float32)
        ]
        * n_out,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=rows_p * n_steps * 24,
            bytes_accessed=4 * rows_p * (2 * (T + t_pad) + n_out * n_steps),
            transcendentals=0,
        ),
    )(
        jnp.asarray(i0, dtype=np.int32),
        jnp.asarray(i1, dtype=np.int32),
        jnp.asarray(frac, dtype=np.float32),
        zr,
        zi,
    )
    out_shape = tuple(lead) + (F_bins, n_steps)

    def _back(x):
        return x[:n_steps, :rows].T.reshape(out_shape)

    out = jax.lax.complex(_back(outs[0]), _back(outs[1]))
    if with_phasor:
        return out, (_back(outs[2]), _back(outs[3]))
    return out


def _rot_scan_kernel(n_steps: int):
    """Exclusive cumulative rotation: emit the carry, then advance it by
    the step's rotation — the ``_pv_kernel`` scan without magnitudes."""

    def kernel(ur_ref, ui_ref, cr_ref, ci_ref, pr_ref, pi_ref):
        def body(s, carry):
            ar, ai = carry
            pr_ref[pl.ds(s, 1), :] = ar
            pi_ref[pl.ds(s, 1), :] = ai
            ur = ur_ref[pl.ds(s, 1), :]
            ui = ui_ref[pl.ds(s, 1), :]
            return ar * ur - ai * ui, ar * ui + ai * ur

        jax.lax.fori_loop(
            0, n_steps, body, (cr_ref[pl.ds(0, 1), :], ci_ref[pl.ds(0, 1), :])
        )

    return kernel


def rotation_cumprod(
    ur: jnp.ndarray,
    ui: jnp.ndarray,
    cr: jnp.ndarray,
    ci: jnp.ndarray,
    interpret: bool = False,
):
    """Exclusive cumulative complex product over the last axis:
    ``P[0] = c``, ``P[s+1] = P[s] * u[s]`` for real-pair planes
    ``(ur, ui)`` of shape ``(..., n)`` and seeds ``(cr, ci)`` of shape
    ``(...,)``. Returns ``(Pr, Pi)`` shaped like ``ur``.

    This is :func:`phase_vocoder_fused`'s in-VMEM rotation scan without
    the magnitude modulation; its custom VJP uses it to reconstruct the
    unit phasor track ``P`` in the backward pass (one kernel pass instead
    of an HBM-resident associative scan). Same layout: steps on sublanes,
    rows on lanes.
    """
    *lead, n = ur.shape
    rows = int(np.prod(lead, dtype=np.int64)) if lead else 1
    urt = ur.reshape(rows, n).T
    uit = ui.reshape(rows, n).T
    crf = cr.reshape(rows)
    cif = ci.reshape(rows)
    r_pad = -rows % _PV_ROW_TILE
    s_pad = -n % 8
    if r_pad:
        urt = jnp.pad(urt, ((0, 0), (0, r_pad)))
        uit = jnp.pad(uit, ((0, 0), (0, r_pad)))
        crf = jnp.pad(crf, (0, r_pad))
        cif = jnp.pad(cif, (0, r_pad))
    if s_pad:
        urt = jnp.pad(urt, ((0, s_pad), (0, 0)))
        uit = jnp.pad(uit, ((0, s_pad), (0, 0)))
    rows_p = rows + r_pad
    # seed as an 8-row block (sublane tile); the kernel reads row 0
    seed_r = jnp.pad(crf[None, :], ((0, 7), (0, 0)))
    seed_i = jnp.pad(cif[None, :], ((0, 7), (0, 0)))

    pr, pi = pl.pallas_call(
        _rot_scan_kernel(n),
        grid=(rows_p // _PV_ROW_TILE,),
        in_specs=[
            pl.BlockSpec((n + s_pad, _PV_ROW_TILE), lambda j: (0, j)),
            pl.BlockSpec((n + s_pad, _PV_ROW_TILE), lambda j: (0, j)),
            pl.BlockSpec((8, _PV_ROW_TILE), lambda j: (0, j)),
            pl.BlockSpec((8, _PV_ROW_TILE), lambda j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((n + s_pad, _PV_ROW_TILE), lambda j: (0, j)),
            pl.BlockSpec((n + s_pad, _PV_ROW_TILE), lambda j: (0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n + s_pad, rows_p), jnp.float32),
            jax.ShapeDtypeStruct((n + s_pad, rows_p), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=rows_p * n * 6,
            bytes_accessed=4 * rows_p * n * 4,
            transcendentals=0,
        ),
    )(urt, uit, seed_r, seed_i)
    out_shape = tuple(lead) + (n,)
    return (
        pr[:n, :rows].T.reshape(out_shape),
        pi[:n, :rows].T.reshape(out_shape),
    )


# ---------------------------------------------------------------------------
# fused istft synthesis: inverse-DFT matmul + overlap-add + envelope divide
# ---------------------------------------------------------------------------

_SYN_TM = 64  # output hop-rows per grid step (sublane dim of the matmuls)


def _syn_kernel(r, TM, H):
    def kernel(cur_ref, prev_ref, w_ref, env_ref, out_ref):
        g = pl.program_id(1)
        m0 = g * TM
        acc = jnp.zeros((TM, H), jnp.float32)
        for j in range(r):
            if j == 0:
                rows = cur_ref[0]
            else:
                rows = jnp.concatenate(
                    [prev_ref[0, 8 - j :, :], cur_ref[0, : TM - j, :]],
                    axis=0,
                )
            # single-pass bf16 matmul with f32 accumulation — the
            # numerics of istft(method="matmul_bf16") (the weights are
            # handed in as bf16; DEFAULT precision on bf16 is one pass)
            part = jax.lax.dot_general(
                rows.astype(jnp.bfloat16),
                w_ref[:, j * H : (j + 1) * H],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if j:
                # rows with global frame index m0 + t - j < 0 only exist
                # at g == 0 (the clamped prev block aliases real rows)
                t_idx = jax.lax.broadcasted_iota(jnp.int32, (TM, 1), 0)
                part = jnp.where(m0 + t_idx - j >= 0, part, 0.0)
            acc = acc + part
        out_ref[0] = acc * env_ref[:]

    return kernel


def istft_synthesis_fused(
    spec_re: jnp.ndarray,
    spec_im: jnp.ndarray,
    Ci: jnp.ndarray,
    Si: jnp.ndarray,
    hop: int,
    inv_env: np.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused iSTFT synthesis: windowed inverse-DFT matmul, overlap-add and
    window-square envelope division in ONE kernel pass.

    Measured on v5e (tests/hw/hw_istft_fused.py): SPEED-NEUTRAL with
    istft(method="matmul_bf16") — XLA already fuses the OLA and envelope
    into the synthesis program — so this kernel's value is peak memory:
    it never materializes the (B, nt, n_fft) frame tensor (254 MB at
    bench shapes, growing linearly with signal length), which matters
    for long-signal synthesis. With hop H and r = n_fft // H, output
    chunk m is ``sum_j frames[m - j][jH:(j+1)H]``, so each grid step
    computes r matmuls of its spec rows against column slices of the
    (window-fused) iDFT matrix and writes each output sample exactly
    once:

        out[m0:m0+TM] = (sum_j S[m0-j : m0+TM-j] @ W[:, jH:(j+1)H]) * env

    Layout: the re/im spec planes concatenate on the contraction axis
    (one matmul instead of two); the previous grid step's last 8 rows
    arrive as a second, 8-row block of the same array (r <= 8). Weights
    are bf16-resident (~9 MB VMEM at n_fft=2048) — this kernel implements
    the ``matmul_bf16`` synthesis numerics; use the unfused paths for f32.

    ``spec_re``/``spec_im``: (B, nt, n_freq) f32 (frames on rows).
    ``Ci``/``Si``: (n_freq, n_fft) window-fused iDFT matrices.
    ``inv_env``: host-side (out_len,) reciprocal envelope (1 where the
    window-square sum is below threshold). Returns (B, out_len) f32.
    """
    B, NT, F = spec_re.shape
    n_fft = Ci.shape[1]
    if n_fft % hop:
        raise ValueError("fused synthesis needs hop | n_fft")
    r = n_fft // hop
    if r > 8:
        raise ValueError("fused synthesis supports n_fft/hop <= 8")
    H = hop
    TM = _SYN_TM
    out_len = int(inv_env.shape[0])
    M_total = NT + r - 1
    G = -(-M_total // TM)
    NT_pad = G * TM
    F2 = _round_up(2 * F, 128)

    S2 = jnp.concatenate([spec_re, spec_im], axis=-1)
    S2 = jnp.pad(S2, ((0, 0), (0, NT_pad - NT), (0, F2 - 2 * F)))
    W2 = jnp.pad(
        jnp.concatenate([Ci, Si], axis=0), ((0, F2 - 2 * F), (0, 0))
    ).astype(jnp.bfloat16)

    env = np.ones(NT_pad * H, dtype=np.float32)
    env[:out_len] = np.asarray(inv_env, dtype=np.float32)
    env = jnp.asarray(env.reshape(NT_pad, H))

    out = pl.pallas_call(
        _syn_kernel(r, TM, H),
        grid=(B, G),
        in_specs=[
            pl.BlockSpec(
                (1, TM, F2), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM
            ),
            # previous step's tail: an 8-row block just left of `cur`
            # (clamped at the start; the kernel masks the aliased rows)
            pl.BlockSpec(
                (1, 8, F2),
                lambda b, g: (b, jnp.maximum(g * (_SYN_TM // 8) - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (F2, n_fft), lambda b, g: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (TM, H), lambda b, g: (g, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, TM, H), lambda b, g: (b, g, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, G * TM, H), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * G * TM * F2 * n_fft,
            bytes_accessed=4 * B * NT_pad * F2 + 2 * F2 * n_fft
            + 4 * B * G * TM * H,
            transcendentals=0,
        ),
    )(S2, S2, W2, env)

    return out.reshape(B, G * TM * H)[:, :out_len]
