"""AMR-NB-class ACELP speech codec (host-side numpy/scipy).

The reference applies the ``Amr-nb`` codec preset through torchaudio's
sox/ffmpeg bindings (reference effects.py:14-25, :370-384). Neither an
AMR library nor ffmpeg exists in this image, so this module implements
the codec itself: an analysis-by-synthesis ACELP coder with the
AMR-NB 12.2 kbit/s (3GPP TS 26.090 / GSM-EFR) architecture —

  * 8 kHz mono, 20 ms frames (160 samples), four 5 ms subframes;
  * 80 Hz high-pass preprocessing;
  * 10th-order LP analysis per frame, coded as mean-removed AR-predicted
    scalar-quantized LSFs (38 bits) and interpolated per subframe;
  * open-loop + closed-loop adaptive codebook (lags 18..145 at 1/3
    fractional resolution via an 8-tap windowed-sinc interpolator,
    7+2 bits) with a 4-bit pitch gain;
  * 10-pulse algebraic codebook: five interleaved tracks of eight
    positions, two signed pulses per track (8 bits/track);
  * 5-bit predictive log-domain fixed-codebook gain;
  * decoder-side adaptive postfilter Â(z/γn)/Â(z/γd) with spectral-tilt
    compensation and gain normalization (TS 26.090 §6.2.1 structure).

270 bits/frame → 13.5 kbit/s, the 12.2-mode class. The bit allocation
and quantizer tables are this implementation's own; the output is an
AMR-class narrowband telephone codec, NOT bit-exact with
opencore-amrnb. That matches the preset's role in the reference — a
codec *augmentation* imposing narrowband ACELP artifacts — which is
behavioral, not bitstream, parity.

Host-side only (codecs are sequential per-frame recursions, run once
per item at augmentation time like the MP3/GSM/Vorbis paths in
``io/codecs.py``); the per-sample recursions run in C via
``scipy.signal.lfilter`` with states rebuilt from raw sample memories
by ``lfiltic`` (the LP coefficients change every subframe, so the
transferable state is past samples, not internal DF2T registers).
"""

from __future__ import annotations

import numpy as np
import scipy.signal as _ss

SR = 8000
FRAME = 160
SUBFRAME = 40
N_SUBFRAMES = 4
ORDER = 10

PIT_MIN = 18
PIT_MAX = 145  # 7 bits: lags 18..145

# Perceptual weighting W(z) = A(z/G1)/A(z/G2)  (TS 26.090 §5.3, MR122)
GAMMA1 = 0.9
GAMMA2 = 0.6

# Postfilter H(z) = A(z/GN)/A(z/GD) * tilt  (§6.2.1)
POST_GN = 0.55
POST_GD = 0.7
POST_MU = 0.8

# --- LSF quantizer ----------------------------------------------------
# Long-term LSF means: the near-uniform spacing over (0, pi) that the
# classic ITU/3GPP mean tables cluster around.
LSF_MEAN = np.pi * np.arange(1, ORDER + 1) / (ORDER + 1)
LSF_PRED = 0.65  # AR(1) prediction of the mean-removed vector
LSF_BITS = (4, 4, 4, 4, 4, 4, 4, 4, 3, 3)
LSF_RANGE = (0.18, 0.22, 0.26, 0.28, 0.28, 0.28, 0.26, 0.24, 0.22, 0.20)
LSF_MIN_GAP = 0.0125 * np.pi  # ~50 Hz

GP_BITS = 4
GP_MAX = 1.2

# Fixed gain: AR(0.7)-predicted 20*log10(gc), 5-bit residual over
# +/-16 dB (predictive coding covers the wide dynamic range of the
# int16-scaled residual with ~1 dB steps).
GC_BITS = 5
GC_PRED = 0.7
GC_RES_DB = 16.0
GC_DB_MIN, GC_DB_MAX = -40.0, 75.0
GC_DB_INIT = 10.0

TRACKS = 5
TRACK_LEN = SUBFRAME // TRACKS  # 8 positions per track
POS_BITS = 3

FRAC_BITS = 2  # pitch-lag fraction in thirds: 0, 1/3, 2/3
SUBFRAME_BITS = 7 + FRAC_BITS + GP_BITS + TRACKS * (2 * POS_BITS + 2) + GC_BITS
FRAME_BITS = sum(LSF_BITS) + N_SUBFRAMES * SUBFRAME_BITS

_MAGIC = b"ATNB"

# 80 Hz 2nd-order Butterworth high-pass at 8 kHz (precomputed bilinear
# design; the spec's preprocessing filter is the same class).
_HP_B = np.array([0.95654323, -1.91308646, 0.95654323])
_HP_A = np.array([1.0, -1.91119707, 0.91497583])


# ----------------------------------------------------------------------
# Filtering primitives — raw-sample memories, newest first
# ----------------------------------------------------------------------


def _syn_filt(a, x, mem):
    """y = x / A(z). ``mem`` = last ORDER outputs, newest first."""
    zi = _ss.lfiltic(np.array([1.0]), a, mem)
    y, _ = _ss.lfilter([1.0], a, x, zi=zi)
    return y, np.concatenate([y[::-1], mem])[:ORDER]


def _fir_filt(a, x, mem):
    """y = x * A(z). ``mem`` = last ORDER inputs, newest first."""
    zi = _ss.lfiltic(a, np.array([1.0]), np.zeros(0), mem)
    y, _ = _ss.lfilter(a, [1.0], x, zi=zi)
    return y, np.concatenate([x[::-1], mem])[:ORDER]


def _levinson(r):
    """Levinson-Durbin recursion; r[0..ORDER] -> a with a[0] = 1."""
    a = np.zeros(ORDER + 1)
    a[0] = 1.0
    err = float(r[0])
    if err <= 1e-9:
        return a
    for i in range(1, ORDER + 1):
        acc = r[i]
        for j in range(1, i):
            acc += a[j] * r[i - j]
        k = float(np.clip(-acc / err, -0.999, 0.999))
        prev = a.copy()
        for j in range(1, i):
            a[j] = prev[j] + k * prev[i - j]
        a[i] = k
        err *= 1.0 - k * k
        if err <= 1e-12:
            break
    return a


def _lp_analysis(speech_ext):
    """Autocorrelation LP over a 240-sample Hamming window."""
    x = speech_ext * np.hamming(len(speech_ext))
    r = np.array([np.dot(x[: len(x) - k], x[k:]) for k in range(ORDER + 1)])
    r[0] = r[0] * 1.0001 + 1e-6  # white-noise correction floor
    # 60 Hz bandwidth-expansion lag window
    r *= np.exp(-0.5 * (2 * np.pi * 60.0 * np.arange(ORDER + 1) / SR) ** 2)
    return _levinson(r)


def _a_to_lsf(a, grid_points=1024):
    """LP -> line spectral frequencies (sum/difference polynomial roots
    located by sign changes on a dense cosine grid + linear refine)."""
    m = ORDER // 2
    f1 = np.zeros(m + 1)
    f2 = np.zeros(m + 1)
    f1[0] = f2[0] = 1.0
    for i in range(m):
        f1[i + 1] = a[i + 1] + a[ORDER - i] - f1[i]
        f2[i + 1] = a[i + 1] - a[ORDER - i] + f2[i]

    w = np.linspace(0.0, np.pi, grid_points)
    ks = np.arange(m, 0, -1)
    basis = 2.0 * np.cos(np.outer(w, ks))  # (grid, m)

    roots = []
    for f in (f1, f2):
        v = basis @ f[:m] + f[m]
        sign_flip = np.where(np.signbit(v[:-1]) != np.signbit(v[1:]))[0]
        for i in sign_flip:
            t = v[i] / (v[i] - v[i + 1])
            roots.append(w[i] + t * (w[i + 1] - w[i]))
    if len(roots) != ORDER:
        return LSF_MEAN.copy()  # degenerate LP (silence etc.)
    return np.sort(np.array(roots))


def _lsf_to_a(lsf):
    """LSFs -> LP coefficients: A(z) = (P(z) + Q(z)) / 2 with P from the
    even-indexed and Q from the odd-indexed frequencies."""
    w = np.sort(lsf)
    p = np.array([1.0])
    for wr in w[0::2]:
        p = np.convolve(p, [1.0, -2.0 * np.cos(wr), 1.0])
    q = np.array([1.0])
    for wr in w[1::2]:
        q = np.convolve(q, [1.0, -2.0 * np.cos(wr), 1.0])
    p = np.convolve(p, [1.0, 1.0])  # restore trivial root z = -1
    q = np.convolve(q, [1.0, -1.0])  # restore trivial root z = +1
    return (0.5 * (p + q))[: ORDER + 1]


def _stabilize_lsf(lsf):
    lsf = np.sort(np.clip(lsf, 0.005 * np.pi, 0.995 * np.pi))
    for i in range(1, ORDER):
        if lsf[i] - lsf[i - 1] < LSF_MIN_GAP:
            mid = 0.5 * (lsf[i] + lsf[i - 1])
            lsf[i - 1] = mid - 0.5 * LSF_MIN_GAP
            lsf[i] = mid + 0.5 * LSF_MIN_GAP
    return np.clip(lsf, 0.004 * np.pi, 0.996 * np.pi)


def _bw_expand(a, gamma):
    return a * gamma ** np.arange(ORDER + 1)


def _interp_lsf(prev, cur):
    """Per-subframe LSF interpolation (TS 26.090 §5.2.6 pattern)."""
    ws = ((0.75, 0.25), (0.5, 0.5), (0.25, 0.75), (0.0, 1.0))
    return [_stabilize_lsf(wp * prev + wc * cur) for wp, wc in ws]


def _interp_taps(frac):
    """8-tap windowed-sinc interpolator for a ``frac``/3-sample
    fractional delay (the spec's b60 table plays this role at 1/6
    resolution, TS 26.090 §5.6). Tap m weights exc at offset m-4."""
    t = np.arange(-4, 4) + frac / 3.0
    w = np.sinc(t) * (0.54 + 0.46 * np.cos(np.pi * t / 4.5))
    return w / w.sum()


def _adaptive_vector(exc, lag, frac=0):
    """Past-excitation vector delayed by ``lag + frac/3`` samples.

    Integer part: direct slice; lags shorter than the subframe repeat
    the most recent ``lag`` samples (standard LTP simplification of the
    spec's extended-excitation rule). Fractional part: windowed-sinc
    interpolation over the history, with the last up-to-3 samples of a
    short-lag period falling back to integer values (their taps would
    cross into the not-yet-formed excitation)."""
    base = len(exc) - lag
    if frac == 0:
        if lag >= SUBFRAME:
            return exc[base : base + SUBFRAME]
        return np.tile(exc[base:], -(-SUBFRAME // lag))[:SUBFRAME]
    taps = _interp_taps(frac)
    L = min(SUBFRAME, lag - 3)
    v = np.empty(SUBFRAME)
    v[:L] = np.correlate(exc[base - 4 : base + L + 3], taps, "valid")[:L]
    for n in range(L, SUBFRAME):
        v[n] = v[n - lag] if n >= lag else exc[base + n - lag]
    return v


def _zero_state(c, h):
    """Zero-state response of the weighted synthesis cascade."""
    return np.convolve(c, h)[:SUBFRAME]


# ----------------------------------------------------------------------
# Bit packing
# ----------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, nbits):
        v = int(value)
        self.bits.extend((v >> i) & 1 for i in range(nbits - 1, -1, -1))

    def tobytes(self):
        bits = np.array(self.bits, dtype=np.uint8)
        return np.packbits(bits).tobytes()


class _BitReader:
    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def get(self, nbits):
        v = 0
        for _ in range(nbits):
            v = (v << 1) | int(self.bits[self.pos])
            self.pos += 1
        return v


# ----------------------------------------------------------------------
# Quantizers (encoder and decoder share the state recursions)
# ----------------------------------------------------------------------


def _quant_lsf(lsf, pred_state):
    resid = (lsf - LSF_MEAN) - LSF_PRED * pred_state
    idx = np.empty(ORDER, dtype=np.int64)
    deq = np.empty(ORDER)
    for i in range(ORDER):
        levels = 1 << LSF_BITS[i]
        step = 2.0 * LSF_RANGE[i] / levels
        q = int(np.clip(round(resid[i] / step + levels / 2), 0, levels - 1))
        idx[i] = q
        deq[i] = (q - levels / 2) * step
    new_state = LSF_PRED * pred_state + deq
    return idx, _stabilize_lsf(LSF_MEAN + new_state), new_state


def _dequant_lsf(idx, pred_state):
    deq = np.empty(ORDER)
    for i in range(ORDER):
        levels = 1 << LSF_BITS[i]
        step = 2.0 * LSF_RANGE[i] / levels
        deq[i] = (int(idx[i]) - levels / 2) * step
    new_state = LSF_PRED * pred_state + deq
    return _stabilize_lsf(LSF_MEAN + new_state), new_state


_GP_STEP = GP_MAX / ((1 << GP_BITS) - 1)


def _quant_gp(gp):
    idx = int(np.clip(round(gp / _GP_STEP), 0, (1 << GP_BITS) - 1))
    return idx, idx * _GP_STEP


def _dequant_gp(idx):
    return idx * _GP_STEP


_GC_STEP = 2.0 * GC_RES_DB / ((1 << GC_BITS) - 1)


def _quant_gc(gc, pred_db):
    db = 20.0 * np.log10(max(gc, 1e-6))
    db = float(np.clip(db, GC_DB_MIN, GC_DB_MAX))
    resid = db - GC_PRED * pred_db
    idx = int(
        np.clip(round(resid / _GC_STEP + (1 << GC_BITS) / 2), 0, (1 << GC_BITS) - 1)
    )
    q_db = GC_PRED * pred_db + (idx - (1 << GC_BITS) / 2) * _GC_STEP
    q_db = float(np.clip(q_db, GC_DB_MIN, GC_DB_MAX))
    return idx, 10.0 ** (q_db / 20.0), q_db


def _dequant_gc(idx, pred_db):
    q_db = GC_PRED * pred_db + (idx - (1 << GC_BITS) / 2) * _GC_STEP
    q_db = float(np.clip(q_db, GC_DB_MIN, GC_DB_MAX))
    return 10.0 ** (q_db / 20.0), q_db


# ----------------------------------------------------------------------
# Algebraic codebook
# ----------------------------------------------------------------------


def _algebraic_search(x2, h):
    """Two signed pulses per interleaved track, chosen greedily on the
    backward-filtered target d(n) = <x2[n:], h[:N-n]> — the standard
    simplification of the spec's nested-loop search (signs follow d,
    positions maximize |d| within each track)."""
    d = np.array([np.dot(x2[n:], h[: SUBFRAME - n]) for n in range(SUBFRAME)])
    c = np.zeros(SUBFRAME)
    pulses = []
    for t in range(TRACKS):
        track = np.arange(t, SUBFRAME, TRACKS)
        best = track[np.argsort(-np.abs(d[track]))][:2]
        for p in best:
            s = 1.0 if d[p] >= 0 else -1.0
            c[p] += s
            pulses.append((int(p), s))
    return pulses, c


# ----------------------------------------------------------------------
# Encoder
# ----------------------------------------------------------------------


class _EncoderState:
    def __init__(self):
        self.hp_zi = np.zeros(2)
        self.prev_speech = np.zeros(80)  # LP-window lookback
        self.lsf_pred = np.zeros(ORDER)
        self.prev_lsf_q = LSF_MEAN.copy()
        self.gc_pred_db = GC_DB_INIT
        self.exc = np.zeros(PIT_MAX + SUBFRAME)
        # clean weighted-speech path W(z) = A(z/g1)/A(z/g2)
        self.wf_mem = np.zeros(ORDER)  # FIR A(z/g1) inputs (speech)
        self.ws_mem = np.zeros(ORDER)  # 1/A(z/g2) outputs
        # quantized path 1/Aq -> A(z/g1) -> 1/A(z/g2)
        self.syn_mem = np.zeros(ORDER)  # 1/Aq outputs (synthesis)
        self.wqf_mem = np.zeros(ORDER)  # FIR inputs (= synthesis)
        self.wqs_mem = np.zeros(ORDER)  # 1/A(z/g2) outputs
        self.prev_wsp = np.zeros(PIT_MAX)  # open-loop pitch history


def _weighted_impulse(aq, a1, a2):
    imp = np.zeros(SUBFRAME)
    imp[0] = 1.0
    h, _ = _syn_filt(aq, np.convolve(imp, a1)[:SUBFRAME], np.zeros(ORDER))
    h, _ = _syn_filt(a2, h, np.zeros(ORDER))
    return h


def _encode_frame(speech, st: _EncoderState, bw: _BitWriter):
    # LP analysis over [previous 80 | current 160]
    a = _lp_analysis(np.concatenate([st.prev_speech, speech]))
    lsf = _stabilize_lsf(_a_to_lsf(a))
    idx, lsf_q, st.lsf_pred = _quant_lsf(lsf, st.lsf_pred)
    for i in range(ORDER):
        bw.put(idx[i], LSF_BITS[i])
    lsf_sub = _interp_lsf(st.prev_lsf_q, lsf_q)
    st.prev_lsf_q = lsf_q
    st.prev_speech = speech[-80:].copy()

    aq_subs = [_lsf_to_a(l) for l in lsf_sub]
    a1_subs = [_bw_expand(aq, GAMMA1) for aq in aq_subs]
    a2_subs = [_bw_expand(aq, GAMMA2) for aq in aq_subs]

    # weighted speech for the full frame (commits the clean-path memories)
    wsp = np.empty(FRAME)
    for s in range(N_SUBFRAMES):
        seg = speech[s * SUBFRAME : (s + 1) * SUBFRAME]
        r, st.wf_mem = _fir_filt(a1_subs[s], seg, st.wf_mem)
        w, st.ws_mem = _syn_filt(a2_subs[s], r, st.ws_mem)
        wsp[s * SUBFRAME : (s + 1) * SUBFRAME] = w

    # open-loop pitch: normalized correlation of the frame's weighted
    # speech against its own past
    buf = np.concatenate([st.prev_wsp, wsp])
    cur = buf[PIT_MAX:]
    best_ol, best_v = PIT_MIN, -np.inf
    for lag in range(PIT_MIN, PIT_MAX + 1):
        past = buf[PIT_MAX - lag : PIT_MAX - lag + FRAME]
        v = np.dot(cur, past) / np.sqrt(np.dot(past, past) + 1e-9)
        if v > best_v:
            best_v, best_ol = v, lag
    st.prev_wsp = buf[-PIT_MAX:].copy()

    for s in range(N_SUBFRAMES):
        aq, a1, a2 = aq_subs[s], a1_subs[s], a2_subs[s]
        h = _weighted_impulse(aq, a1, a2)
        w_seg = wsp[s * SUBFRAME : (s + 1) * SUBFRAME]

        # target = weighted speech minus the quantized path's zero-input
        # response (memories probed, not committed)
        z, _ = _syn_filt(aq, np.zeros(SUBFRAME), st.syn_mem)
        z, _ = _fir_filt(a1, z, st.wqf_mem)
        z, _ = _syn_filt(a2, z, st.wqs_mem)
        x = w_seg - z

        # closed-loop adaptive codebook around the open-loop lag:
        # integer stage, then 1/3-fraction refinement around the winner
        def _score(lag, frac):
            v = _adaptive_vector(st.exc, lag, frac)
            y1 = _zero_state(v, h)
            num = np.dot(x, y1)
            s = num * num / (np.dot(y1, y1) + 1e-9) if num > 0 else 0.0
            return s, v, y1

        lo, hi = max(PIT_MIN, best_ol - 5), min(PIT_MAX, best_ol + 5)
        best = (-np.inf, lo, 0, None, None)  # score, lag, frac, v, y1
        for lag in range(lo, hi + 1):
            score, v, y1 = _score(lag, 0)
            if score > best[0]:
                best = (score, lag, 0, v, y1)
        t0 = best[1]
        for lag, frac in (
            (t0 - 1, 1), (t0 - 1, 2), (t0, 1), (t0, 2)
        ):
            if lag < PIT_MIN or lag > PIT_MAX:
                continue
            score, v, y1 = _score(lag, frac)
            if score > best[0]:
                best = (score, lag, frac, v, y1)
        _, lag, frac, v_adapt, y1 = best
        gp = float(np.clip(np.dot(x, y1) / (np.dot(y1, y1) + 1e-9), 0.0, GP_MAX))
        gp_idx, gp_q = _quant_gp(gp)
        bw.put(lag - PIT_MIN, 7)
        bw.put(frac, FRAC_BITS)
        bw.put(gp_idx, GP_BITS)

        # algebraic codebook on the updated target
        x2 = x - gp_q * y1
        pulses, c = _algebraic_search(x2, h)
        y2 = _zero_state(c, h)
        gc = max(float(np.dot(x2, y2) / (np.dot(y2, y2) + 1e-9)), 0.0)
        gc_idx, gc_q, st.gc_pred_db = _quant_gc(gc, st.gc_pred_db)
        for t in range(TRACKS):
            for p, sign in pulses[2 * t : 2 * t + 2]:
                bw.put(p // TRACKS, POS_BITS)
                bw.put(0 if sign > 0 else 1, 1)
        bw.put(gc_idx, GC_BITS)

        # commit state with the quantized excitation
        u = gp_q * v_adapt + gc_q * c
        st.exc = np.concatenate([st.exc[SUBFRAME:], u])
        syn, st.syn_mem = _syn_filt(aq, u, st.syn_mem)
        r, st.wqf_mem = _fir_filt(a1, syn, st.wqf_mem)
        _, st.wqs_mem = _syn_filt(a2, r, st.wqs_mem)


# ----------------------------------------------------------------------
# Decoder
# ----------------------------------------------------------------------


class _DecoderState:
    def __init__(self):
        self.lsf_pred = np.zeros(ORDER)
        self.prev_lsf_q = LSF_MEAN.copy()
        self.gc_pred_db = GC_DB_INIT
        self.exc = np.zeros(PIT_MAX + SUBFRAME)
        self.syn_mem = np.zeros(ORDER)
        self.pf_fir_mem = np.zeros(ORDER)  # A(z/gn) inputs
        self.pf_syn_mem = np.zeros(ORDER)  # 1/A(z/gd) outputs
        self.tilt_mem = 0.0
        self.agc_gain = 1.0


def _decode_frame(br: _BitReader, st: _DecoderState):
    idx = [br.get(LSF_BITS[i]) for i in range(ORDER)]
    lsf_q, st.lsf_pred = _dequant_lsf(idx, st.lsf_pred)
    lsf_sub = _interp_lsf(st.prev_lsf_q, lsf_q)
    st.prev_lsf_q = lsf_q

    out = np.empty(FRAME)
    for s in range(N_SUBFRAMES):
        aq = _lsf_to_a(lsf_sub[s])
        lag = br.get(7) + PIT_MIN
        frac = br.get(FRAC_BITS)
        gp_q = _dequant_gp(br.get(GP_BITS))
        c = np.zeros(SUBFRAME)
        for t in range(TRACKS):
            for _ in range(2):
                p = br.get(POS_BITS) * TRACKS + t
                c[p] += -1.0 if br.get(1) else 1.0
        gc_q, st.gc_pred_db = _dequant_gc(br.get(GC_BITS), st.gc_pred_db)

        u = gp_q * _adaptive_vector(st.exc, lag, frac) + gc_q * c
        st.exc = np.concatenate([st.exc[SUBFRAME:], u])
        syn, st.syn_mem = _syn_filt(aq, u, st.syn_mem)

        # adaptive postfilter: A(z/gn)/A(z/gd), tilt, AGC
        r, st.pf_fir_mem = _fir_filt(_bw_expand(aq, POST_GN), syn, st.pf_fir_mem)
        pf, st.pf_syn_mem = _syn_filt(_bw_expand(aq, POST_GD), r, st.pf_syn_mem)
        r0 = np.dot(pf, pf) + 1e-9
        k1 = np.dot(pf[1:], pf[:-1]) / r0
        mu = POST_MU * max(float(k1), 0.0)
        tilted = pf - mu * np.concatenate([[st.tilt_mem], pf[:-1]])
        st.tilt_mem = float(pf[-1])
        g_target = float(np.sqrt(np.dot(syn, syn) / (np.dot(tilted, tilted) + 1e-9)))
        decay = 0.99 ** np.arange(1, SUBFRAME + 1)
        g = decay * (st.agc_gain - g_target) + g_target
        st.agc_gain = float(g[-1])
        out[s * SUBFRAME : (s + 1) * SUBFRAME] = tilted * g
    return out


# ----------------------------------------------------------------------
# Public API
# ----------------------------------------------------------------------


def bitrate() -> float:
    """Coded bitrate in bits/s (13.5 kbit/s — the 12.2-mode class)."""
    return FRAME_BITS / (FRAME / SR)


def encode(audio: np.ndarray) -> bytes:
    """Encode mono float 8 kHz audio in [-1, 1] to an ACELP bitstream.

    Layout: ``b"ATNB"`` + uint32 sample count + packed frames.
    """
    x = np.asarray(audio, dtype=np.float64).reshape(-1)
    n = len(x)
    n_frames = -(-n // FRAME) if n else 0
    x = np.pad(x, (0, n_frames * FRAME - n)) * 32768.0

    st = _EncoderState()
    bw = _BitWriter()
    for f in range(n_frames):
        seg, st.hp_zi = _ss.lfilter(
            _HP_B, _HP_A, x[f * FRAME : (f + 1) * FRAME], zi=st.hp_zi
        )
        _encode_frame(seg, st, bw)
    return _MAGIC + np.uint32(n).tobytes() + bw.tobytes()


def decode(data: bytes) -> np.ndarray:
    """Decode an ``encode`` bitstream back to mono float32 8 kHz audio.

    Raises ``ValueError`` on a bad magic, a truncated payload, or a
    header sample count inconsistent with the payload size (so corrupt
    files fail cleanly instead of crashing mid-frame or over-allocating).
    """
    if data[:4] != _MAGIC:
        raise ValueError("not an ATNB bitstream")
    if len(data) < 8:
        raise ValueError("truncated ATNB header")
    n = int(np.frombuffer(data[4:8], dtype=np.uint32)[0])
    n_frames = -(-n // FRAME) if n else 0
    need = (n_frames * FRAME_BITS + 7) // 8
    if len(data) - 8 < need:
        raise ValueError(
            f"truncated ATNB payload: header promises {n_frames} frames "
            f"({need} bytes), got {len(data) - 8}"
        )
    br = _BitReader(data[8:])
    st = _DecoderState()
    out = np.empty(n_frames * FRAME)
    for f in range(n_frames):
        out[f * FRAME : (f + 1) * FRAME] = _decode_frame(br, st)
    # int16-range saturation, as in any fixed-point decoder
    return (np.clip(out[:n], -32768.0, 32767.0) / 32768.0).astype(np.float32)


def amrnb_available() -> bool:
    """The codec is self-contained numpy/scipy — always available."""
    return True


def amrnb_roundtrip(data: np.ndarray) -> np.ndarray:
    """Encode+decode ``(C, T)`` float32 8 kHz audio through the ACELP
    codec; channels are coded independently (the codec is mono).
    Mirrors ``codecs.gsm_roundtrip`` — the caller resamples to/from
    8 kHz. Used by ``apply_codec(preset="Amr-nb")`` (reference
    effects.py:14-25, torchaudio path :370-384)."""
    data = np.asarray(data, dtype=np.float32)
    squeeze = data.ndim == 1
    if squeeze:
        data = data[None, :]
    out = np.stack([decode(encode(ch)) for ch in data])
    if squeeze:
        out = out[0]
    return out.astype(np.float32)
