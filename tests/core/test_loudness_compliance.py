"""BS.1770 compliance suite on synthesized signals with ANALYTIC targets.

The reference pins its meter against 17 ITU-R BS.2217 conformance WAVs
(`/root/reference/tests/core/test_loudness.py:56-233`, atol 0.1 dB); those
files are git-lfs stubs in this environment, so this suite rebuilds the
same coverage from first principles:

* steady sines (the 23LKFS_*/24LKFS_* family): for a sine at frequency
  ``f`` and amplitude ``A``, every 400 ms gating block has identical
  power, gating is a no-op, and the integrated loudness is EXACTLY

      -0.691 + 10 log10( sum_ch G_ch * (A^2/2) * |H(f)|^2 )

  where ``|H(f)|`` is the K-weighting cascade's frequency response —
  evaluated here directly from the designed biquad coefficients
  (``np.polyval`` on the unit circle), fully independent of the meter's
  time-domain implementation.
* the absolute-gate case (reference ``test_abs_gate_test``): silence
  inserted into a sine must be gated out, not averaged in.
* the relative-gate case (reference ``test_rel_gate_test``): a segment
  >10 LU below the loud passage must be gated out.

All assertions use the reference suite's 0.1 dB tolerance for the steady
sines (0.3 dB for the gating constructions, whose block-boundary blocks
are not analytically flat).
"""
import numpy as np
import pytest

from audiotools_tpu import AudioSignal
from audiotools_tpu.ops import loudness as L

SR = 48000


def _kweight_power_gain(freq: float, rate: int) -> float:
    """|H(f)|^2 through the K-weighting cascade, from the designed
    biquad coefficients (analytic, no filtering involved)."""
    z = np.exp(2j * np.pi * freq / rate)
    total = 1.0
    for (b, a), passband_gain in L.design_filters(rate, "K-weighting"):
        h = np.polyval(np.asarray(b, np.float64), z) / np.polyval(
            np.asarray(a, np.float64), z
        )
        total *= (passband_gain * abs(h)) ** 2
    return total


def _analytic_sine_lufs(freq: float, amp_db: float, nch: int, rate: int) -> float:
    amp = 10.0 ** (amp_db / 20.0)
    per_ch_power = (amp**2 / 2.0) * _kweight_power_gain(freq, rate)
    gains = np.asarray(L.CHANNEL_GAINS[:nch], np.float64)
    return -0.691 + 10.0 * np.log10(np.sum(gains * per_ch_power))


def _sine(freq: float, amp_db: float, nch: int, dur: float, rate: int) -> np.ndarray:
    t = np.arange(int(dur * rate)) / rate
    x = (10.0 ** (amp_db / 20.0)) * np.sin(2 * np.pi * freq * t)
    return np.tile(x.astype(np.float32)[None, None, :], (1, nch, 1))


@pytest.mark.parametrize("amp_db", [-23.0, -24.0])
@pytest.mark.parametrize("freq", [25.0, 100.0, 500.0, 1000.0, 2000.0, 10000.0])
def test_sine_2ch_matches_analytic(freq, amp_db):
    """Mirror of the reference's 23LKFS_*/24LKFS_* 2-channel sine
    conformance files (test_loudness.py:56-178), atol 0.1 dB."""
    sig = AudioSignal(_sine(freq, amp_db, 2, 10.0, SR), SR)
    got = float(np.asarray(sig.loudness())[0])
    want = _analytic_sine_lufs(freq, amp_db, 2, SR)
    assert abs(got - want) < 0.1, (freq, amp_db, got, want)


def test_sine_mono_and_five_channel_gains():
    """Channel weighting: mono counts once; a 5-channel signal applies
    the 1.41 surround gains (BS.1770-4 table 3)."""
    got_1 = float(
        np.asarray(AudioSignal(_sine(997.0, -24.0, 1, 5.0, SR), SR).loudness())[0]
    )
    want_1 = _analytic_sine_lufs(997.0, -24.0, 1, SR)
    assert abs(got_1 - want_1) < 0.1

    got_5 = float(
        np.asarray(AudioSignal(_sine(997.0, -24.0, 5, 5.0, SR), SR).loudness())[0]
    )
    want_5 = _analytic_sine_lufs(997.0, -24.0, 5, SR)
    assert abs(got_5 - want_5) < 0.1
    # the surround channels add 2 * 1.41 * P on top of 3 * P
    assert got_5 > got_1 + 10 * np.log10(5 / 1) - 1.0


def test_abs_gate_discards_silence():
    """Silence inside the programme must not drag the integrated value
    (reference test_abs_gate_test, test_loudness.py:181-189)."""
    loud = _sine(1000.0, -23.0, 2, 8.0, SR)
    quiet = np.zeros_like(loud[..., : 8 * SR])
    sig = AudioSignal(np.concatenate([loud, quiet, loud], axis=-1), SR)
    got = float(np.asarray(sig.loudness())[0])
    want = _analytic_sine_lufs(1000.0, -23.0, 2, SR)
    assert abs(got - want) < 0.3, (got, want)

    # sanity: averaging silence in WOULD have moved it by ~3 dB
    ungated = 10 * np.log10(2 / 3) + want  # power diluted by a third
    assert got > ungated + 1.0


def test_rel_gate_discards_quiet_passage():
    """A passage more than 10 LU below the loud material is removed by
    the relative gate (reference test_rel_gate_test, :192-200)."""
    loud = _sine(1000.0, -23.0, 2, 10.0, SR)
    quiet = _sine(1000.0, -45.0, 2, 10.0, SR)
    sig = AudioSignal(np.concatenate([loud, quiet], axis=-1), SR)
    got = float(np.asarray(sig.loudness())[0])
    want = _analytic_sine_lufs(1000.0, -23.0, 2, SR)
    assert abs(got - want) < 0.3, (got, want)


def test_quiet_passage_within_10lu_is_kept():
    """Counter-case pinning the gate threshold: material 6 LU down stays
    in the integration, pulling the result below the loud-only value."""
    loud = _sine(1000.0, -23.0, 2, 10.0, SR)
    quiet = _sine(1000.0, -29.0, 2, 10.0, SR)
    sig = AudioSignal(np.concatenate([loud, quiet], axis=-1), SR)
    got = float(np.asarray(sig.loudness())[0])
    loud_only = _analytic_sine_lufs(1000.0, -23.0, 2, SR)
    mixed = -0.691 + 10 * np.log10(
        0.5 * 10 ** ((loud_only + 0.691) / 10.0)
        + 0.5 * 10 ** ((loud_only - 6 + 0.691) / 10.0)
    )
    assert abs(got - mixed) < 0.3, (got, mixed)
    assert got < loud_only - 0.8


def test_fast_meter_matches_on_compliance_sines():
    """The truncated-FIR fast meter vs the exact composed response, on
    the compliance sines (reference FIR-vs-IIR check: 1e-2 dB on
    broadband fixtures, test_loudness.py:236-263).

    512 taps truncate the high-pass stage's tail: fine broadband and
    above ~500 Hz, but 0.195 dB off on a pure 100 Hz sine (0.63 at
    25 Hz). This mirrors the reference's own GPU meter, which is the
    same 512-tap truncation (reference loudness.py:54-100) — so the
    default fast meter keeps 512 for parity and speed, while
    ``set_fast_meter(zeros=2048)`` (<1e-2 dB everywhere measured, at
    ~2x meter cost) covers narrowband low-frequency material. The
    default exact meter is compliant everywhere."""
    for freq in (25.0, 100.0, 1000.0, 10000.0):
        x = _sine(freq, -24.0, 2, 5.0, SR)
        exact = float(np.asarray(L.loudness(x, SR, use_fir=False))[0])
        fir_2048 = float(
            np.asarray(L.loudness(x, SR, use_fir=True, zeros=2048))[0]
        )
        # 25 Hz is the hardest case: 0.63 dB off at 512 taps, 0.008 at 2048
        assert abs(exact - fir_2048) < 1e-2, (freq, exact, fir_2048)
        if freq < 100:
            continue

        fir_512 = float(
            np.asarray(L.loudness(x, SR, use_fir=True, zeros=512))[0]
        )
        tol = 0.25 if freq < 500 else 2e-2
        assert abs(exact - fir_512) < tol, (freq, exact, fir_512)
