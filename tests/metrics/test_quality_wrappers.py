"""Plumbing tests for the gated pesq/visqol wrappers (VERDICT r1 #10).

The real C/C++ libraries are absent in this environment, so the argument
plumbing — per-item iteration, mono downmix, resampling to each metric's
required rate, argument order (reference first!), score extraction — is
pinned against stub modules injected into ``sys.modules``. A wrapper that
has never executed is a latent bug; these tests execute every line except
the external call itself (reference quality.py:64-159)."""
import sys
import types

import numpy as np
import pytest

from audiotools_tpu import AudioSignal


def _sig(batch=2, seconds=0.5, sr=44100, channels=2, seed=0):
    rng = np.random.RandomState(seed)
    x = (rng.randn(batch, channels, int(seconds * sr)) * 0.1).astype(np.float32)
    return AudioSignal(x, sr)


def test_pesq_wrapper_plumbing(monkeypatch):
    calls = []

    def fake_pesq(fs, ref, deg, mode):
        calls.append((fs, np.asarray(ref).copy(), np.asarray(deg).copy(), mode))
        return 3.0 + len(calls) * 0.25

    fake_mod = types.ModuleType("pesq")
    fake_mod.pesq = fake_pesq
    monkeypatch.setitem(sys.modules, "pesq", fake_mod)

    from audiotools_tpu.metrics import quality

    est, ref = _sig(seed=1), _sig(seed=2)
    out = np.asarray(quality.pesq(est, ref, mode="wb", target_sr=16000))

    assert len(calls) == 2  # one call per batch item
    assert out.tolist() == [3.25, 3.5]  # per-item scores, in order
    for i, (fs, r, d, mode) in enumerate(calls):
        assert fs == 16000  # resampled to the requested PESQ rate
        assert mode == "wb"
        assert r.ndim == 1 and d.ndim == 1  # mono 1-D arrays
        assert len(r) == int(0.5 * 16000)
    # reference goes FIRST (degraded second) — the classic pesq footgun
    ref16 = ref.clone().to_mono().resample(16000)
    np.testing.assert_allclose(
        calls[0][1], np.asarray(ref16.audio_data[0, 0]), atol=1e-6
    )


def test_visqol_wrapper_plumbing(monkeypatch):
    measured = []
    created_cfgs = []

    class _Opts:
        def __init__(self):
            self.use_speech_scoring = None
            self.svr_model_path = None

    class _Audio:
        def __init__(self):
            self.sample_rate = None

    class _Cfg:
        def __init__(self):
            self.options = _Opts()
            self.audio = _Audio()

    class _Result:
        def __init__(self, score):
            self.moslqo = score

    class _Api:
        def Create(self, cfg):
            created_cfgs.append(cfg)

        def Measure(self, ref, deg):
            measured.append((np.asarray(ref).copy(), np.asarray(deg).copy()))
            return _Result(4.0 + 0.1 * len(measured))

    lib = types.ModuleType("visqol.visqol_lib_py")
    lib.VisqolApi = _Api
    lib.__file__ = "/opt/fake_visqol/__init__.py"
    pb2 = types.ModuleType("visqol.pb2.visqol_config_pb2")
    pb2.VisqolConfig = _Cfg
    pkg = types.ModuleType("visqol")
    pkg.visqol_lib_py = lib
    pb2pkg = types.ModuleType("visqol.pb2")
    pb2pkg.visqol_config_pb2 = pb2
    monkeypatch.setitem(sys.modules, "visqol", pkg)
    monkeypatch.setitem(sys.modules, "visqol.visqol_lib_py", lib)
    monkeypatch.setitem(sys.modules, "visqol.pb2", pb2pkg)
    monkeypatch.setitem(sys.modules, "visqol.pb2.visqol_config_pb2", pb2)

    from audiotools_tpu.metrics import quality

    est, ref = _sig(seed=3), _sig(seed=4)
    out = np.asarray(quality.visqol(est, ref, mode="audio"))

    cfg = created_cfgs[0]
    assert cfg.audio.sample_rate == 48000  # audio mode -> 48 kHz
    assert cfg.options.use_speech_scoring is False
    assert cfg.options.svr_model_path.endswith("model/libsvm_nu_svr_model.txt")
    assert len(measured) == 2
    np.testing.assert_allclose(out, [4.1, 4.2])
    r, d = measured[0]
    assert r.dtype == np.float64 and d.dtype == np.float64
    assert len(r) == int(0.5 * 48000)  # resampled to 48 kHz mono

    # speech mode flips the scoring flag and the rate
    measured.clear()
    created_cfgs.clear()
    quality.visqol(est, ref, mode="speech")
    cfg = created_cfgs[0]
    assert cfg.audio.sample_rate == 16000
    assert cfg.options.use_speech_scoring is True

    with pytest.raises(ValueError, match="Unrecognized mode"):
        quality.visqol(est, ref, mode="nope")


def test_wrappers_raise_cleanly_without_libs():
    """Without the stubs, the gates raise actionable RuntimeErrors."""
    for name in ("pesq", "visqol", "visqol.visqol_lib_py"):
        assert name not in sys.modules or "fake" not in str(sys.modules[name])
    from audiotools_tpu.metrics import quality

    est, ref = _sig(), _sig(seed=9)
    try:
        import pesq  # noqa: F401
    except ImportError:
        # the default backend now falls back to the native P.862
        # implementation; only an explicit backend='itu' demands the lib
        with pytest.raises(RuntimeError, match="pesq"):
            quality.pesq(est, ref, backend="itu")
    try:
        import visqol  # noqa: F401
    except ImportError:
        # same pattern: only backend='google' demands the C++ library,
        # the default falls back to the in-package NSIM backend
        with pytest.raises(RuntimeError, match="visqol|ViSQOL"):
            quality.visqol(est, ref, backend="google")


def test_uncertified_backends_warn_once_per_process():
    """VERDICT r2 #4: the native PESQ backend and the NSIM ViSQOL
    backend must flag their uncertified absolute scale at call time —
    once per process, like WhisperMixin's experimental warning."""
    import warnings

    from audiotools_tpu.metrics import quality

    est, ref = _sig(seconds=1.0, seed=3), _sig(seconds=1.0, seed=3)

    quality._warned_uncertified.clear()
    with pytest.warns(UserWarning, match="NOT certified"):
        quality.pesq(est, ref, mode="nb", backend="native")
    # second call in the same process stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        quality.pesq(est, ref, mode="nb", backend="native")

    quality._warned_uncertified.clear()
    with pytest.warns(UserWarning, match="uncertified logistic fit"):
        quality.visqol(est, ref, mode="speech", backend="nsim")
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        quality.visqol(est, ref, mode="speech", backend="nsim")
