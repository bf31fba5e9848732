"""Phase-vocoder formulation equivalence.

The default ``angle`` evaluation (atan2 + exact-mod advance + wrapped
cumsum + cos/sin) and the high-precision ``phasor`` evaluation
(cumulative unit-rotation scan, no transcendentals) agree wherever
adjacent analysis frames are nonzero: the synthesis phase only enters
the output through ``exp(i*phase)`` and phase wraps are invisible in
the complex domain. (At a transient zero the step-advance conventions
differ — see ``phase_vocoder``'s docstring.)
Reference behavior: sox tempo/pitch via
`/root/reference/audiotools/core/effects.py:247-309` (ours is the
differentiable on-device replacement; float64 loop oracle in
tests/parity/oracles.py).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiotools_tpu.ops import stretch as S


def _random_spec(rng, B, F_b, T):
    re = rng.randn(B, F_b, T).astype(np.float32)
    im = rng.randn(B, F_b, T).astype(np.float32)
    return re, im


@pytest.mark.parametrize(
    "formulation", ["phasor", "phasor_fused_interpret"]
)
@pytest.mark.parametrize("rate", [2.0 ** (-2.0 / 12.0), 1.31, 0.77])
def test_phasor_matches_angle_formulation(rate, formulation):
    rng = np.random.RandomState(0)
    re, im = _random_spec(rng, 2, 129, 61)
    spec = jnp.asarray(re) + 1j * jnp.asarray(im)

    hop, win = 64, 256
    got = np.asarray(
        S.phase_vocoder(spec, rate, hop, win, formulation=formulation)
    )
    want = np.asarray(S.phase_vocoder(spec, rate, hop, win, formulation="angle"))
    scale = np.abs(want).max()
    # the difference is the ANGLE path's own f32 cumsum random walk
    # (measured 2e-5 vs the float64 oracle at 431 steps where the phasor
    # path reads 5e-6 — the rotation scan is tree-ordered, log-depth
    # error growth); at these 47-79 step counts it sits well under 1e-4
    assert np.abs(got - want).max() / scale < 1e-4


@pytest.mark.parametrize("formulation", ["angle", "phasor"])
def test_formulations_match_float64_loop_oracle(formulation):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "parity"))
    import oracles

    rng = np.random.RandomState(1)
    re, im = _random_spec(rng, 1, 65, 83)
    spec_np = (re[0] + 1j * im[0]).astype(np.complex128)
    rate, hop, win = 1.21, 32, 128

    got = np.asarray(
        S.phase_vocoder(
            jnp.asarray(spec_np.astype(np.complex64)), rate, hop, win,
            formulation=formulation,
        )
    )
    want = oracles.numpy_phase_vocoder(spec_np, rate, hop, win)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 1e-4


def test_unknown_formulation_raises():
    # typos must fail loudly instead of silently changing numerics
    spec = jnp.zeros((1, 5, 8), dtype=jnp.complex64)
    with pytest.raises(ValueError, match="formulation"):
        S.phase_vocoder(spec, 1.5, 16, 64, formulation="anlge")


@pytest.mark.parametrize(
    "formulation", ["angle", "phasor", "phasor_fused_interpret"]
)
def test_silent_bins_stay_silent_and_finite(formulation):
    # a bin that is exactly zero everywhere must come out zero (mag 0) and
    # not poison neighbouring steps (phasor: the normalization guard;
    # angle: atan2(0, 0) == 0)
    rng = np.random.RandomState(2)
    re, im = _random_spec(rng, 1, 9, 40)
    re[:, 3, :] = 0.0
    im[:, 3, :] = 0.0
    spec = jnp.asarray(re) + 1j * jnp.asarray(im)
    out = np.asarray(S.phase_vocoder(spec, 1.5, 16, 64, formulation=formulation))
    assert np.all(np.isfinite(out))
    assert np.abs(out[:, 3, :]).max() == 0.0


@pytest.mark.parametrize("rate", [1.3, 0.77, 2.0 ** (-2.0 / 12.0)])
def test_fused_grad_matches_phasor_formulation(rate):
    """The fused kernel's custom VJP (stretch._fused_pv_diff: one extra
    rotation-scan kernel pass + a reversed cumsum) must reproduce the
    pure-jnp phasor path's autodiff. Tolerance 5e-5: both paths measure
    1.4-2.4e-5 max grad error vs a float64 oracle at these shapes (their
    own f32 rounding), so mutual agreement cannot be pinned tighter."""
    rng = np.random.RandomState(3)
    re, im = _random_spec(rng, 2, 17, 25)
    # silent bin + transient zero: hit the where-branch subgradients
    re[:, 3, :] = 0.0
    im[:, 3, :] = 0.0
    re[0, 5, 7] = 0.0
    im[0, 5, 7] = 0.0

    def make(form):
        def loss(r, i):
            out = S.phase_vocoder(
                jax.lax.complex(r, i), rate, 8, 32, formulation=form
            )
            return jnp.sum(jnp.abs(out) ** 2) + 0.5 * jnp.sum(jnp.real(out))

        return loss

    gfr, gfi = jax.grad(make("phasor_fused_interpret"), argnums=(0, 1))(
        jnp.asarray(re), jnp.asarray(im)
    )
    gpr, gpi = jax.grad(make("phasor"), argnums=(0, 1))(
        jnp.asarray(re), jnp.asarray(im)
    )
    scale = max(float(jnp.abs(gpr).max()), float(jnp.abs(gpi).max()))
    assert float(jnp.abs(gfr - gpr).max()) / scale < 5e-5
    assert float(jnp.abs(gfi - gpi).max()) / scale < 5e-5


@pytest.mark.parametrize("n_semitones", [2.0, -3.0])
def test_pitch_shift_fused_is_differentiable(n_semitones):
    """pitch_shift/time_stretch under jax.grad take the fused path (both
    resample-first and stretch-first branches); grads match the phasor
    formulation through the full STFT -> PV -> ISTFT -> resample chain.
    SURVEY §2 sells differentiable pitch/stretch as the TPU build's
    advantage over the reference's sox subprocess (effects.py:247-309);
    with the custom VJP the FAST path is also the differentiable one."""
    rng = np.random.RandomState(5)
    audio = (rng.randn(2, 3000) * 0.1).astype(np.float32)

    def make(form):
        def loss(a):
            out = S.pitch_shift(
                a, n_semitones, 44100, 256, 64, pv_formulation=form
            )
            return jnp.sum(out**2)

        return loss

    gf = jax.jit(jax.grad(make("phasor_fused_interpret")))(jnp.asarray(audio))
    gp = jax.jit(jax.grad(make("phasor")))(jnp.asarray(audio))
    assert np.all(np.isfinite(np.asarray(gf)))
    rel = float(jnp.abs(gf - gp).max() / jnp.abs(gp).max())
    assert rel < 1e-4


def test_rotation_cumprod_matches_associative_scan():
    """The backward's P-reconstruction kernel (pallas_kernels.
    rotation_cumprod) against the jnp associative rotation scan."""
    from audiotools_tpu.ops import pallas_kernels as pk

    rng = np.random.RandomState(7)
    theta = rng.uniform(-np.pi, np.pi, (3, 5, 33)).astype(np.float32)
    ur, ui = np.cos(theta), np.sin(theta)
    phi = rng.uniform(-np.pi, np.pi, (3, 5)).astype(np.float32)
    cr, ci = np.cos(phi), np.sin(phi)

    pr, pi = pk.rotation_cumprod(
        jnp.asarray(ur), jnp.asarray(ui), jnp.asarray(cr), jnp.asarray(ci),
        interpret=True,
    )

    sr = np.concatenate([cr[..., None], ur[..., :-1]], axis=-1)
    si = np.concatenate([ci[..., None], ui[..., :-1]], axis=-1)
    want = np.cumprod(sr + 1j * si, axis=-1)
    got = np.asarray(pr) + 1j * np.asarray(pi)
    assert np.abs(got - want).max() < 1e-5


@pytest.mark.parametrize("formulation", ["angle", "phasor"])
def test_phase_vocoder_is_differentiable(formulation):
    rng = np.random.RandomState(3)
    re, im = _random_spec(rng, 1, 17, 25)

    def loss(r, i):
        out = S.phase_vocoder(
            jax.lax.complex(r, i), 1.3, 8, 32, formulation=formulation
        )
        return jnp.sum(jnp.abs(out))

    g = jax.grad(loss)(jnp.asarray(re), jnp.asarray(im))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0
