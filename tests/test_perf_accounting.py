"""Cross-check the analytic FLOP accounting (ops/perf.py, docs/perf.md)
against XLA's own cost model on a small DAC configuration.

The analytic count covers the conv/matmul core only (the MFU
convention), so XLA's program count — which adds snakes, norms, losses
and elementwise work — must come out >= the analytic core, and within a
small factor of it (the model is conv-dominated)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu.ops import perf

SMALL = dict(
    encoder_dim=16,
    encoder_rates=(2, 4, 8, 8),
    latent_dim=32,
    decoder_dim=128,
    n_codebooks=2,
    codebook_size=64,
    codebook_dim=4,
)
B, T = 1, 4096


@pytest.fixture(scope="module")
def small_dac():
    from audiotools_tpu.models import DAC

    model = DAC(**SMALL)
    audio = jnp.asarray(
        (np.random.RandomState(0).randn(B, 1, T) * 0.1).astype(np.float32)
    )
    params = jax.jit(model.init)(jax.random.PRNGKey(0), audio)
    return model, params, audio


def test_generator_forward_flops_match_xla(small_dac):
    model, params, audio = small_dac
    analytic = 2 * B * sum(perf.dac_generator_macs(T, **SMALL).values())

    cost = perf.xla_cost(lambda p, a: model.apply(p, a)["audio"], params, audio)
    if not cost["flops"]:
        pytest.skip("backend exposes no cost analysis")
    # XLA counts everything the analytic core excludes; the optimized HLO
    # can also fold some ops away, so allow a band rather than equality.
    assert cost["flops"] >= 0.7 * analytic
    assert cost["flops"] <= 3.0 * analytic


def test_train_step_flops_are_three_forwards():
    fwd = 2 * 16 * sum(perf.dac_generator_macs(16896).values())
    assert perf.dac_train_step_flops(16, 16896) == pytest.approx(3 * fwd)


def test_discriminator_macs_match_param_structure():
    """The MPD/MRD analytic counts track the real modules: doubling T
    roughly doubles MACs (fully convolutional), and the per-period /
    per-window decomposition matches the configured ensembles."""
    base = perf.mpd_macs(16896) + perf.mrd_macs(16896)
    double = perf.mpd_macs(2 * 16896) + perf.mrd_macs(2 * 16896)
    assert 1.8 < double / base < 2.2
    # one period / one window contributes its share
    assert perf.mpd_macs(16896, periods=(2,)) < perf.mpd_macs(16896) / 3
    assert perf.mrd_macs(16896, fft_sizes=(512,)) < perf.mrd_macs(16896)


def test_roofline_helpers():
    assert perf.mfu(perf.PEAK_BF16_FLOPS, 1.0) == pytest.approx(1.0)
    assert perf.hbm_roofline_frac(perf.HBM_BYTES_PER_S, 1.0) == pytest.approx(1.0)
    out = perf.summarize(
        "x", 0.5, analytic_flops=perf.PEAK_BF16_FLOPS / 4,
        cost={"flops": perf.PEAK_BF16_FLOPS / 2, "bytes": perf.HBM_BYTES_PER_S},
    )
    assert out["mfu"] == pytest.approx(0.5)
    assert out["mfu_xla"] == pytest.approx(1.0)
    assert out["hbm_frac"] == pytest.approx(2.0)
