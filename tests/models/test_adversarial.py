"""Adversarial DAC training stack: discriminator ensemble shapes, GAN
loss semantics, the two-optimizer step, and sharded-vs-replicated parity.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiotools_tpu.models import DAC, Discriminator
from audiotools_tpu.models.adversarial import (
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
    make_adversarial_train_step,
)


def _tiny_disc():
    return Discriminator(
        periods=(2, 3),
        fft_sizes=(256, 128),
        mpd_channels=(4, 8),
        mrd_channels=4,
    )


def _tiny_gen():
    return DAC(
        encoder_dim=8,
        encoder_rates=(2, 4, 4),
        latent_dim=16,
        decoder_dim=64,
        n_codebooks=2,
        codebook_size=32,
        codebook_dim=4,
        sample_rate=16000,
    )


@pytest.fixture(scope="module")
def disc_and_params():
    disc = _tiny_disc()
    audio = jnp.zeros((1, 1, 2048))
    # jit the init: eager per-op dispatch on this 1-core box costs ~45 s
    params = jax.jit(disc.init)(jax.random.PRNGKey(1), audio)
    return disc, params


@pytest.fixture(scope="module")
def disc_apply(disc_and_params):
    """Module-shared jitted discriminator forward (one compile)."""
    disc, _ = disc_and_params
    return jax.jit(disc.apply)


def test_discriminator_shapes(disc_and_params, disc_apply):
    disc, d_params = disc_and_params
    audio = jnp.asarray(
        (np.random.RandomState(0).randn(2, 1, 2048) * 0.1).astype(np.float32)
    )
    outs = disc_apply(d_params, audio)
    # one feature list per sub-discriminator: 2 periods + 2 resolutions
    assert len(outs) == 4
    for feats in outs:
        assert len(feats) >= 2
        # final entry is the logit map: one channel, f32, finite
        logits = feats[-1]
        assert logits.shape[0] == 2 and logits.shape[-1] == 1
        assert logits.dtype == jnp.float32
        assert np.isfinite(np.asarray(logits)).all()
    # (B, T) input is accepted too and gives identical logits
    outs2 = disc_apply(d_params, audio[:, 0, :])
    np.testing.assert_allclose(
        np.asarray(outs[0][-1]), np.asarray(outs2[0][-1])
    )


def test_gan_loss_semantics(disc_and_params, disc_apply):
    """Perfect discriminator outputs give zero losses; feature matching
    is exactly zero on identical inputs and positive otherwise."""
    disc, d_params = disc_and_params
    rng = np.random.RandomState(1)
    a = jnp.asarray((rng.randn(1, 1, 2048) * 0.1).astype(np.float32))
    b = jnp.asarray((rng.randn(1, 1, 2048) * 0.1).astype(np.float32))
    outs_a = disc_apply(d_params, a)
    outs_b = disc_apply(d_params, b)

    ones = [[jnp.ones_like(f) for f in feats] for feats in outs_a]
    zeros = [[jnp.zeros_like(f) for f in feats] for feats in outs_a]
    assert float(discriminator_loss(ones, zeros)) == 0.0
    assert float(generator_adversarial_loss(ones)) == 0.0
    assert float(generator_adversarial_loss(zeros)) == pytest.approx(
        len(outs_a)
    )

    assert float(feature_matching_loss(outs_a, outs_a)) == 0.0
    assert float(feature_matching_loss(outs_a, outs_b)) > 0.0


def test_adversarial_step_updates_both_nets(disc_and_params):
    """One jitted adversarial step: both nets move and metrics are
    finite. The dp-mesh parity leg lives in the slow-marked test below
    (one full GSPMD recompile, ~2-3 min on this 1-core box) and is also
    exercised by the driver's dryrun_multichip every round."""
    gen = _tiny_gen()
    disc, d_params = disc_and_params
    audio = jnp.asarray(
        (np.random.RandomState(2).randn(4, 1, 2048) * 0.1).astype(np.float32)
    )
    g_params = jax.jit(gen.init)(jax.random.PRNGKey(0), audio)
    g_opt = optax.adam(1e-4)
    d_opt = optax.adam(1e-4)
    step = jax.jit(make_adversarial_train_step(gen, disc, g_opt, d_opt, 16000))

    g2, d2, _, _, metrics = step(
        g_params, d_params, g_opt.init(g_params), d_opt.init(d_params), audio
    )
    for key in (
        "loss", "loss/mel", "loss/adv", "loss/feature", "loss/discriminator",
    ):
        assert np.isfinite(float(metrics[key])), key

    def max_delta(old, new):
        return max(
            float(jnp.abs(a - b).max())
            for a, b in zip(jax.tree_util.tree_leaves(old),
                            jax.tree_util.tree_leaves(new))
        )

    # both networks actually moved: the adversarial terms reach the
    # generator and the LSGAN real/fake objective reaches every
    # discriminator column
    assert max_delta(g_params, g2) > 0
    assert max_delta(d_params, d2) > 0
    for old_leaf, new_leaf in zip(
        jax.tree_util.tree_leaves(d_params), jax.tree_util.tree_leaves(d2)
    ):
        assert float(jnp.abs(old_leaf - new_leaf).max()) > 0

@pytest.mark.slow
def test_adversarial_step_shards_match_replicated(disc_and_params):
    """The SAME adversarial step function under a dp mesh reproduces the
    replicated metrics (GSPMD inserts the gradient psums). Slow-marked:
    the sharded compile is a full second GSPMD compile of the
    two-optimizer program; the driver's dryrun_multichip also runs this
    path every round."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    gen = _tiny_gen()
    disc, d_params = disc_and_params
    audio = jnp.asarray(
        (np.random.RandomState(2).randn(4, 1, 2048) * 0.1).astype(np.float32)
    )
    g_params = jax.jit(gen.init)(jax.random.PRNGKey(0), audio)
    g_opt = optax.adam(1e-4)
    d_opt = optax.adam(1e-4)
    step = jax.jit(make_adversarial_train_step(gen, disc, g_opt, d_opt, 16000))
    _, _, _, _, metrics = step(
        g_params, d_params, g_opt.init(g_params), d_opt.init(d_params), audio
    )

    mesh = Mesh(np.array(jax.devices()[:4]), ("dp",))
    audio_s = jax.device_put(audio, NamedSharding(mesh, P("dp", None, None)))
    rep = NamedSharding(mesh, P())
    g_s = jax.device_put(g_params, rep)
    d_s = jax.device_put(d_params, rep)
    with mesh:
        _, _, _, _, m1 = step(
            g_s, d_s, g_opt.init(g_s), d_opt.init(d_s), audio_s
        )
    for key in ("loss", "loss/adv", "loss/discriminator"):
        assert abs(float(metrics[key]) - float(m1[key])) < 1e-2, key


def test_discriminator_learns_real_vs_fake(disc_and_params):
    """A few LSGAN steps on fixed real/fake batches must reduce the
    discriminator loss — the ensemble is trainable end-to-end."""
    disc, d_params = disc_and_params
    t = np.arange(2048) / 16000.0
    real = jnp.asarray(
        (0.4 * np.sin(2 * np.pi * 220 * t))[None, None, :].astype(np.float32)
    )
    fake = jnp.asarray(
        (np.random.RandomState(3).randn(1, 1, 2048) * 0.2).astype(np.float32)
    )
    opt = optax.adam(2e-4)

    @jax.jit
    def d_step(dp, opt_state):
        def loss_fn(p):
            return discriminator_loss(
                disc.apply(p, real), disc.apply(p, fake)
            )

        loss, grads = jax.value_and_grad(loss_fn)(dp)
        updates, opt_state = opt.update(grads, opt_state, dp)
        return optax.apply_updates(dp, updates), opt_state, loss

    dp, opt_state = d_params, opt.init(d_params)
    first = None
    for _ in range(25):
        dp, opt_state, loss = d_step(dp, opt_state)
        if first is None:
            first = float(loss)
    assert float(loss) < first
