"""Adversarial codec training: GAN losses + the two-optimizer SPMD step.

Completes the DAC training recipe around
:func:`~audiotools_tpu.models.train.codec_loss`: least-squares GAN
objectives over the :class:`~audiotools_tpu.models.discriminators.
Discriminator` ensemble, deep feature matching, and a single jitted
``(gen, disc)`` update that shards over a ``jax.sharding.Mesh`` exactly
like the reconstruction-only step (batch on the data axis — GSPMD
inserts the gradient psums).

The generator forward runs ONCE per step: its reconstruction is returned
from the generator's grad closure as an aux value, which makes it a
constant (already "detached") for the discriminator update.

Update-order note: the published DAC loop updates the discriminator
*first* on the detached reconstruction and then trains the generator
against the updated discriminator. Torch can do that with one generator
forward because autograd retains the graph across the two optimizer
steps; under ``jax.value_and_grad`` a discriminator-first order would
force a second generator forward (~+30% step time). This step therefore
updates the generator first against the *current* discriminator — a
standard simultaneous-style LSGAN variant, equivalent in the
small-step-size limit — and reuses its reconstruction for the
discriminator update.
"""
import jax
import jax.numpy as jnp
import optax

from .train import codec_loss


def _apply_paired(disc, d_params, real, fake):
    """Run the ensemble once on ``concat([real, fake])`` and split the
    feature maps back into (real_outs, fake_outs).

    Per-item numerics are identical to two separate calls (no op crosses
    the batch dim; the discriminators are weight-normalized convs, not
    batch-normed). MEASURED NEGATIVE for the training step on v5e
    (tests/hw/hw_adv_profile.py RESULT: 174.8 ms paired vs 148.5
    separate — the concat doubles peak activation memory through the
    backward), so the train step uses separate calls; kept for inference
    -style ensemble scoring where no backward runs."""
    batch = real.shape[0]
    outs = disc.apply(d_params, jnp.concatenate([real, fake], axis=0))
    real_outs, fake_outs = [], []
    for feats in outs:
        real_outs.append([f[:batch] for f in feats])
        fake_outs.append([f[batch:] for f in feats])
    return real_outs, fake_outs

ADV_LOSS_WEIGHTS = {
    # published DAC weighting: mel 15 / adv 1 / feature-matching 2
    "adv/gen": 1.0,
    "adv/feature": 2.0,
}


def discriminator_loss(real_outs, fake_outs):
    """Least-squares discriminator objective summed over the ensemble:
    real logits pulled to 1, fake logits to 0."""
    loss = 0.0
    for real, fake in zip(real_outs, fake_outs):
        loss = loss + jnp.mean((1.0 - real[-1]) ** 2) + jnp.mean(fake[-1] ** 2)
    return loss


def generator_adversarial_loss(fake_outs):
    """Least-squares generator objective: fake logits pulled to 1."""
    loss = 0.0
    for fake in fake_outs:
        loss = loss + jnp.mean((1.0 - fake[-1]) ** 2)
    return loss


def feature_matching_loss(real_outs, fake_outs):
    """L1 between real/fake intermediate feature maps (final logit map
    excluded), averaged per layer and summed over the ensemble."""
    loss = 0.0
    for real, fake in zip(real_outs, fake_outs):
        for r, f in zip(real[:-1], fake[:-1]):
            loss = loss + jnp.mean(
                jnp.abs(r.astype(jnp.float32) - f.astype(jnp.float32))
            )
    return loss


def make_adversarial_train_step(
    gen, disc, g_optimizer, d_optimizer, sample_rate: int
):
    """Build the jittable adversarial step::

        (g_params, d_params, g_opt_state, d_opt_state, audio)
            -> (g_params, d_params, g_opt_state, d_opt_state, metrics)

    Generator update: reconstruction/VQ losses (``codec_loss``) plus the
    LSGAN and feature-matching terms against the *current* discriminator.
    Discriminator update: LSGAN real-vs-fake on the step's reconstruction
    (an aux value, so no second generator pass and no gradient leak).
    """

    def train_step(g_params, d_params, g_opt_state, d_opt_state, audio):
        def g_loss_fn(gp):
            recon_loss, metrics, recon = codec_loss(
                gen, gp, audio, sample_rate, return_recon=True
            )
            fake_outs = disc.apply(d_params, recon)
            real_outs = disc.apply(d_params, audio)
            adv = generator_adversarial_loss(fake_outs)
            fm = feature_matching_loss(real_outs, fake_outs)
            loss = (
                recon_loss
                + ADV_LOSS_WEIGHTS["adv/gen"] * adv
                + ADV_LOSS_WEIGHTS["adv/feature"] * fm
            )
            metrics = dict(
                metrics, **{"loss": loss, "loss/adv": adv, "loss/feature": fm}
            )
            return loss, (metrics, recon)

        (_, (metrics, recon)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_params)
        g_updates, g_opt_state = g_optimizer.update(
            g_grads, g_opt_state, g_params
        )
        g_params = optax.apply_updates(g_params, g_updates)

        def d_loss_fn(dp):
            real_outs = disc.apply(dp, audio)
            fake_outs = disc.apply(dp, recon)
            return discriminator_loss(real_outs, fake_outs)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(d_params)
        d_updates, d_opt_state = d_optimizer.update(
            d_grads, d_opt_state, d_params
        )
        d_params = optax.apply_updates(d_params, d_updates)
        metrics["loss/discriminator"] = d_loss

        return g_params, d_params, g_opt_state, d_opt_state, metrics

    return train_step
