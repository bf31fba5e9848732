"""End-to-end DAC codec training: the canonical usage of the whole stack.

CSV dataset -> host AudioLoader workers -> on-device augmentation ->
sharded DAC training step (SPMD over the device mesh) -> Tracker metrics
-> orbax checkpoints with mid-epoch resume. This is the reference's
canonical training loop (SURVEY.md §3.5) assembled from this framework's
pieces, plus the DAC-style codec workload (BASELINE config 5).

Run a smoke pass on CPU (synthesizes its own fixtures):

    python examples/train_dac.py --steps 4 --batch-size 4 --toy

or point it at real data:

    PATH_TO_DATA=/data python examples/train_dac.py \
        --sources train.csv --steps 10000 --batch-size 16
"""
import argparse
import tempfile
from pathlib import Path


def make_dataset(args):
    from audiotools_tpu.data import transforms as tfm
    from audiotools_tpu.data.datasets import AudioDataset, AudioLoader

    sources = args.sources
    if not sources:
        # self-contained smoke fixtures
        import sys

        sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))
        from fixtures import build_fixture_tree

        root = Path(tempfile.mkdtemp())
        build_fixture_tree(root)
        sources = [str(root / "spk.csv")]

    transform = tfm.Compose(
        tfm.VolumeNorm(("uniform", -20, -14)),
        tfm.LowPass(prob=0.3),
        tfm.ClippingDistortion(prob=0.1),
        name="augment",
    )
    return AudioDataset(
        AudioLoader(sources=sources),
        sample_rate=args.sample_rate,
        n_examples=args.steps * args.batch_size,
        duration=args.duration,
        transform=transform,
    )


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from audiotools_tpu import ml
    from audiotools_tpu.data.loader import DataLoader
    from audiotools_tpu.ml.checkpoint import Checkpointer
    from audiotools_tpu.ml.decorators import Tracker, timer
    from audiotools_tpu.models import DAC, Discriminator
    from audiotools_tpu.models.adversarial import make_adversarial_train_step
    from audiotools_tpu.models.train import make_train_step

    accel = ml.Accelerator(amp=args.amp)
    tracker = Tracker(rank=accel.local_rank)

    if args.toy:
        model = DAC(
            encoder_dim=16, encoder_rates=(2, 4, 4, 4), latent_dim=32,
            decoder_dim=128, n_codebooks=4, codebook_size=64, codebook_dim=4,
            sample_rate=args.sample_rate,
            dtype=jnp.bfloat16 if args.amp else None,
        )
    else:
        model = DAC(
            sample_rate=args.sample_rate,
            dtype=jnp.bfloat16 if args.amp else None,
            # narrow stages as shifted matmuls: ~3% faster train step on
            # v5e (tests/hw/hw_resunit_step.py); checkpoints interchange
            # with the default conv formulation
            formulation="hybrid",
        )

    dataset = make_dataset(args)
    ckpt = Checkpointer(args.ckpt_dir, max_to_keep=3)

    # length must be a multiple of the model hop for static shapes
    T = int(args.duration * args.sample_rate)
    T = (T // model.hop_length) * model.hop_length

    example = jnp.zeros((1, 1, T), jnp.float32)
    g_params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), example)
    g_params = accel.prepare_model(g_params)
    opt = optax.adamw(args.lr)

    if args.adversarial:
        # the full DAC recipe: LSGAN + feature matching against the
        # MPD + multi-band spectrogram discriminator ensemble
        disc = Discriminator(
            periods=(2, 3, 5) if args.toy else (2, 3, 5, 7, 11),
            fft_sizes=(512, 256) if args.toy else (2048, 1024, 512),
            mpd_channels=(8, 16) if args.toy else (32, 128, 512, 1024),
            mrd_channels=8 if args.toy else 32,
            dtype=jnp.bfloat16 if args.amp else None,
        )
        d_raw = jax.jit(disc.init)(jax.random.PRNGKey(args.seed + 1), example)
        d_raw = accel.prepare_model(d_raw)
        d_opt = optax.adamw(args.lr)
        # one params/opt_state pytree for the checkpointer: both nets
        # resume together from the same step
        params = {"g": g_params, "d": d_raw}
        opt_state = jax.device_put(
            {"g": opt.init(g_params), "d": d_opt.init(d_raw)},
            accel.replicated,
        )
        adv_step = jax.jit(
            make_adversarial_train_step(
                model, disc, opt, d_opt, args.sample_rate
            ),
            donate_argnums=(0, 1, 2, 3),
        )

        def step_fn(p, s, audio):
            g, d, gs, ds, metrics = adv_step(
                p["g"], p["d"], s["g"], s["d"], audio
            )
            return {"g": g, "d": d}, {"g": gs, "d": ds}, metrics

    else:
        params = g_params
        opt_state = jax.device_put(opt.init(params), accel.replicated)
        # donate params/opt_state buffers: they are replaced every step
        step_fn = jax.jit(
            make_train_step(model, opt, args.sample_rate), donate_argnums=(0, 1)
        )

    # mid-epoch resume: restore params/opt/tracker and skip seen indices
    start_idx = 0
    if ckpt.latest_step() is not None:
        state, meta = ckpt.restore(template={"params": params, "opt_state": opt_state})
        params, opt_state = state["params"], state["opt_state"]
        if meta.get("tracker"):
            tracker.load_state_dict(meta["tracker"])
        start_idx = meta.get("data_idx") or 0
        tracker.print(f"resumed from step {tracker.step} (data idx {start_idx})")

    from audiotools_tpu.data.datasets import ResumableSequentialSampler

    dl = DataLoader(
        dataset, batch_size=args.batch_size, num_workers=args.num_workers,
        sampler=ResumableSequentialSampler(dataset, start_idx=start_idx),
    )

    @tracker.log("train", "value")
    @tracker.track("train", args.steps, completed=tracker.step)
    @timer()
    def train_step(batch):
        nonlocal params, opt_state
        sig = dataset.transform(batch["signal"], **batch["transform_args"])
        audio = sig.audio_data[..., :T]
        audio = accel.prepare_batch(audio)
        params, opt_state, metrics = step_fn(params, opt_state, audio)
        return metrics

    with tracker.live:
        for batch in dl:
            if tracker.step >= args.steps:
                break
            tracker.step += 1
            train_step(batch)
            if tracker.step % args.ckpt_every == 0:
                # orbax saves of sharded arrays are collective: every
                # process must enter. data_idx counts GLOBAL samples seen
                # (tracker.step survives resume; a local loop counter
                # would roll the resume point backwards).
                ckpt.save(
                    tracker.step, params, opt_state, tracker=tracker,
                    data_idx=tracker.step * args.batch_size,
                )
        tracker.done("train", f"finished at step {tracker.step}")

    ckpt.save(
        tracker.step, params, opt_state, tracker=tracker,
        data_idx=tracker.step * args.batch_size,
    )
    return tracker


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sources", nargs="*", default=None, help="CSV manifests")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--duration", type=float, default=0.38)
    p.add_argument("--sample-rate", type=int, default=44100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--amp", action="store_true", help="bfloat16 compute")
    p.add_argument(
        "--adversarial", action="store_true",
        help="train against the MPD+MRD discriminator ensemble "
        "(LSGAN + feature matching, the published DAC recipe)",
    )
    p.add_argument("--toy", action="store_true", help="tiny model for smoke runs")
    p.add_argument("--num-workers", type=int, default=0)
    p.add_argument("--ckpt-every", type=int, default=50)
    p.add_argument("--ckpt-dir", default="runs/dac_ckpt")
    main(p.parse_args())
