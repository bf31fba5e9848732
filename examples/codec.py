"""Compress / decompress audio files with a (trained) DAC codec.

The serving-side counterpart of examples/train_dac.py: load a model
folder saved by BaseModel.save_to_folder (or use random weights with
--toy for a plumbing check), then

    python examples/codec.py compress  in.wav  clip.dacz.npz --toy
    python examples/codec.py decompress clip.dacz.npz out.wav --toy

Artifacts are compact uint16 code arrays + metadata
(audiotools_tpu.models.artifacts); pass --n-quantizers to truncate the
codebook cascade for a lower bitrate.
"""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def load_model(args):
    import jax
    import jax.numpy as jnp

    from audiotools_tpu.models import DAC

    if args.model:
        model, params = DAC.load_from_folder(args.model)
        return model, params
    if not args.toy:
        raise SystemExit("pass --model <folder> or --toy")
    model = DAC(
        encoder_dim=16,
        encoder_rates=(2, 4, 4, 4),
        latent_dim=32,
        decoder_dim=128,
        n_codebooks=4,
        codebook_size=64,
        codebook_dim=4,
        sample_rate=44100,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1, model.hop_length * 4))
    )
    return model, params


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("mode", choices=["compress", "decompress"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--model", default=None, help="BaseModel.save_to_folder dir")
    ap.add_argument("--toy", action="store_true", help="random tiny model")
    ap.add_argument("--n-quantizers", type=int, default=None)
    ap.add_argument(
        "--streaming", action="store_true",
        help="encode/decode through fixed-shape overlap-save windows "
        "(identical output, bounded memory; for very long inputs)",
    )
    args = ap.parse_args()

    from audiotools_tpu import AudioSignal
    from audiotools_tpu.models import (
        compress,
        decompress,
        load_artifact,
        save_artifact,
    )

    model, params = load_model(args)

    if args.mode == "compress":
        signal = AudioSignal(args.src)
        art = compress(
            model, params, signal,
            n_quantizers=args.n_quantizers, streaming=args.streaming,
        )
        save_artifact(args.dst, art)
        raw = signal.signal_length * signal.num_channels * 2  # 16-bit PCM
        packed = art["codes"].size * 2
        print(
            f"{args.src} -> {args.dst}: {art['codes'].shape} codes, "
            f"~{raw / packed:.1f}x smaller than 16-bit PCM"
        )
    else:
        art = load_artifact(args.src)
        recon = decompress(model, params, art, streaming=args.streaming)
        recon.write(args.dst)
        print(
            f"{args.src} -> {args.dst}: {recon.signal_duration:.2f} s @ "
            f"{recon.sample_rate} Hz"
        )


if __name__ == "__main__":
    main()
