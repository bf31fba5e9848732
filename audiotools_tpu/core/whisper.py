"""Whisper mixin: features / transcripts / embeddings via HF transformers
(reference `/root/reference/audiotools/core/whisper.py`). The HF Whisper
model runs under torch on host; our signal provides numpy audio to it.

.. warning:: **Experimental.** The build environment has no network
   access, so this mixin has never executed against *pretrained* Whisper
   weights. Its full code path (``from_pretrained`` → resample →
   feature extraction → ``generate`` → decode → encoder embeddings) IS
   executed end-to-end in CI against a tiny random-weight checkpoint
   synthesized offline (tests/core/test_whisper_real.py); only the
   linguistic quality of transcripts — a property of the weights, not
   this code — remains unvalidated. Verify once on a networked host
   before relying on transcript/embedding *content*.
"""
import warnings


class WhisperMixin:
    is_initialized = False

    def setup_whisper(
        self,
        pretrained_model_name_or_path: str = "openai/whisper-base.en",
        device: str = None,
    ):
        import torch
        from transformers import WhisperForConditionalGeneration, WhisperProcessor

        warnings.warn(
            "WhisperMixin is experimental: its plumbing is CI-validated "
            "against a random-weight checkpoint, but it has never run "
            "pretrained Whisper weights in this build environment "
            "(offline). Verify transcript content on a networked host.",
            stacklevel=2,
        )
        if device is None:
            device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
        self.whisper_device = device
        name = pretrained_model_name_or_path
        self.whisper_processor = WhisperProcessor.from_pretrained(name)
        model = WhisperForConditionalGeneration.from_pretrained(name)
        self.whisper_model = model.to(self.whisper_device)
        self.is_initialized = True

    def get_whisper_features(self):
        """Whisper input features of the audio signal
        (reference whisper.py:24-52)."""
        import torch

        if not self.is_initialized:
            self.setup_whisper()

        import numpy as np

        target_sr = self.whisper_processor.feature_extractor.sampling_rate
        resampled = self.clone().resample(target_sr)
        raw_speech = list(np.asarray(resampled.audio_data[:, 0, :]))

        with torch.inference_mode():
            input_features = self.whisper_processor(
                raw_speech,
                sampling_rate=target_sr,
                return_tensors="pt",
            ).input_features

        return input_features

    def get_whisper_transcript(self) -> str:
        """Transcript of the audio signal (reference whisper.py:54-72)."""
        import torch

        if not self.is_initialized:
            self.setup_whisper()

        input_features = self.get_whisper_features()

        with torch.inference_mode():
            input_features = input_features.to(self.whisper_device)
            generated_ids = self.whisper_model.generate(
                input_features=input_features
            )

        transcription = self.whisper_processor.batch_decode(generated_ids)
        return transcription[0]

    def get_whisper_embeddings(self):
        """Last-hidden-state embeddings (reference whisper.py:74-97)."""
        import torch

        if not self.is_initialized:
            self.setup_whisper()

        features = self.get_whisper_features().to(self.whisper_device)
        with torch.inference_mode():
            encoded = self.whisper_model.get_encoder()(features)
        return encoded.last_hidden_state
