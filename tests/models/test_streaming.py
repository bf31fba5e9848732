"""Streaming codec inference: chunked == full-signal, bounded memory.

The reference toolkit has no serving/streaming story (it ships no model
code at all); these tests pin the overlap-save streaming wrapper's
central claim — codes and waveforms from fixed-shape windows are
identical to the full-signal model — across chunk sizes, stream lengths
(shorter than one window, non-multiples of chunk/hop), and irregular
push block sizes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiotools_tpu.models import DAC
from audiotools_tpu.models.streaming import (
    StreamingDecoder,
    StreamingEncoder,
    decoder_halo_frames,
    encoder_halo_frames,
    stream_decode,
    stream_encode,
)


def _tiny():
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
def model():
    return _tiny()


@pytest.fixture(scope="module")
def params(model):
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1, 1024)))


@pytest.fixture(scope="module")
def audio():
    rng = np.random.RandomState(7)
    return (rng.randn(2, 1, 3000) * 0.3).astype(np.float32)


@pytest.fixture(scope="module")
def full_codes(model, params, audio):
    _, codes = model.apply(params, jnp.asarray(audio), method=DAC.encode)
    return np.asarray(codes)


def test_halo_frames_are_sane(model):
    eh = encoder_halo_frames(model)
    dh = decoder_halo_frames(model)
    assert 1 <= eh <= 64 and 1 <= dh <= 64
    # halos scale with the architecture, not the signal
    big = DAC(encoder_rates=(2, 4, 8, 8))
    assert encoder_halo_frames(big) >= 1


@pytest.mark.parametrize("chunk", [4, 16])
def test_stream_encode_matches_full(model, params, audio, full_codes, chunk):
    codes = stream_encode(model, params, audio, chunk_frames=chunk)
    assert codes.shape == full_codes.shape
    assert (codes == full_codes).all()


def test_stream_encode_short_stream(model, params):
    """Stream shorter than one window falls back to a single full call."""
    rng = np.random.RandomState(8)
    x = (rng.randn(1, 1, 200) * 0.3).astype(np.float32)
    _, ref = model.apply(params, jnp.asarray(x), method=DAC.encode)
    got = stream_encode(model, params, x, chunk_frames=16)
    assert (got == np.asarray(ref)).all()


def test_stream_decode_matches_full(model, params, full_codes):
    ref = np.asarray(
        model.apply(
            params, jnp.asarray(full_codes), method=DAC.decode_from_codes
        )
    )
    for chunk in (4, 16):
        got = stream_decode(model, params, full_codes, chunk_frames=chunk)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-6)


def test_irregular_push_blocks(model, params, audio, full_codes):
    """Arbitrary push() block sizes emit the same code stream."""
    enc = StreamingEncoder(model, params, batch_size=2, chunk_frames=8)
    out = []
    cuts = [0, 37, 38, 501, 502, 1700, 2999, 3000]
    for a, b in zip(cuts[:-1], cuts[1:]):
        out += list(enc.push(audio[:, :, a:b]))
    out += list(enc.flush())
    codes = np.concatenate(out, axis=-1)
    assert (codes == full_codes).all()


def test_streaming_decoder_push_blocks(model, params, full_codes):
    ref = np.asarray(
        model.apply(
            params, jnp.asarray(full_codes), method=DAC.decode_from_codes
        )
    )
    dec = StreamingDecoder(model, params, batch_size=2, chunk_frames=8)
    out = []
    F = full_codes.shape[-1]
    cuts = [0, 3, 30, 31, 60, F]
    for a, b in zip(cuts[:-1], cuts[1:]):
        out += list(dec.push(full_codes[:, :, a:b]))
    out += list(dec.flush())
    audio = np.concatenate(out, axis=-1)
    np.testing.assert_allclose(audio, ref, atol=2e-6)


def test_bounded_buffer(model, params):
    """Host memory stays O(window) no matter how long the stream."""
    enc = StreamingEncoder(model, params, batch_size=1, chunk_frames=8)
    rng = np.random.RandomState(9)
    # retained history is one window back from `next`; unemitted samples
    # can reach (next - halo) + W before the next drain -> the bound is
    # W + (chunk + halo) * hop, independent of stream length
    cap = enc.W + (enc.chunk + enc.halo) * enc.hop
    for _ in range(12):
        for _ in enc.push((rng.randn(1, 1, 600) * 0.1).astype(np.float32)):
            pass
        assert enc._buf.shape[-1] <= cap


def test_push_after_flush_raises(model, params):
    enc = StreamingEncoder(model, params, batch_size=1, chunk_frames=8)
    list(enc.flush())
    with pytest.raises(RuntimeError):
        list(enc.push(np.zeros((1, 1, 10), np.float32)))


def test_roundtrip_streaming(model, params, audio):
    """Encode-stream -> decode-stream == full model roundtrip."""
    codes = stream_encode(model, params, audio, chunk_frames=16)
    wav_s = stream_decode(model, params, codes, chunk_frames=16)
    _, ref_codes = model.apply(params, jnp.asarray(audio), method=DAC.encode)
    ref = np.asarray(
        model.apply(params, ref_codes, method=DAC.decode_from_codes)
    )
    np.testing.assert_allclose(wav_s, ref, atol=2e-6)


def test_n_quantizers_truncation(model, params, audio):
    codes = stream_encode(
        model, params, audio, chunk_frames=16, n_quantizers=1
    )
    _, ref = model.apply(
        params, jnp.asarray(audio), method=DAC.encode, n_quantizers=1
    )
    assert codes.shape[1] == 1
    assert (codes == np.asarray(ref)).all()


def test_artifact_streaming_parity(model, params, audio):
    """compress/decompress(streaming=True) == the one-shot artifact path
    (the serving integration in models/artifacts.py)."""
    from audiotools_tpu.models import compress, decompress

    art = compress(model, params, audio)
    art_s = compress(model, params, audio, streaming=True, chunk_frames=16)
    assert (art["codes"] == art_s["codes"]).all()
    assert art["n_samples"] == art_s["n_samples"]

    rec = decompress(model, params, art)
    rec_s = decompress(model, params, art, streaming=True, chunk_frames=16)
    np.testing.assert_allclose(
        np.asarray(rec_s.audio_data), np.asarray(rec.audio_data), atol=2e-6
    )


def test_stream_decode_short_stream(model, params, full_codes):
    """Code stream shorter than one window decodes via the single full
    call (the degenerate fixed-shape case)."""
    short = full_codes[:, :, :10]
    ref = np.asarray(
        model.apply(params, jnp.asarray(short), method=DAC.decode_from_codes)
    )
    got = stream_decode(model, params, short, chunk_frames=16)
    np.testing.assert_allclose(got, ref, atol=2e-6)


def test_stream_bad_shapes_raise(model, params):
    with pytest.raises(ValueError):
        stream_encode(model, params, np.zeros((1, 100), np.float32))
    with pytest.raises(ValueError):
        stream_decode(model, params, np.zeros((4, 10), np.int32))
    enc = StreamingEncoder(model, params, batch_size=1, chunk_frames=8)
    with pytest.raises(ValueError):
        list(enc.push(np.zeros((2, 1, 10), np.float32)))


@pytest.mark.parametrize(
    "rates", [(2, 2), (8, 2), (4, 4, 2)], ids=lambda r: "x".join(map(str, r))
)
def test_halo_covers_arbitrary_architectures(rates):
    """The analytic halo formulas must cover the receptive field for any
    encoder_rates configuration — bit-parity is the proof."""
    m = DAC(
        encoder_dim=8, encoder_rates=rates, latent_dim=8, decoder_dim=32,
        n_codebooks=1, codebook_size=16, codebook_dim=4, sample_rate=16000,
    )
    p = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 1, 16 * m.hop_length)))
    rng = np.random.RandomState(11)
    x = (rng.randn(1, 1, 61 * m.hop_length + 7) * 0.3).astype(np.float32)
    _, ref = m.apply(p, jnp.asarray(x), method=DAC.encode)
    ref = np.asarray(ref)
    got = stream_encode(m, p, x, chunk_frames=8)
    assert (got == ref).all()
    dec_ref = np.asarray(
        m.apply(p, jnp.asarray(ref), method=DAC.decode_from_codes)
    )
    dec_got = stream_decode(m, p, ref, chunk_frames=8)
    np.testing.assert_allclose(dec_got, dec_ref, atol=2e-6)
