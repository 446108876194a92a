"""Chunked long-form enhancement: identity enhancer must reconstruct the
input exactly (crossfade weights sum to one)."""
import numpy as np

from speech_enhancement_by_s3prl_tpu.ops.streaming import enhance_streaming


def test_identity_round_trip():
    rng = np.random.default_rng(0)
    for n in [4000, 16000, 16000 * 7 + 123, 16000 * 25]:
        wav = rng.standard_normal(n).astype(np.float32)
        out = enhance_streaming(lambda w: w, wav, 16000, window_sec=1.0,
                                overlap_sec=0.25)
        np.testing.assert_allclose(out, wav, atol=1e-5)


def test_chunks_are_fixed_size():
    sizes = []

    def probe(w):
        sizes.append(len(w))
        return w

    wav = np.zeros(16000 * 5, np.float32)
    enhance_streaming(probe, wav, 16000, window_sec=2.0, overlap_sec=0.5)
    assert set(sizes) == {32000}  # every call same static shape
