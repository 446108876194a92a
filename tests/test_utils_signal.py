"""Tests for the signal toolbox (silence removal, resampler)."""
import numpy as np

import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.utils.signal import Resampler, remove_silence


def test_remove_silence_drops_quiet_region():
    rng = np.random.default_rng(0)
    loud = rng.standard_normal(8000).astype(np.float32)
    quiet = np.zeros(8000, np.float32)
    x = np.concatenate([loud, quiet, loud])
    y = x * 0.5
    x_out, y_out, n_valid = remove_silence(jnp.asarray(x), jnp.asarray(y))
    n_valid = int(n_valid)
    # roughly the silent third is gone
    assert n_valid < len(x) * 0.75
    assert n_valid > len(x) * 0.5
    # y processed with the same frame selection
    assert np.abs(np.asarray(y_out)[:n_valid]).mean() > 0


def test_resampler_tone_preservation():
    r = Resampler()
    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    out = np.asarray(r(jnp.asarray(tone)[None], 16000, 8000))[0]
    assert abs(out.shape[-1] - 8000) <= 1
    t8 = np.arange(len(out)) / 8000.0
    expect = np.sin(2 * np.pi * 440 * t8)
    np.testing.assert_allclose(out[400:-400], expect[400:-400], atol=2e-2)


def test_resampler_upsample():
    r = Resampler()
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 4000)).astype(np.float32)
    out = np.asarray(r(jnp.asarray(x), 8000, 16000))
    assert out.shape == (2, 8000)
    # energy approximately preserved (bandlimited content)
    ratio = (out**2).mean() / (x**2).mean()
    assert 0.7 < ratio < 1.3
