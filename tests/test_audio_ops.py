"""Tests for waveform-level ops: SNR mixing, dB normalization, masks."""
import numpy as np

import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.ops.audio import (
    add_noise,
    length_masks,
    masked_mean,
    masked_normalize_decibel,
    normalize_wav_decibel,
    repeat_to_length,
)
from speech_enhancement_by_s3prl_tpu.data.datasets import add_noise_np


def test_length_masks():
    m = np.asarray(length_masks(jnp.asarray([3, 5]), 6))
    np.testing.assert_array_equal(m, [[1, 1, 1, 0, 0, 0], [1, 1, 1, 1, 1, 0]])


def test_masked_mean_ignores_padding():
    x = jnp.asarray([[1.0, 2.0, 100.0], [4.0, 4.0, 4.0]])
    m = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(masked_mean(x, m)), [1.5, 4.0], atol=1e-5)


def test_add_noise_achieves_requested_snr():
    """Mixing at SNR s must give 10*log10(P_speech / P_scaled_noise) == s
    (/root/reference/dataset.py:54-74 math)."""
    rng = np.random.default_rng(0)
    speech = jnp.asarray(rng.standard_normal((3, 8000)), dtype=jnp.float32)
    noise = jnp.asarray(rng.standard_normal((3, 8000)), dtype=jnp.float32)
    snrs = jnp.asarray([-5.0, 0.0, 7.0])
    noisy, scaled = add_noise(speech, noise, snrs)
    p_s = np.sum(np.asarray(speech) ** 2, axis=-1)
    p_n = np.sum(np.asarray(scaled) ** 2, axis=-1)
    np.testing.assert_allclose(10 * np.log10(p_s / p_n), np.asarray(snrs), atol=1e-3)
    np.testing.assert_allclose(np.asarray(noisy), np.asarray(speech + scaled))


def test_add_noise_np_matches_jax_and_loops_noise():
    rng = np.random.default_rng(1)
    speech = rng.standard_normal(8000).astype(np.float32)
    noise = rng.standard_normal(3000).astype(np.float32)  # shorter: must loop
    noisy, scaled = add_noise_np(speech, noise, 4.0)
    assert noisy.shape == speech.shape
    # looped region: scaled noise repeats with period 3000
    ratio = scaled[:2000] / scaled[3000:5000]
    np.testing.assert_allclose(ratio, 1.0, atol=1e-4)
    # achieved SNR
    np.testing.assert_allclose(
        10 * np.log10((speech**2).sum() / (scaled**2).sum()), 4.0, atol=1e-3
    )

    looped = repeat_to_length(jnp.asarray(noise), 8000)
    j_noisy, j_scaled = add_noise(
        jnp.asarray(speech)[None], looped[None], jnp.asarray([4.0])
    )
    np.testing.assert_allclose(np.asarray(j_noisy)[0], noisy, atol=1e-4)


def test_normalize_wav_decibel_hits_target_level():
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.standard_normal((2, 16000)) * 0.3, dtype=jnp.float32)
    out = np.asarray(normalize_wav_decibel(wav, -25.0))
    rms_db = 20 * np.log10(np.sqrt((out**2).mean(axis=-1)))
    np.testing.assert_allclose(rms_db, -25.0, atol=1e-3)


def test_masked_normalize_decibel_scalar_and_reference_targets():
    rng = np.random.default_rng(3)
    audio = jnp.asarray(rng.standard_normal((2, 1000)), dtype=jnp.float32)
    masks = jnp.asarray(length_masks(jnp.asarray([800, 1000]), 1000))

    out = np.asarray(masked_normalize_decibel(audio, -25, masks))
    masked_power = (out**2 * np.asarray(masks)).sum(axis=-1) / np.asarray(masks).sum(
        axis=-1
    )
    np.testing.assert_allclose(10 * np.log10(masked_power), -25.0, atol=1e-2)

    # reference-waveform target: output matches the reference's masked dB
    # (/root/reference/utils.py:38-41, eval decode path runner.py:570)
    ref = jnp.asarray(rng.standard_normal((2, 1000)) * 0.05, dtype=jnp.float32)
    out2 = np.asarray(masked_normalize_decibel(audio, ref, masks))
    ref_power = (np.asarray(ref) ** 2 * np.asarray(masks)).sum(axis=-1) / np.asarray(
        masks
    ).sum(axis=-1)
    out2_power = (out2**2 * np.asarray(masks)).sum(axis=-1) / np.asarray(masks).sum(
        axis=-1
    )
    np.testing.assert_allclose(out2_power, ref_power, rtol=1e-3)
