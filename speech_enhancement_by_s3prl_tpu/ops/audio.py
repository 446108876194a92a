"""Waveform-level tensor utilities (native rebuild of the reference's
utils.py masked helpers and dataset.py SNR mixing — all vmap/jit friendly,
mask-based so they work on statically padded batches).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_POSITIONS_LEN = 16000 * 50  # /root/reference/runner.py:32


def length_masks(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len) {0,1} mask
    (/root/reference/runner.py:216-220, but with a static max_len so the
    result shape is compile-time constant)."""
    ascending = jnp.arange(max_len)[None, :]
    return (ascending < lengths[:, None]).astype(jnp.float32)


def masked_mean(batch, masks, keepdims: bool = False, eps: float = 1e-8):
    """Mean over the valid region only (/root/reference/utils.py:26-29)."""
    return (batch * masks).sum(axis=-1, keepdims=keepdims) / (
        masks.sum(axis=-1, keepdims=keepdims) + eps
    )


def masked_normalize_decibel(audio, target, masks, eps: float = 1e-8):
    """Renormalize each utterance's RMS level to a target dB
    (/root/reference/utils.py:31-46).

    ``target`` may be a python scalar (fixed dB, e.g. -25), a (B,) array of
    per-utterance dB levels, or a (B, T) reference waveform whose masked dB
    level is matched (the eval path: /root/reference/runner.py:570).
    """
    target = jnp.asarray(target, dtype=audio.dtype)
    if target.ndim == 0:
        target = jnp.full((audio.shape[0],), target, dtype=audio.dtype)
    elif target.ndim > 1:
        target = 10.0 * jnp.log10(masked_mean(target**2, masks) + eps)
    scalar_square = (10.0 ** (target[:, None] / 10.0)) / (
        masked_mean(audio**2, masks, keepdims=True) + eps
    )
    return audio * jnp.sqrt(scalar_square)


def normalize_wav_decibel(audio, target_level: float, eps: float = 1e-10):
    """Whole-utterance (unmasked) RMS-dB normalization
    (/root/reference/dataset.py:106-111)."""
    rms = jnp.sqrt((audio**2).mean(axis=-1, keepdims=True))
    scalar = (10.0 ** (target_level / 20.0)) / (rms + eps)
    return audio * scalar


def add_noise(speech, noise, snrs, eps: float = 1e-10):
    """SNR-scaled additive mixing (/root/reference/dataset.py:54-74).

    speech, noise: (B, T) with noise already looped/truncated to T.
    snrs: (B,) in dB. Returns (noisy, scaled_noise).
    """
    snr_exp = 10.0 ** (snrs[:, None] / 10.0)
    speech_power = (speech**2).sum(axis=-1, keepdims=True)
    noise_power = (noise**2).sum(axis=-1, keepdims=True)
    scalar = jnp.sqrt(speech_power / (snr_exp * noise_power + eps))
    scaled_noise = scalar * noise
    return speech + scaled_noise, scaled_noise


def repeat_to_length(wav: jnp.ndarray, length: int) -> jnp.ndarray:
    """Loop a 1-D signal until it reaches `length` samples, then truncate
    (noise looping in /root/reference/dataset.py:57-63)."""
    n = wav.shape[-1]
    times = -(-length // n)
    return jnp.tile(wav, times)[..., :length]
