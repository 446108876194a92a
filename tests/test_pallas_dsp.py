"""Parity tests for the fused Pallas DSP kernels (interpret mode on CPU).

ops/pallas/stft_kernel.py and ops/pallas/decode_kernel.py replace the
XLA STFT / iSTFT+OLA paths on TPU (docs/PERF.md round-3 DSP section).
Both run their matmuls bf16 x bf16 -> f32 — the same effective precision
as the XLA paths' default-precision conv/einsum — so parity tolerances
are bf16-scale, not f32-scale.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_by_s3prl_tpu.ops.pallas.decode_kernel import (
    decode_ola_pallas,
)
from speech_enhancement_by_s3prl_tpu.ops.pallas.stft_kernel import stft_pallas
from speech_enhancement_by_s3prl_tpu.ops.stft import (
    StftParams,
    _ola_envelope,
    istft,
    stft,
)

SP = StftParams()
F = SP.n_freq


def _decode_via_kernel(pred, uph, n_frames):
    raw = decode_ola_pallas(
        pred, uph, SP.n_fft, SP.win_length, SP.hop_length, interpret=True
    )
    start = SP.n_fft // 2
    length = (n_frames - 1) * SP.hop_length
    wav = raw[:, start : start + length]
    env = _ola_envelope(SP.n_fft, SP.win_length, SP.hop_length, n_frames)[
        start : start + length
    ]
    return wav / jnp.where(env > 1e-11, env, 1.0)


@pytest.mark.parametrize("batch,t", [(1, 16000), (3, 12345), (4, 40000)])
def test_decode_kernel_matches_istft(batch, t):
    rng = np.random.default_rng(batch)
    w = jnp.asarray(rng.standard_normal((batch, t)), jnp.float32) * 0.1
    cx = stft(w, SP)
    n_frames = cx.shape[-2]
    pred = jnp.asarray(
        rng.standard_normal((batch, n_frames, F)) ** 2, jnp.float32
    )
    ref = istft(pred, cx, SP)
    out = _decode_via_kernel(pred, cx, n_frames)
    assert out.shape == ref.shape
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3 * max(scale, 1.0)
    )


def test_decode_kernel_zero_bins_convention():
    # |z| = 0 bins keep the arctan2(0, 0) = 0 convention: unit (1, 0)
    n_frames = 31
    pred = jnp.ones((1, n_frames, F), jnp.float32)
    uph = jnp.zeros((1, n_frames, 2 * F), jnp.float32)
    ref = istft(pred, jnp.zeros((1, n_frames, F), jnp.float32), SP)
    out = _decode_via_kernel(pred, uph, n_frames)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-3)
    assert float(jnp.abs(ref).max()) > 0


@pytest.mark.parametrize("batch,t", [(1, 16000), (2, 12345), (5, 33000)])
def test_stft_kernel_matches_stft(batch, t):
    rng = np.random.default_rng(t)
    w = jnp.asarray(rng.standard_normal((batch, t)), jnp.float32) * 0.3
    ref = stft(w, SP)
    out = stft_pallas(w, SP.n_fft, SP.win_length, SP.hop_length,
                      interpret=True)
    assert out.shape == ref.shape
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=5e-3 * max(scale, 1.0)
    )


def test_stft_kernel_multichannel_lead_dims():
    rng = np.random.default_rng(7)
    w = jnp.asarray(rng.standard_normal((2, 3, 8000)), jnp.float32)
    ref = stft(w, SP)
    out = stft_pallas(w, SP.n_fft, SP.win_length, SP.hop_length,
                      interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref),
        atol=5e-3 * float(jnp.abs(ref).max()),
    )
