"""Metric sanity/property tests (pystoi/pesq are absent from this image, so
STOI is validated against the published algorithm's invariants and SI-SDR
against closed-form cases)."""
import numpy as np
import pytest

import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.metrics import (
    batch_scores,
    build_metrics,
    si_sdr_batch,
    sisdr_eval,
    stoi_eval,
    estoi_eval,
)
from speech_enhancement_by_s3prl_tpu.metrics.stoi import resample, stoi_coeff_batch


def test_si_sdr_known_values():
    rng = np.random.default_rng(0)
    tar = rng.standard_normal((2, 8000)).astype(np.float32)
    # identical signals -> very high SI-SDR
    high = np.asarray(si_sdr_batch(jnp.asarray(tar), jnp.asarray(tar)))
    assert (high > 80).all()
    # known SNR mixture: si-sdr == snr for orthogonal noise at given power
    noise = rng.standard_normal((2, 8000)).astype(np.float32)
    noise -= (noise * tar).sum(-1, keepdims=True) / (tar * tar).sum(
        -1, keepdims=True
    ) * tar  # orthogonalize
    for snr_db in [0.0, 10.0]:
        scale = np.sqrt(
            (tar**2).sum(-1, keepdims=True)
            / (10 ** (snr_db / 10) * (noise**2).sum(-1, keepdims=True))
        )
        mix = tar + scale * noise
        got = np.asarray(si_sdr_batch(jnp.asarray(mix), jnp.asarray(tar)))
        np.testing.assert_allclose(got, snr_db, atol=0.1)


def test_si_sdr_scale_invariance_and_masking():
    rng = np.random.default_rng(1)
    tar = rng.standard_normal((1, 4000)).astype(np.float32)
    src = tar + 0.1 * rng.standard_normal((1, 4000)).astype(np.float32)
    a = np.asarray(si_sdr_batch(jnp.asarray(src * 5.0), jnp.asarray(tar)))
    b = np.asarray(si_sdr_batch(jnp.asarray(src), jnp.asarray(tar)))
    np.testing.assert_allclose(a, b, atol=1e-3)

    # masking == trimming
    src_pad = np.concatenate([src, rng.standard_normal((1, 1000)).astype(np.float32)], -1)
    tar_pad = np.concatenate([tar, np.zeros((1, 1000), np.float32)], -1)
    m = np.asarray(
        si_sdr_batch(jnp.asarray(src_pad), jnp.asarray(tar_pad), jnp.asarray([4000]))
    )
    np.testing.assert_allclose(m, b, atol=1e-4)


def test_resample_preserves_tone():
    """A 500 Hz tone resampled 16k -> 10k stays a 500 Hz tone."""
    t16 = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 500 * t16).astype(np.float32)
    out = np.asarray(resample(jnp.asarray(tone)[None], 16000, 10000))[0]
    assert abs(out.shape[-1] - 10000) <= 1
    t10 = np.arange(len(out)) / 10000.0
    expect = np.sin(2 * np.pi * 500 * t10)
    # ignore filter edges
    np.testing.assert_allclose(out[500:-500], expect[500:-500], atol=5e-3)


def _speechlike(rng, n, fs=16000):
    """Broadband amplitude-modulated noise: energy in every third-octave
    band (STOI assumes broadband speech), 3 Hz envelope modulation."""
    t = np.arange(n) / fs
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)
    carrier = rng.standard_normal(n)
    carrier = np.convolve(carrier, np.ones(3) / 3, mode="same")  # mild lowpass
    return (env * carrier * 0.3).astype(np.float32)


def test_stoi_perfect_reconstruction_is_one():
    rng = np.random.default_rng(2)
    x = np.stack([_speechlike(rng, 32000) for _ in range(2)])
    s = np.asarray(stoi_coeff_batch(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(s, 1.0, atol=1e-3)
    e = np.asarray(stoi_coeff_batch(jnp.asarray(x), jnp.asarray(x), extended=True))
    np.testing.assert_allclose(e, 1.0, atol=1e-3)


def test_stoi_decreases_with_noise():
    rng = np.random.default_rng(3)
    x = _speechlike(rng, 32000)[None]
    noise = rng.standard_normal(x.shape).astype(np.float32)

    def at_snr(snr_db):
        scale = np.sqrt((x**2).sum() / (10 ** (snr_db / 10) * (noise**2).sum()))
        y = x + scale * noise
        return float(stoi_coeff_batch(jnp.asarray(x), jnp.asarray(y))[0])

    s_clean = at_snr(30.0)
    s_mid = at_snr(0.0)
    s_bad = at_snr(-10.0)
    assert s_clean > s_mid > s_bad
    assert s_clean > 0.95 and s_bad < 0.75


def test_stoi_length_masking():
    """Padded-batch score with lengths == unpadded single score."""
    rng = np.random.default_rng(4)
    x = _speechlike(rng, 24000)
    y = x + 0.3 * rng.standard_normal(24000).astype(np.float32)
    full = float(stoi_coeff_batch(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
    xp = np.concatenate([x, np.zeros(8000, np.float32)])[None]
    yp = np.concatenate([y, np.zeros(8000, np.float32)])[None]
    masked = float(
        stoi_coeff_batch(
            jnp.asarray(xp), jnp.asarray(yp), lengths=jnp.asarray([24000])
        )[0]
    )
    np.testing.assert_allclose(masked, full, atol=2e-2)


def test_reference_eval_api():
    rng = np.random.default_rng(5)
    tar = _speechlike(rng, 20000)
    src = tar + 0.02 * rng.standard_normal(20000).astype(np.float32)
    assert sisdr_eval(src, tar) > 10
    assert 0.8 < stoi_eval(src, tar) <= 1.0
    assert 0.5 < estoi_eval(src, tar) <= 1.0
    fns = build_metrics(["stoi", "sisdr"])
    assert len(fns) == 2


def test_batch_scores_device_metrics():
    rng = np.random.default_rng(6)
    tar = np.stack([_speechlike(rng, 20000) for _ in range(3)])
    src = tar + 0.2 * rng.standard_normal(tar.shape).astype(np.float32)
    lengths = jnp.asarray([20000, 18000, 15000])
    scores = batch_scores(
        ["stoi", "sisdr", "estoi", "pesq_nb"],
        jnp.asarray(src), jnp.asarray(tar), lengths,
    )
    assert set(scores) == {"stoi", "sisdr", "estoi", "pesq_nb"}
    for v in scores.values():
        assert v.shape == (3,) and np.isfinite(np.asarray(v)).all()


def test_batch_scores_chunked_matches_unchunked(monkeypatch):
    """SE_METRIC_CHUNK tiles the batch through lax.map (HBM relief for
    large eval batches, docs/PERF.md) — scores must match to float ulps."""
    rng = np.random.default_rng(7)
    tar = np.stack([_speechlike(rng, 16000) for _ in range(4)])
    src = tar + 0.1 * rng.standard_normal(tar.shape).astype(np.float32)
    lengths = jnp.asarray([16000, 14000, 12000, 16000])
    names = ["stoi", "sisdr", "estoi", "pesq_nb"]
    ref = batch_scores(names, jnp.asarray(src), jnp.asarray(tar), lengths)
    monkeypatch.setenv("SE_METRIC_CHUNK", "2")
    chunked = batch_scores(names, jnp.asarray(src), jnp.asarray(tar), lengths)
    for n in names:
        np.testing.assert_allclose(np.asarray(ref[n]), np.asarray(chunked[n]), rtol=2e-6, atol=2e-6)
    # non-dividing chunk falls back to the unchunked path
    monkeypatch.setenv("SE_METRIC_CHUNK", "3")
    fb = batch_scores(names, jnp.asarray(src), jnp.asarray(tar), lengths)
    for n in names:
        np.testing.assert_allclose(np.asarray(ref[n]), np.asarray(fb[n]), rtol=2e-6, atol=2e-6)
