"""Cross-check the JAX STOI/ESTOI against an independent numpy
implementation written directly from the published algorithms.

pystoi/asteroid are absent from this image (they are what the reference
scores with, /root/reference/evaluation.py:28-36, objective.py:16-45), so
external truth is reconstructed here: a loop-based, unvectorized numpy
transcription of Taal et al. 2011 (STOI) and Jensen & Taal 2016 (ESTOI),
structured like pystoi (silent-frame removal by windowed overlap-add, then
zero-padded 512-pt rFFT analysis). Any axis mixup, DFT/band-matrix error,
or windowing bug in the vectorized JAX path shows up as a mismatch.

Signals are generated at 10 kHz so the resampler (tested separately in
test_metrics.py) is out of the loop.
"""
import math

import numpy as np
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.metrics.stoi import stoi_coeff_batch

FS = 10000
N_FRAME = 256
HOP = 128
NFFT = 512
NUMBAND = 15
MINFREQ = 150
N_SEG = 30
BETA = -15.0
DYN_RANGE = 40.0


def _hann():
    return np.hanning(N_FRAME + 2)[1:-1]


def _frames(x):
    m = (len(x) - N_FRAME) // HOP + 1
    return np.stack([x[i * HOP : i * HOP + N_FRAME] for i in range(m)])


def _third_octave_matrix():
    f = np.linspace(0, FS, NFFT + 1)[: NFFT // 2 + 1]
    obm = np.zeros((NFFT // 2 + 1, NUMBAND))
    for j in range(NUMBAND):
        cf = MINFREQ * 2.0 ** (j / 3.0)
        lo = cf * 2.0 ** (-1.0 / 6.0)
        hi = cf * 2.0 ** (1.0 / 6.0)
        lo_idx = int(np.argmin((f - lo) ** 2))
        hi_idx = int(np.argmin((f - hi) ** 2))
        obm[lo_idx:hi_idx, j] = 1.0
    return obm


def _band_env(sig, n_keep_frames):
    """Third-octave magnitudes of hann-windowed zero-padded rFFT frames."""
    w = _hann()
    fr = _frames(sig)[:n_keep_frames]
    spec = np.fft.rfft(fr * w, NFFT, axis=-1)
    power = np.abs(spec) ** 2
    return np.sqrt(power @ _third_octave_matrix() + 1e-20)


def _remove_silent(x, y):
    """pystoi-style: window frames, keep frames whose clean energy is within
    DYN_RANGE dB of the loudest, overlap-add kept frames back to signals."""
    w = _hann()
    xf = _frames(x) * w
    yf = _frames(y) * w
    energies = 20 * np.log10(np.linalg.norm(xf, axis=1) + 1e-12)
    mask = energies > energies.max() - DYN_RANGE
    xk, yk = xf[mask], yf[mask]
    n = len(xk)
    out_len = (n - 1) * HOP + N_FRAME
    x_sil = np.zeros(out_len)
    y_sil = np.zeros(out_len)
    for i in range(n):
        x_sil[i * HOP : i * HOP + N_FRAME] += xk[i]
        y_sil[i * HOP : i * HOP + N_FRAME] += yk[i]
    return x_sil, y_sil, n


def _stoi_numpy(x, y, extended=False, remove_silent=True):
    if remove_silent:
        x, y, n_frames = _remove_silent(x, y)
    else:
        n_frames = (len(x) - N_FRAME) // HOP + 1
    X = _band_env(x, n_frames)  # (M, 15)
    Y = _band_env(y, n_frames)
    M = X.shape[0]
    ds = []
    for m in range(N_SEG, M + 1):
        xs = X[m - N_SEG : m].T  # (15, 30)
        ys = Y[m - N_SEG : m].T
        if not extended:
            alpha = np.linalg.norm(xs, axis=-1, keepdims=True) / (
                np.linalg.norm(ys, axis=-1, keepdims=True) + 1e-12
            )
            ys_n = np.minimum(ys * alpha, xs * (1 + 10 ** (-BETA / 20)))
            d = 0.0
            for j in range(NUMBAND):
                a = xs[j] - xs[j].mean()
                b = ys_n[j] - ys_n[j].mean()
                d += (a * b).sum() / (
                    np.linalg.norm(a) * np.linalg.norm(b) + 1e-12
                )
            ds.append(d / NUMBAND)
        else:
            xn = xs - xs.mean(axis=-1, keepdims=True)
            xn = xn / (np.linalg.norm(xn, axis=-1, keepdims=True) + 1e-12)
            xn = xn - xn.mean(axis=0, keepdims=True)
            xn = xn / (np.linalg.norm(xn, axis=0, keepdims=True) + 1e-12)
            yn = ys - ys.mean(axis=-1, keepdims=True)
            yn = yn / (np.linalg.norm(yn, axis=-1, keepdims=True) + 1e-12)
            yn = yn - yn.mean(axis=0, keepdims=True)
            yn = yn / (np.linalg.norm(yn, axis=0, keepdims=True) + 1e-12)
            ds.append((xn * yn).sum() / N_SEG)
    return float(np.mean(ds))


def _speechlike(rng, n, silent_gap=None):
    t = np.arange(n) / FS
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)
    carrier = rng.standard_normal(n)
    carrier = np.convolve(carrier, np.ones(3) / 3, mode="same")
    x = env * carrier * 0.3
    if silent_gap is not None:
        a, b = silent_gap
        x[a:b] *= 1e-4
    return x.astype(np.float32)


def _jax_stoi(x, y, **kw):
    return float(
        stoi_coeff_batch(
            jnp.asarray(x)[None], jnp.asarray(y)[None], sample_rate=FS, **kw
        )[0]
    )


def test_stoi_matches_numpy_reference():
    rng = np.random.default_rng(7)
    for snr_db in (10.0, 0.0, -5.0):
        x = _speechlike(rng, 24000 + N_FRAME)
        noise = rng.standard_normal(x.shape)
        noise *= math.sqrt(
            (x**2).sum() / (10 ** (snr_db / 10) * (noise**2).sum())
        )
        y = (x + noise).astype(np.float32)
        want = _stoi_numpy(x.astype(np.float64), y.astype(np.float64))
        got = _jax_stoi(x, y)
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_estoi_matches_numpy_reference():
    rng = np.random.default_rng(8)
    x = _speechlike(rng, 24000 + N_FRAME)
    noise = rng.standard_normal(x.shape)
    noise *= math.sqrt((x**2).sum() / ((noise**2).sum()))  # 0 dB
    y = (x + noise).astype(np.float32)
    want = _stoi_numpy(x.astype(np.float64), y.astype(np.float64), extended=True)
    got = _jax_stoi(x, y, extended=True)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_stoi_silent_frame_removal_matches_numpy():
    """A long near-silent gap exercises the stable-partition removal path."""
    rng = np.random.default_rng(9)
    x = _speechlike(rng, 24000 + N_FRAME, silent_gap=(8000, 14000))
    y = (x + 0.05 * rng.standard_normal(x.shape)).astype(np.float32)
    want = _stoi_numpy(x.astype(np.float64), y.astype(np.float64))
    got = _jax_stoi(x, y)
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_stoi_objective_variant_matches_numpy():
    """remove_silent=False (the asteroid-NegSTOILoss-style training path):
    raw frames go through a single analysis window, not two."""
    rng = np.random.default_rng(10)
    x = _speechlike(rng, 16000 + N_FRAME)
    y = (x + 0.2 * rng.standard_normal(x.shape)).astype(np.float32)
    for extended in (False, True):
        want = _stoi_numpy(
            x.astype(np.float64), y.astype(np.float64),
            extended=extended, remove_silent=False,
        )
        got = _jax_stoi(x, y, extended=extended, remove_silent=False)
        np.testing.assert_allclose(got, want, atol=2e-3)


def test_stoi_objective_variant_tracks_metric_when_no_silence():
    """With no silent frames, removal reconstructs the same signal in the
    interior, so both variants should agree closely."""
    rng = np.random.default_rng(11)
    x = _speechlike(rng, 24000 + N_FRAME)
    y = (x + 0.1 * rng.standard_normal(x.shape)).astype(np.float32)
    a = _jax_stoi(x, y, remove_silent=True)
    b = _jax_stoi(x, y, remove_silent=False)
    np.testing.assert_allclose(a, b, atol=2e-2)
