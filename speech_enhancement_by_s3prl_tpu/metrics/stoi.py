"""Short-Time Objective Intelligibility (STOI / ESTOI) in pure JAX.

The reference scores STOI through pystoi on CPU, one utterance at a time
under joblib (/root/reference/evaluation.py:28-36, runner.py:586-603), and
uses asteroid's NegSTOILoss as a training objective
(/root/reference/objective.py:16-45). Neither library exists in this image,
so this module implements the published algorithm (Taal et al., "An
Algorithm for Intelligibility Prediction of Time-Frequency Weighted Noisy
Speech", 2011; ESTOI: Jensen & Taal 2016) directly, batched and
differentiable, so STOI runs on-device for whole batches at once:

1. resample to 10 kHz (polyphase kaiser-windowed sinc, scipy-compatible);
2. remove silent frames (40 dB dynamic range on the clean signal's framed
   energy; 256-sample hann frames, 50% overlap) — metric mode only;
3. 512-pt STFT of 256-sample hann frames, hop 128;
4. 15 third-octave band envelopes from 150 Hz;
5. length-30 sliding segments: normalization + clipping + per-band
   correlation (STOI) or row/column-normalized segment correlation (ESTOI).

Static shapes throughout: silent-frame removal is a stable-partition gather
with validity masks instead of data-dependent reshapes, so the whole metric
jits and vmaps.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def metric_precision():
    """Matmul precision for the scoreboard metric kernels, read at trace
    time. TPU 'default' bf16-truncates contraction inputs, which measurably
    corrupts metric DFTs (STOI moved ~0.09 on band-limited signals); the
    default here is 'highest' (full f32, 6-pass). SE_METRIC_PRECISION=high
    selects the 3-pass bf16x3 mode — cheaper, near-f32 — if its measured
    metric error (docs/PERF.md) is acceptable."""
    import os

    name = os.environ.get("SE_METRIC_PRECISION", "highest").upper()
    return getattr(jax.lax.Precision, name)


FS = 10000          # STOI internal rate
N_FRAME = 256       # frame length at 10 kHz
HOP = 128
NFFT = 512
NUMBAND = 15
MINFREQ = 150
N_SEG = 30          # analysis segment length (384 ms)
BETA = -15.0        # lower SDR bound
DYN_RANGE = 40.0


@functools.lru_cache(maxsize=4)
def _resample_kernel(up: int, down: int, window_beta: float = 5.0):
    """Polyphase FIR (kaiser-windowed sinc), scipy.resample_poly-compatible."""
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    n = np.arange(-half_len, half_len + 1)
    h = up * f_c * np.sinc(f_c * n)
    h *= np.kaiser(2 * half_len + 1, window_beta)
    return np.asarray(h, dtype=np.float32)


@functools.lru_cache(maxsize=4)
def _polyphase_mat(up: int, down: int):
    """Dense blockwise form of the zero-stuff -> FIR -> decimate resampler.

    The textbook implementation (lhs-dilated conv) maps terribly onto TPU:
    XLA materializes the up-sampled stream, so a 161-tap 16k->10k pass at
    Precision.HIGHEST costs ~160 ms for (640, 160k) — dominating the eval
    step. Writing the SAME linear map blockwise turns it into one dense
    matmul: every block of ``up`` consecutive outputs reads the same
    ``Wd``-sample input window advancing by ``down``, so

        y[up*s + j] = sum_w  x[down*s + omin + w] * W[w, j]

    with W built here from the FIR taps (zero-interleaved per output
    phase). Returns (W (Wd, up), omin).
    """
    h = _resample_kernel(up, down)
    L = len(h)
    p = L // 2
    # output m = up*s + j reads taps k = p - j*down + up*o at input offset
    # o from the block base down*s (derivation: zero-stuffed index
    # m*down + k - p must be a multiple of up)
    omin = -(-(-p) // up)  # ceil(-p / up)
    omax = (L - 1 - p + (up - 1) * down) // up
    Wd = omax - omin + 1
    W = np.zeros((Wd, up), np.float32)
    for j in range(up):
        for o in range(omin, omax + 1):
            k = p - j * down + up * o
            if 0 <= k < L:
                W[o - omin, j] = h[k]
    return W, omin


def resample(x: jnp.ndarray, orig_sr: int, new_sr: int) -> jnp.ndarray:
    """(..., T) -> (..., ceil(T * up / down)) polyphase resample as one
    dense matmul (see _polyphase_mat)."""
    if orig_sr == new_sr:
        return x
    g = math.gcd(orig_sr, new_sr)
    up, down = new_sr // g, orig_sr // g
    W, omin = _polyphase_mat(up, down)
    Wd = W.shape[0]
    lead = x.shape[:-1]
    t = x.shape[-1]
    xb = x.reshape((-1, t))

    n_out = -(-t * up // down)  # ceil
    n_blocks = -(-n_out // up)
    # frames[s, w] = x[down*s + omin + w], zeros outside [0, t)
    left = max(0, -omin)
    start = omin + left
    need = down * (n_blocks - 1) + start + Wd  # highest index + 1 into xp
    xp = jnp.pad(xb, ((0, 0), (left, max(0, need - (t + left)))))
    # blockwise sliding window without gather: reshape to down-sample rows
    # and concatenate shifted row views (stride down == one row)
    n_rows = xp.shape[-1] // down
    k_rows = -(-(start + Wd) // down)
    if n_rows < n_blocks + k_rows:
        xp = jnp.pad(xp, ((0, 0), (0, (n_blocks + k_rows - n_rows) * down)))
        n_rows = n_blocks + k_rows
    view = xp[:, : n_rows * down].reshape(xb.shape[0], n_rows, down)
    wide = jnp.concatenate(
        [view[:, i : i + n_blocks] for i in range(k_rows)], axis=-1
    )
    frames = wide[:, :, start : start + Wd]
    # metrics are the scoreboard: no bf16-truncated contraction inputs
    # (TPU default precision truncates operands to bf16, measured to
    # move STOI by up to ~0.09 on band-limited signals)
    y = jnp.einsum(
        "bsw,wj->bsj", frames, jnp.asarray(W),
        preferred_element_type=jnp.float32, precision=metric_precision(),
    )
    y = y.reshape(xb.shape[0], n_blocks * up)[:, :n_out]
    return y.reshape(lead + (n_out,))


@functools.lru_cache(maxsize=1)
def _stoi_window():
    # hann without endpoint zeros, as used by the STOI reference
    w = np.hanning(N_FRAME + 2)[1:-1]
    return np.asarray(w, dtype=np.float32)


@functools.lru_cache(maxsize=1)
def _third_octave_matrix():
    """(n_bins, 15) binary band matrix over the 257-bin rfft grid."""
    f = np.linspace(0, FS, NFFT + 1)[: NFFT // 2 + 1]
    k = np.arange(NUMBAND, dtype=np.float64)
    cf = MINFREQ * 2.0 ** (k / 3.0)
    lo = cf * 2.0 ** (-1.0 / 6.0)
    hi = cf * 2.0 ** (1.0 / 6.0)
    obm = np.zeros((len(f), NUMBAND), dtype=np.float32)
    for j in range(NUMBAND):
        lo_idx = int(np.argmin((f - lo[j]) ** 2))
        hi_idx = int(np.argmin((f - hi[j]) ** 2))
        obm[lo_idx:hi_idx, j] = 1.0
    return obm


@functools.lru_cache(maxsize=1)
def _dft_mats():
    """512-pt real DFT of 256-sample windowed frames as matmul kernels."""
    w = _stoi_window().astype(np.float64)
    n = np.arange(N_FRAME)[:, None]
    k = np.arange(NFFT // 2 + 1)[None, :]
    ang = 2.0 * math.pi * n * k / NFFT
    re = (w[:, None] * np.cos(ang)).astype(np.float32)
    im = (w[:, None] * -np.sin(ang)).astype(np.float32)
    return re, im


@functools.lru_cache(maxsize=1)
def _trimmed_band_mats():
    """DFT + band matrices restricted to the bins any third-octave band
    actually reads (~bins 7..219 of 257). Exact: bins outside the bands
    never reach the band sum, and metric DFTs run at Precision.HIGHEST
    (6-pass f32), so dropping dead columns cuts real MXU work."""
    re, im = _dft_mats()
    obm = _third_octave_matrix()
    used = np.flatnonzero(obm.any(axis=1))
    k0, k1 = int(used[0]), int(used[-1]) + 1
    return re[:, k0:k1], im[:, k0:k1], obm[k0:k1]


def _frame(x: jnp.ndarray, n_frames: int) -> jnp.ndarray:
    """(B, T) -> (B, n_frames, N_FRAME) hop-128 frames (no padding)."""
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FRAME)[None, :]
    return x[:, idx]


def _remove_silent(x_frames, y_frames, frame_valid):
    """Stable-partition frames whose CLEAN (x) windowed energy is within
    DYN_RANGE dB of the loudest frame; silent/invalid frames move to the
    end with zero weight. Returns (x_kept, y_kept, kept_mask)."""
    w = _stoi_window()
    xw = x_frames * w
    yw = y_frames * w
    energy = 20.0 * jnp.log10(jnp.linalg.norm(xw, axis=-1) + 1e-12)  # (B, M)
    energy = jnp.where(frame_valid > 0, energy, -jnp.inf)
    keep = (energy - energy.max(axis=-1, keepdims=True) + DYN_RANGE) > 0
    keep = keep & (frame_valid > 0)

    order = jnp.argsort(~keep, axis=-1, stable=True)  # kept frames first
    xk = jnp.take_along_axis(xw, order[..., None], axis=1)
    yk = jnp.take_along_axis(yw, order[..., None], axis=1)
    kept = jnp.take_along_axis(keep, order, axis=1)
    xk = xk * kept[..., None]
    yk = yk * kept[..., None]
    return xk, yk, kept


def _ola_reframe(frames_w, kept):
    """Overlap-add windowed frames back to a signal, then re-frame — the
    reconstruction step of silent-frame removal (scatter-free OLA)."""
    from ..ops.stft import _overlap_add

    B, M, _ = frames_w.shape
    sig = _overlap_add(frames_w, HOP)
    n_frames = max(M, 1)
    framed = _frame(sig, n_frames)
    n_kept = kept.sum(axis=-1)  # (B,)
    valid = jnp.arange(n_frames)[None, :] < n_kept[:, None]
    return framed, valid


def _band_envelopes(frames):
    """(B, M, 256) raw frames -> (B, M, 15) third-octave magnitudes."""
    re_mat, im_mat, obm = _trimmed_band_mats()
    # near-f32 operands: TPU default matmul precision feeds bf16-truncated
    # inputs to the MXU, which corrupts the DFT of band-limited signals
    # enough to move STOI by ~0.09 (measured on v5e; metric_precision()
    # matches the CPU reference to <1e-4)
    hi = metric_precision()
    re = jnp.einsum("bmn,nk->bmk", frames, re_mat,
                    preferred_element_type=jnp.float32, precision=hi)
    im = jnp.einsum("bmn,nk->bmk", frames, im_mat,
                    preferred_element_type=jnp.float32, precision=hi)
    power = re * re + im * im
    band_pow = jnp.einsum("bmk,kj->bmj", power, obm,
                          preferred_element_type=jnp.float32, precision=hi)
    return jnp.sqrt(band_pow + 1e-20)


def _segments(env, n_frames_total):
    """(B, M, J) -> (B, S, J, N_SEG) sliding length-30 segments, S = M-29."""
    M = env.shape[1]
    S = max(M - N_SEG + 1, 1)
    idx = jnp.arange(S)[:, None] + jnp.arange(N_SEG)[None, :]
    seg = env[:, idx]  # (B, S, N_SEG, J)
    return jnp.swapaxes(seg, 2, 3)  # (B, S, J, N_SEG)


def _correlation(a, b, axis=-1, eps=1e-12):
    a = a - a.mean(axis=axis, keepdims=True)
    b = b - b.mean(axis=axis, keepdims=True)
    num = (a * b).sum(axis=axis)
    den = jnp.sqrt((a * a).sum(axis=axis) * (b * b).sum(axis=axis)) + eps
    return num / den


def stoi_coeff_batch(
    clean: jnp.ndarray,
    processed: jnp.ndarray,
    sample_rate: int = 16000,
    extended: bool = False,
    remove_silent: bool = True,
    lengths=None,
) -> jnp.ndarray:
    """Batched STOI coefficient, (B, T) x (B, T) -> (B,).

    ``clean`` is the reference (the first argument of pystoi.stoi);
    ``processed`` the degraded/enhanced signal. ``lengths`` masks padded
    samples. ``remove_silent=False`` gives the asteroid-NegSTOILoss-style
    differentiable variant used for training.
    """
    clean = clean.astype(jnp.float32)
    processed = processed.astype(jnp.float32)
    if lengths is not None:
        t_mask = jnp.arange(clean.shape[-1])[None, :] < lengths[:, None]
        clean = clean * t_mask
        processed = processed * t_mask
        len10k = (lengths * FS) // sample_rate
    else:
        len10k = jnp.full((clean.shape[0],), clean.shape[-1] * FS // sample_rate)

    x = resample(clean, sample_rate, FS)
    y = resample(processed, sample_rate, FS)

    T = x.shape[-1]
    M = max((T - N_FRAME) // HOP + 1, 1)
    xf = _frame(x, M)
    yf = _frame(y, M)
    frame_valid = (
        jnp.arange(M)[None, :] * HOP + N_FRAME
    ) <= len10k[:, None]

    if remove_silent:
        xk, yk, kept = _remove_silent(xf, yf, frame_valid)
        x_frames, valid = _ola_reframe(xk, kept)
        y_frames, _ = _ola_reframe(yk, kept)
    else:
        # raw frames: _band_envelopes' DFT matrices already fold the hann
        # window in (windowing here would apply it twice)
        x_frames, y_frames = xf, yf
        valid = frame_valid

    X = _band_envelopes(x_frames)  # (B, M, J)
    Y = _band_envelopes(y_frames)

    xs = _segments(X, None)  # (B, S, J, N)
    ys = _segments(Y, None)
    S = xs.shape[1]
    # a segment is usable iff all its 30 frames are valid
    seg_valid = (
        jnp.arange(S)[None, :] + N_SEG <= valid.sum(axis=-1)[:, None]
    ).astype(jnp.float32)  # (B, S)

    d = _estoi_tail(xs, ys) if extended else _stoi_tail(xs, ys)
    seg_count = jnp.maximum(seg_valid.sum(axis=-1), 1.0)
    return (d * seg_valid).sum(axis=-1) / seg_count


def _stoi_tail(xs, ys):
    norm_x = jnp.linalg.norm(xs, axis=-1, keepdims=True)
    norm_y = jnp.linalg.norm(ys, axis=-1, keepdims=True)
    alpha = norm_x / (norm_y + 1e-12)
    ys_n = ys * alpha
    clip = xs * (1.0 + 10.0 ** (-BETA / 20.0))
    ys_n = jnp.minimum(ys_n, clip)
    d = _correlation(xs, ys_n, axis=-1)  # (B, S, J)
    return d.mean(axis=-1)  # (B, S)


def _estoi_tail(xs, ys):
    def row_col_norm(z):
        z = z - z.mean(axis=-1, keepdims=True)
        z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-12)
        z = z - z.mean(axis=-2, keepdims=True)
        z = z / (jnp.linalg.norm(z, axis=-2, keepdims=True) + 1e-12)
        return z

    xn = row_col_norm(xs)
    yn = row_col_norm(ys)
    # ESTOI: d_m = (1/N) * sum_j sum_n xn * yn — after column (band-axis)
    # unit normalization each of the N time columns contributes <= 1.
    return (xn * yn).sum(axis=(-1, -2)) / N_SEG  # (B, S)


def stoi_estoi_batch(
    clean: jnp.ndarray,
    processed: jnp.ndarray,
    sample_rate: int = 16000,
    remove_silent: bool = True,
    lengths=None,
):
    """STOI and ESTOI from ONE shared front-end -> ((B,), (B,)).

    The resample / framing / silence-removal / band-envelope / segment
    pipeline is identical for both metrics (they differ only in the
    per-segment correlation), but XLA does not reliably CSE the two
    stoi_coeff_batch calls' duplicated streams (the round-5 eval_full
    trace showed the resample and segment-gather fusions twice). Sharing
    it explicitly gives bitwise-identical scores at half the front-end
    cost."""
    clean = clean.astype(jnp.float32)
    processed = processed.astype(jnp.float32)
    if lengths is not None:
        t_mask = jnp.arange(clean.shape[-1])[None, :] < lengths[:, None]
        clean = clean * t_mask
        processed = processed * t_mask
        len10k = (lengths * FS) // sample_rate
    else:
        len10k = jnp.full(
            (clean.shape[0],), clean.shape[-1] * FS // sample_rate
        )

    x = resample(clean, sample_rate, FS)
    y = resample(processed, sample_rate, FS)

    T = x.shape[-1]
    M = max((T - N_FRAME) // HOP + 1, 1)
    xf = _frame(x, M)
    yf = _frame(y, M)
    frame_valid = (
        jnp.arange(M)[None, :] * HOP + N_FRAME
    ) <= len10k[:, None]

    if remove_silent:
        xk, yk, kept = _remove_silent(xf, yf, frame_valid)
        x_frames, valid = _ola_reframe(xk, kept)
        y_frames, _ = _ola_reframe(yk, kept)
    else:
        x_frames, y_frames = xf, yf
        valid = frame_valid

    X = _band_envelopes(x_frames)
    Y = _band_envelopes(y_frames)
    xs = _segments(X, None)
    ys = _segments(Y, None)
    S = xs.shape[1]
    seg_valid = (
        jnp.arange(S)[None, :] + N_SEG <= valid.sum(axis=-1)[:, None]
    ).astype(jnp.float32)
    seg_count = jnp.maximum(seg_valid.sum(axis=-1), 1.0)

    def agg(d):
        return (d * seg_valid).sum(axis=-1) / seg_count

    return agg(_stoi_tail(xs, ys)), agg(_estoi_tail(xs, ys))
