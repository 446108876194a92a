"""PESQ (ITU-T P.862) perceptual model in JAX — batched, on device.

The reference scores PESQ through the ITU reference C code (`pesq` wheel,
/root/reference/evaluation.py:12-26), one utterance per CPU process. That
binary is absent here, so this module implements the P.862 perceptual
model natively with the published structure and, since round 3, the
published constant tables (metrics/p862_tables.py):

  level alignment (350-3250 Hz band power -> 1e7) -> receive filtering
  (standard IRS receive table in nb mode) -> time-frequency decomposition
  (32 ms hann frames, 50% overlap) -> bark-band grouping (published bin
  counts, 100/nr power-density correction, Sp scale) -> partial frequency
  compensation -> time-varying gain compensation (audible-power ratio,
  0.2/0.8 first-order smoothing) -> modified Zwicker loudness (Sl scale,
  low-band exponent modification) -> center-clipped disturbance with
  masking -> asymmetry weighting -> weighted-L2(bark) / L6(320 ms) /
  L2(time) aggregation -> raw PESQ -> MOS-LQO mapping (P.862.1
  narrowband / P.862.2 wideband constants).

Remaining deviations from the ITU implementation, stated plainly:
- time alignment is one global delay per utterance (envelope coarse pass
  + sample-exact raw-signal fine correlation) plus, when
  ``realign=True``, the P.862 bad-interval refinement: intervals of
  consecutive frames whose disturbance exceeds the bad-frame threshold
  are re-aligned by raw-signal cross-correlation and re-scored, keeping
  the realigned disturbance when it is lower — the mechanism by which
  the ITU chain absorbs mid-utterance delay changes (its per-utterance
  splitting reduces to this when the piecewise delays disagree). The
  refinement caps intervals per utterance and frames per interval
  (static TPU shapes; knobs below) where the ITU code is unbounded, and
  this framework's own enhancement pipeline is sample-aligned by
  construction (iSTFT with the noisy phase preserves timing), so the
  batched eval kernel leaves it off by default (SE_PESQ_REALIGN=1
  forces it; the host per-utterance API enables it for external pairs);
- the IRS receive filter is applied in the power-spectral domain per
  frame (exact published magnitude response; the ITU filters the time
  signal, which additionally smears frame boundaries);
- the wideband input filter is a smooth analytic highpass.

Scores track P.862 MOS-LQO in ordering and absolute range; for
ITU-certified numbers run the ITU binary (scripts/metrics_conformance.py
measures the deltas wherever the `pesq` wheel exists). Unlike the
reference's per-utterance CPU loop, this runs a whole padded batch in one
XLA program.

`SE_PESQ_TABLES=analytic` falls back to the pre-round-3 analytically
generated bands/thresholds (Traunmüller warp + Terhardt threshold +
smooth IRS), run through the same pipeline.
"""
from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from .p862_tables import (
    TARGET_AVG_POWER,
    band_tables,
    irs_receive_gain,
)
from .stoi import metric_precision as _metric_precision

ZWICKER = 0.23


def _hz_to_bark(f):
    return 26.81 * np.asarray(f, np.float64) / (1960.0 + np.asarray(f)) - 0.53


def _terhardt_threshold_db(f_khz):
    """Absolute hearing threshold (dB SPL), Terhardt's analytic curve."""
    f = np.maximum(np.asarray(f_khz, np.float64), 0.02)
    return (
        3.64 * f**-0.8
        - 6.5 * np.exp(-0.6 * (f - 3.3) ** 2)
        + 1e-3 * f**4
    )


def _analytic_bands(fs: int, n_bins: int, freqs: np.ndarray) -> dict:
    """The pre-round-3 analytic generator (SE_PESQ_TABLES=analytic):
    uniform-bark bands from the Traunmüller warp, Terhardt thresholds."""
    nb = 42 if fs == 8000 else 49
    T = band_tables(fs)  # for Sp/Sl scale only
    bark = _hz_to_bark(freqs)
    edges = np.linspace(bark[1], bark[-1], nb + 1)
    idx = np.clip(np.searchsorted(edges, bark) - 1, 0, nb - 1)
    group = np.zeros((n_bins, nb), np.float64)
    for k in range(1, n_bins):
        group[k, idx[k]] = 1.0
    counts = np.maximum(group.sum(axis=0), 1.0)
    group = group * (100.0 / counts) * T["sp"]

    centers_bark = 0.5 * (edges[:-1] + edges[1:])
    centers_hz = 1960.0 * (centers_bark + 0.53) / (26.28 - centers_bark)
    width_bark = np.diff(edges)
    thr_db = _terhardt_threshold_db(centers_hz / 1000.0)
    p0 = 10.0 ** (thr_db / 10.0)

    # smooth IRS-receive-like bandpass magnitude
    f_safe = np.maximum(freqs, 1.0)
    irs_db = (
        -18.0 * (np.log2(310.0 / f_safe).clip(min=0.0)) ** 2 / 2.0
        - 12.0 * (np.log2(f_safe / 3100.0).clip(min=0.0)) ** 2
    )
    return dict(
        nb=nb, group=group, p0=p0, width=width_bark, centre=centers_bark,
        sl=T["sl"], irs_gain=10.0 ** (irs_db / 20.0),
    )


def _table_bands(fs: int, n_bins: int, freqs: np.ndarray) -> dict:
    """Published-table band model (default): per-band FFT-bin runs with
    the 100/nr power-density correction and Sp scale baked into the
    grouping matrix."""
    T = band_tables(fs)
    nb = T["nb"]
    group = np.zeros((n_bins, nb), np.float64)
    start = 1  # DC excluded
    for j, n in enumerate(T["nr_of_hz_bands"]):
        group[start : start + int(n), j] = T["pow_dens_correction"][j] * T["sp"]
        start += int(n)
    assert start <= n_bins + 1
    return dict(
        nb=nb, group=group, p0=T["abs_thresh"], width=T["width_bark"],
        centre=T["centre_bark"], sl=T["sl"],
        irs_gain=irs_receive_gain(freqs),
    )


def _model_consts(fs: int, source: str = ""):
    """Frame geometry + band model for the P.862 pipeline at fs.

    The SE_PESQ_TABLES knob ('p862' published tables / 'analytic'
    fallback) is re-read on every call — only the resolved (fs, source)
    pair is cached, so flipping the env mid-process takes effect."""
    return _model_consts_cached(
        fs, source or os.environ.get("SE_PESQ_TABLES", "p862")
    )


@functools.lru_cache(maxsize=8)
def _model_consts_cached(fs: int, source: str):
    if fs == 8000:
        n_frame = 256
    elif fs == 16000:
        n_frame = 512
    else:
        raise ValueError(f"PESQ model supports 8k/16k, got {fs}")
    hop = n_frame // 2
    n_bins = n_frame // 2 + 1
    freqs = np.linspace(0, fs / 2, n_bins)

    if source == "analytic":
        bands = _analytic_bands(fs, n_bins, freqs)
    else:
        bands = _table_bands(fs, n_bins, freqs)
    # the ITU chain computes the per-frame power spectrum as |FFT|^2 / N;
    # our DFT matrices are unnormalized, so fold 1/N into the grouping.
    # This anchors the absolute internal scale the model's additive
    # constants (+50 asymmetry offset, +1e3/+5e3 compensation floors,
    # 1e5/1e7 frame weights) are defined against.
    bands["group"] = bands["group"] / n_frame

    # modified Zwicker exponent per band (low-band modification)
    centre = bands["centre"]
    h = np.where(centre < 4.0, np.minimum(6.0 / (centre + 2.0), 2.0), 1.0)
    mzp = ZWICKER * h**0.15

    window = np.hanning(n_frame + 1)[:n_frame].astype(np.float32)
    n = np.arange(n_frame)[:, None].astype(np.float64)
    k = np.arange(n_bins)[None, :].astype(np.float64)
    ang = 2 * math.pi * n * k / n_frame
    dft_re = (window[:, None] * np.cos(ang)).astype(np.float32)
    dft_im = (window[:, None] * -np.sin(ang)).astype(np.float32)

    # wideband input filter: gentle highpass below 100 Hz (P.862.2 mode)
    f_safe = np.maximum(freqs, 1.0)
    wb_db = -24.0 * (np.log2(100.0 / f_safe).clip(min=0.0)) ** 2
    wb_gain = (10.0 ** (wb_db / 20.0)).astype(np.float32)

    return dict(
        n_frame=n_frame, hop=hop, n_bins=n_bins, nb=bands["nb"],
        group=bands["group"].astype(np.float32),
        p0=bands["p0"].astype(np.float32),
        width=bands["width"].astype(np.float32),
        mzp=mzp.astype(np.float32),
        sl=float(bands["sl"]),
        irs_gain=bands["irs_gain"].astype(np.float32),
        wb_gain=wb_gain,
        dft_re=dft_re, dft_im=dft_im,
    )


def _frames_power(x, C):
    n_frames = max((x.shape[-1] - C["n_frame"]) // C["hop"] + 1, 1)
    idx = (
        jnp.arange(n_frames)[:, None] * C["hop"]
        + jnp.arange(C["n_frame"])[None, :]
    )
    fr = x[:, idx]
    # scoreboard metric: full-f32 contraction operands (TPU default
    # precision bf16-truncates matmul inputs — see metrics/stoi.py note)
    hi = _metric_precision()
    re = jnp.einsum("bmn,nk->bmk", fr, jnp.asarray(C["dft_re"]),
                    preferred_element_type=jnp.float32, precision=hi)
    im = jnp.einsum("bmn,nk->bmk", fr, jnp.asarray(C["dft_im"]),
                    preferred_element_type=jnp.float32, precision=hi)
    return re * re + im * im  # (B, M, bins)


def _fix_power_level(x, lengths, fs: int):
    """ITU level alignment: scale each utterance so its mean power over
    the valid samples, band-limited to 350-3250 Hz, equals 1e7
    (TARGET_AVG_POWER; the C code's fix_power_level).

    The transform zero-pads to a power of two: TPU FFTs at non-pow2
    lengths fall back to Bluestein (3 transforms + elementwise), and
    zero-padding changes neither the Parseval band energy nor the valid
    sample count — only the (finer) frequency grid the band mask lives
    on."""
    T = x.shape[-1]
    nfft = 1 << (max(T, 2) - 1).bit_length()
    X = jnp.fft.rfft(x.astype(jnp.float32), n=nfft, axis=-1)
    freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
    bandm = jnp.asarray(((freqs >= 350.0) & (freqs <= 3250.0)), jnp.float32)
    # Parseval (band excludes DC/Nyquist): sum_n x_bp^2 = 2 sum_band |X|^2/nfft
    energy = 2.0 * (
        (jnp.real(X) ** 2 + jnp.imag(X) ** 2) * bandm
    ).sum(-1) / nfft
    denom = lengths.astype(jnp.float32) if lengths is not None else float(T)
    power = energy / denom
    scale = jnp.sqrt(TARGET_AVG_POWER / jnp.maximum(power, 1e-12))
    return x * scale[:, None]


def _align_delay(ref: jnp.ndarray, deg: jnp.ndarray, max_delay: int):
    """Per-utterance delay estimate (samples), P.862-alignment style:
    a coarse pass cross-correlates 4 ms energy envelopes via FFT and
    takes the argmax within +/- max_delay, then a fine pass
    cross-correlates the raw signals and refines within +/- one envelope
    cell — the estimate is exact to the sample for a bulk delay.
    Positive delay = deg lags ref."""
    dec = 64  # 4 ms at 16 kHz
    T = ref.shape[-1]
    n = (T // dec) * dec
    er_raw = jnp.abs(ref[:, :n]).reshape(ref.shape[0], -1, dec).sum(-1)
    ed_raw = jnp.abs(deg[:, :n]).reshape(deg.shape[0], -1, dec).sum(-1)
    er = er_raw - er_raw.mean(-1, keepdims=True)
    ed = ed_raw - ed_raw.mean(-1, keepdims=True)
    L = er.shape[-1]
    nfft = 1 << (2 * L - 1).bit_length()
    X = jnp.fft.rfft(er, nfft)
    Y = jnp.fft.rfft(ed, nfft)
    xc = jnp.fft.irfft(jnp.conj(X) * Y, nfft)  # xc[d] = sum er[t] ed[t+d... ]
    # clamp the search range to the envelope length: beyond L-1 cells the
    # signals share no overlap, and the lag-index table below requires
    # nfft >= 2*md+1 (nfft is the pow2 >= 2L-1, so md <= L-1 guarantees
    # it) — without the clamp, utterances shorter than 2*max_delay mapped
    # positive-lag bins onto negative positions and returned garbage
    md = max(min(max_delay // dec, L - 1), 1)
    # lags -md..md: negative lags live at nfft-|d|
    lags = jnp.concatenate([jnp.arange(0, md + 1), jnp.arange(nfft - md, nfft)])
    vals = xc[:, lags]
    best = jnp.argmax(vals, axis=-1)
    lag = jnp.where(best <= md, best, best - (2 * md + 1))
    coarse = lag * dec

    # fine pass: raw-signal cross-correlation searched only within
    # +/- dec samples of the coarse lag. For long signals it runs on a
    # W-sample window centered on the reference's highest-energy
    # envelope cell — same argmax for a bulk delay (any window holding
    # signal energy votes the same lag), and it replaces three
    # full-length pow2 FFTs (524,288-point at 10 s: ~50 ms of VPU time)
    # with two slices and a (B, 2*dec+1, W) einsum on the MXU.
    W = 4096
    guard = max_delay + dec
    if T >= W + 2 * guard:
        center = jnp.argmax(er_raw, axis=-1) * dec + dec // 2
        s_ref = jnp.clip(center - W // 2, guard, T - W - guard)
        s_deg = s_ref + coarse  # |coarse| <= max_delay keeps this in range
        ref_seg = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (W,))
        )(ref, s_ref)
        deg_wide = jax.vmap(
            lambda row, s: jax.lax.dynamic_slice(row, (s,), (W + 2 * dec,))
        )(deg, s_deg - dec)
        win_idx = (
            jnp.arange(2 * dec + 1)[:, None] + jnp.arange(W)[None, :]
        )  # shared across rows -> XLA's fast shared-index gather path
        xc_seg = jnp.einsum(
            "bw,bow->bo", ref_seg, deg_wide[:, win_idx],
            preferred_element_type=jnp.float32,
            precision=_metric_precision(),
        )
        return coarse + (jnp.argmax(xc_seg, axis=-1) - dec)

    # short signals: full-length FFT cross-correlation (cheap there;
    # pow2 FFT — see _fix_power_level)
    nfft2 = 1 << (2 * T - 1).bit_length()
    Xf = jnp.fft.rfft(ref, nfft2)
    Yf = jnp.fft.rfft(deg, nfft2)
    xcf = jnp.fft.irfft(jnp.conj(Xf) * Yf, nfft2)
    offsets = jnp.arange(-dec, dec + 1)
    idx = jnp.mod(coarse[:, None] + offsets[None, :], nfft2)
    fine_vals = jnp.take_along_axis(xcf, idx, axis=-1)
    return coarse + offsets[jnp.argmax(fine_vals, axis=-1)]


def _shift_back(x: jnp.ndarray, delay: jnp.ndarray, max_abs: int):
    """x[i, t] -> x[i, t + delay_i] (zero-padded): undo a per-utterance
    lag so deg lines up with ref. ``max_abs`` statically bounds |delay|.

    Implemented as vmap(dynamic_slice) into a zero-padded copy: the
    row-dependent-offset gather this used to be hits XLA:TPU's slow
    gather path (measured 241.6 ms for (128, 160k); the slice form is
    6.6 ms, output bit-identical — this was the entire cost gap between
    align=True and align=False PESQ, docs/PERF.md)."""
    T = x.shape[-1]
    delay = jnp.clip(delay, -max_abs, max_abs)
    padded = jnp.pad(x, ((0, 0), (max_abs, max_abs)))
    out = jax.vmap(
        lambda row, s: jax.lax.dynamic_slice(row, (s,), (T,))
    )(padded, max_abs + delay)
    idx = jnp.arange(T)[None, :] + delay[:, None]
    return out * ((idx >= 0) & (idx < T))


def _loudness(Bp, p0, mzp, sl):
    """Modified Zwicker loudness (Sl scale, per-band exponent)."""
    r = (0.5 + 0.5 * Bp / p0) ** mzp - 1.0
    return sl * (p0 / 0.5) ** mzp * jnp.maximum(r, 0.0)


def _frame_disturbance(L_ref, L_deg, B_ref_eq, B_deg_eq, w, W):
    """Per-frame symmetric / asymmetric disturbance from loudness pairs:
    masking deadzone, asymmetry weighting, pseudo-Lp bark aggregation
    (band 0 excluded via the width vector ``w``). Shared by the main pass
    and the bad-interval realignment (which re-runs it on re-aligned
    degraded frames)."""
    d = L_deg - L_ref
    m = 0.25 * jnp.minimum(L_deg, L_ref)
    d_sym = jnp.sign(d) * jnp.maximum(jnp.abs(d) - m, 0.0)

    asym = ((B_deg_eq + 50.0) / (B_ref_eq + 50.0)) ** 1.2
    asym = jnp.where(asym < 3.0, 0.0, jnp.minimum(asym, 12.0))
    d_asym = d_sym * asym

    frame_sym = jnp.sqrt(W * ((d_sym * w) ** 2).sum(-1))
    frame_asym = (jnp.abs(d_asym) * w).sum(-1)
    return frame_sym, frame_asym


# -- P.862 bad-interval realignment constants (the published thresholds) --
THRESHOLD_BAD_FRAMES = 30.0   # weighted frame disturbance above = "bad"
MIN_BAD_FRAMES_IN_INTERVAL = 5


def _bad_interval_realign(
    C, ref, deg, g2, frame_sym, frame_asym, fmask,
    B_ref_eq, L_ref, ratio_s, fw, w, W, p0, mzp, sl,
):
    """P.862 bad-interval refinement, batched with static shapes.

    Frames whose weighted disturbance exceeds THRESHOLD_BAD_FRAMES form
    intervals; intervals of >= MIN_BAD_FRAMES_IN_INTERVAL consecutive bad
    frames are re-aligned by raw-signal cross-correlation (search
    +/- SE_PESQ_BAD_SEARCH samples; the default matches the ITU
    SEARCHBUFFER range of 75 decimated cells = 2400 samples at 16 kHz,
    1200 at 8 kHz) and re-scored
    through the same band -> gain -> loudness -> disturbance chain using
    the FIRST PASS's per-utterance frequency compensation and per-frame
    gain ratio (as the ITU code reuses its stored compensations); the
    realigned disturbances replace the originals when their interval sum
    is lower. Static-shape bounds the ITU code doesn't have: at most
    SE_PESQ_BAD_INTERVALS intervals per utterance (default 4, earliest
    first) and SE_PESQ_BAD_FRAMES re-scored frames per interval (default
    64 = 2.1 s, from the interval start).
    """
    K = int(os.environ.get("SE_PESQ_BAD_INTERVALS", "4"))
    n_frame, hop, M = C["n_frame"], C["hop"], frame_sym.shape[1]
    Lf = min(int(os.environ.get("SE_PESQ_BAD_FRAMES", "64")), M)
    # ITU search range: SEARCHBUFFER(75) * Downsample(32 @16k / 16 @8k)
    # samples = 75 * n_frame / 16 at both rates
    search = int(os.environ.get("SE_PESQ_BAD_SEARCH", str(75 * n_frame // 16)))
    Ws = (Lf - 1) * hop + n_frame  # window sample span

    bad = (frame_sym > THRESHOLD_BAD_FRAMES) & (fmask > 0)
    starts = bad & ~jnp.pad(bad[:, :-1], ((0, 0), (1, 0)))
    run_id = jnp.cumsum(starts, axis=1) * bad  # (B, M), 0 = not bad
    run_len = jax.vmap(
        lambda rid: jax.ops.segment_sum(
            jnp.ones((M,), jnp.float32), rid, num_segments=M + 1
        )
    )(run_id)
    qual = run_len >= MIN_BAD_FRAMES_IN_INTERVAL
    qual = qual.at[:, 0].set(False)
    qrank = jnp.cumsum(qual, axis=1) * qual  # (B, M+1): 1..Q over qualifying
    frame_rank = jnp.take_along_axis(qrank, run_id, axis=1)  # (B, M)

    ks = jnp.arange(1, K + 1)
    in_k = frame_rank[:, None, :] == ks[None, :, None]  # (B, K, M)
    tidx = jnp.arange(M)
    start_f = jnp.min(jnp.where(in_k, tidx[None, None], M), axis=-1)
    valid = start_f < M  # (B, K)
    f0 = jnp.clip(start_f, 0, max(M - Lf, 0))

    deg_pad = jnp.pad(deg, ((0, 0), (search, search)))
    fr_off = jnp.arange(Lf)[:, None] * hop + jnp.arange(n_frame)[None, :]
    dft_re = jnp.asarray(C["dft_re"])
    dft_im = jnp.asarray(C["dft_im"])
    G = jnp.asarray(C["group"])
    hi = _metric_precision()

    def one(ref_b, degp_b, f0_bk, B_ref_eq_b, L_ref_b, ratio_b, fw_b):
        s0 = f0_bk * hop
        ref_seg = jax.lax.dynamic_slice(ref_b, (s0,), (Ws,))
        deg_wide = jax.lax.dynamic_slice(degp_b, (s0,), (Ws + 2 * search,))
        # raw-signal cross-correlation over +/- search around the global
        # alignment (ITU compute_delay on the interval span), via FFT:
        # xc[d] = sum_w ref[w] * deg_wide[w + d], d in 0..2*search
        # (pow2 FFT — see _fix_power_level)
        nfft = 1 << (Ws + 2 * search - 1).bit_length()
        xc = jnp.fft.irfft(
            jnp.conj(jnp.fft.rfft(ref_seg, nfft)) * jnp.fft.rfft(deg_wide, nfft),
            nfft,
        )[: 2 * search + 1]
        d_star = jnp.argmax(xc, axis=-1)  # 0..2*search; shift = d_star-search
        deg_seg = jax.lax.dynamic_slice(deg_wide, (d_star,), (Ws,))

        fr = deg_seg[fr_off]  # (Lf, n_frame)
        re = jnp.einsum("ln,nk->lk", fr, dft_re,
                        preferred_element_type=jnp.float32, precision=hi)
        im = jnp.einsum("ln,nk->lk", fr, dft_im,
                        preferred_element_type=jnp.float32, precision=hi)
        P = (re * re + im * im) * g2
        Bd = jnp.einsum("lk,kj->lj", P, G,
                        preferred_element_type=jnp.float32, precision=hi)
        ratio_sl = jax.lax.dynamic_slice(ratio_b, (f0_bk,), (Lf,))
        Bd_eq = Bd * ratio_sl[:, None]
        L_deg_bad = _loudness(Bd_eq, p0, mzp, sl)
        L_ref_sl = jax.lax.dynamic_slice(L_ref_b, (f0_bk, 0), (Lf, L_ref_b.shape[1]))
        B_ref_sl = jax.lax.dynamic_slice(
            B_ref_eq_b, (f0_bk, 0), (Lf, B_ref_eq_b.shape[1])
        )
        fs_new, fa_new = _frame_disturbance(
            L_ref_sl, L_deg_bad, B_ref_sl, Bd_eq, w, W
        )
        fw_sl = jax.lax.dynamic_slice(fw_b, (f0_bk,), (Lf,))
        fs_new = jnp.minimum(fs_new / fw_sl, 45.0)
        fa_new = jnp.minimum(fa_new / fw_sl, 45.0)
        # place the window back on the global frame axis
        z = jnp.zeros((M,), jnp.float32)
        fs_full = jax.lax.dynamic_update_slice(z, fs_new, (f0_bk,))
        fa_full = jax.lax.dynamic_update_slice(z, fa_new, (f0_bk,))
        win_mask = jax.lax.dynamic_update_slice(
            z, jnp.ones((Lf,), jnp.float32), (f0_bk,)
        )
        return fs_full, fa_full, win_mask

    fs_k, fa_k, win_k = jax.vmap(  # over batch
        jax.vmap(one, in_axes=(None, None, 0, None, None, None, None))
    )(ref, deg_pad, f0, B_ref_eq, L_ref, ratio_s, fw)  # (B, K, M)

    # per-interval acceptance: replace the interval's frames only when the
    # re-aligned interval disturbance sum is lower (ITU acceptance rule);
    # restricted to interval ∩ recompute-window frames
    upd = in_k & (win_k > 0)  # (B, K, M)
    old_sum = jnp.sum(jnp.where(upd, frame_sym[:, None, :], 0.0), axis=-1)
    new_sum = jnp.sum(jnp.where(upd, fs_k, 0.0), axis=-1)
    accept = valid & (new_sum < old_sum)  # (B, K)
    take = upd & accept[..., None]  # disjoint across K (runs are disjoint)
    any_take = take.any(axis=1)
    fs_repl = jnp.sum(jnp.where(take, fs_k, 0.0), axis=1)
    fa_repl = jnp.sum(jnp.where(take, fa_k, 0.0), axis=1)
    frame_sym = jnp.where(any_take, fs_repl, frame_sym)
    frame_asym = jnp.where(any_take, fa_repl, frame_asym)
    return frame_sym, frame_asym


def pesq_batch(
    ref: jnp.ndarray,
    deg: jnp.ndarray,
    sample_rate: int = 16000,
    mode: str = "nb",
    lengths=None,
    align: bool = True,
    realign=None,
) -> jnp.ndarray:
    """Batched MOS-LQO, (B, T) x (B, T) -> (B,).

    align=True estimates one global delay per utterance (envelope
    cross-correlation coarse pass + sample-exact raw-signal fine pass;
    +/- 500 ms range) and shifts the degraded signal before scoring.
    realign=True additionally runs the P.862 bad-interval refinement
    (_bad_interval_realign): frames whose disturbance exceeds the
    bad-frame threshold are per-interval re-aligned and re-scored,
    absorbing mid-utterance delay changes. Default: the SE_PESQ_REALIGN
    env (off — this framework's own enhancement outputs are sample-
    aligned by construction, so the batched eval kernel skips the extra
    work; the host per-utterance API turns it on for external pairs)."""
    return pesq_batch_modes(
        ref, deg, sample_rate, (mode,), lengths, align, realign
    )[mode]


def pesq_batch_modes(
    ref: jnp.ndarray,
    deg: jnp.ndarray,
    sample_rate: int = 16000,
    modes=("nb", "wb"),
    lengths=None,
    align: bool = True,
    realign=None,
) -> dict:
    """MOS-LQO for several P.862 modes from ONE shared front-end.

    The delay search (a lax.while cross-correlation sweep XLA never CSEs
    across calls), the per-utterance shift, the level alignment and the
    framed FFT power spectra are all mode-independent — only the receive
    filter gain and the final MOS mapping differ between nb and wb. The
    round-5 eval_full trace showed the whole front-end duplicated when
    nb and wb were scored as separate pesq_batch calls; sharing it is
    bitwise-identical per mode and saves ~half the PESQ cost of the
    five-metric eval."""
    assert all(m in ("nb", "wb") for m in modes)
    fs = sample_rate
    C = _model_consts(fs)

    ref = ref.astype(jnp.float32)
    deg = deg.astype(jnp.float32)
    # mask BEFORE the alignment search: padding past `lengths` must not
    # feed the envelope cross-correlation (it could vote a spurious delay
    # that then shifts valid content)
    if lengths is not None:
        t_mask = jnp.arange(ref.shape[-1])[None, :] < lengths[:, None]
        ref = ref * t_mask
        deg = deg * t_mask
        frame_len_limit = (lengths - C["n_frame"]) // C["hop"] + 1
    else:
        frame_len_limit = None
    if align:
        delay = _align_delay(ref, deg, max_delay=fs // 2)
        # |delay| <= coarse (clamped to max_delay) + one fine cell (64)
        deg = _shift_back(deg, delay, max_abs=fs // 2 + 64)
        if lengths is not None:
            deg = deg * t_mask

    # level alignment on the raw (pre-filter) signals, as the ITU chain
    ref = _fix_power_level(ref, lengths, fs)
    deg = _fix_power_level(deg, lengths, fs)

    P_ref_raw = _frames_power(ref, C)
    P_deg_raw = _frames_power(deg, C)
    M = P_ref_raw.shape[1]
    if frame_len_limit is not None:
        fmask = (jnp.arange(M)[None, :] < frame_len_limit[:, None]).astype(
            jnp.float32
        )
    else:
        fmask = jnp.ones(P_ref_raw.shape[:2], jnp.float32)

    return {
        m: _pesq_mode_tail(
            C, m, ref, deg, P_ref_raw, P_deg_raw, fmask, realign
        )
        for m in modes
    }


def _pesq_mode_tail(C, mode, ref, deg, P_ref_raw, P_deg_raw, fmask,
                    realign):
    """Everything downstream of the shared front-end: receive-filter
    gain, bark grouping, compensations, loudness, disturbance, Lp
    aggregation and the per-mode MOS mapping."""
    hi = _metric_precision()

    # receive filtering in the power domain
    gain = C["irs_gain"] if mode == "nb" else C["wb_gain"]
    g2 = jnp.asarray(gain * gain)
    P_ref = P_ref_raw * g2
    P_deg = P_deg_raw * g2

    # bark grouping -> pitch power densities (100/nr correction and Sp
    # are baked into the grouping matrix)
    G = jnp.asarray(C["group"])
    B_ref = jnp.einsum("bmk,kj->bmj", P_ref, G,
                       preferred_element_type=jnp.float32, precision=hi)
    B_deg = jnp.einsum("bmk,kj->bmj", P_deg, G,
                       preferred_element_type=jnp.float32, precision=hi)

    p0 = jnp.asarray(C["p0"])

    # partial frequency compensation (applied to the reference, as in PESQ)
    num = ((B_deg * fmask[..., None]).sum(1)) + 1e3
    den = ((B_ref * fmask[..., None]).sum(1)) + 1e3
    band_factor = jnp.clip(num / den, 0.01, 100.0)[:, None, :]
    B_ref_eq = B_ref * band_factor

    # time-varying gain compensation (applied to the degraded signal):
    # audible power = threshold-gated band power, band 0 excluded
    aud_sel = jnp.asarray(
        (np.arange(C["nb"]) >= 1).astype(np.float32)
    )

    def audible(B):
        return ((B > p0) * B * aud_sel).sum(-1)

    aud_ref = audible(B_ref_eq)
    aud_deg = audible(B_deg)
    ratio = (aud_ref + 5e3) / (aud_deg + 5e3)

    # EMA s_t = 0.2 s_{t-1} + 0.8 r_t (frame 0 keeps its raw ratio) as an
    # ASSOCIATIVE scan: the linear recurrence composes as
    # (A2,B2)o(A1,B1) = (A1*A2, A2*B1 + B2), so the ~1000 sequential
    # lax.scan steps (tiny per-step body, pure loop overhead on TPU)
    # become a log-depth sweep. Same values up to fp reassociation.
    A = jnp.full_like(ratio, 0.2).at[:, 0].set(0.0)
    Bv = (0.8 * ratio).at[:, 0].set(ratio[:, 0])

    def _comb(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    _, ratio_s = jax.lax.associative_scan(_comb, (A, Bv), axis=1)
    ratio_s = jnp.clip(ratio_s, 3e-4, 5.0)
    B_deg_eq = B_deg * ratio_s[..., None]

    # modified Zwicker loudness (Sl scale, per-band exponent)
    mzp = jnp.asarray(C["mzp"])
    sl = C["sl"]
    L_ref = _loudness(B_ref_eq, p0, mzp, sl)
    L_deg = _loudness(B_deg_eq, p0, mzp, sl)

    # disturbance + pseudo-Lp bark aggregation (band 0 excluded via w)
    w = jnp.asarray(C["width"]) * aud_sel
    W = w.sum()
    frame_sym, frame_asym = _frame_disturbance(
        L_ref, L_deg, B_ref_eq, B_deg_eq, w, W
    )

    # frame weighting by the reference's audible power
    fw = ((aud_ref + 1e5) / 1e7) ** 0.04
    frame_sym = jnp.minimum(frame_sym / fw, 45.0) * fmask
    frame_asym = jnp.minimum(frame_asym / fw, 45.0) * fmask

    if realign is None:
        realign = os.environ.get("SE_PESQ_REALIGN", "0") == "1"
    if realign:
        frame_sym, frame_asym = _bad_interval_realign(
            C, ref, deg, g2, frame_sym, frame_asym, fmask,
            B_ref_eq, L_ref, ratio_s, fw, w, W, p0, mzp, sl,
        )
        frame_sym = frame_sym * fmask
        frame_asym = frame_asym * fmask

    # L6 over 320 ms sliding windows (20 frames at 50% overlap), L2 over time
    def agg(fd):
        win = 20
        Mv = fd.shape[1]
        S = max(Mv - win + 1, 1)
        idx = jnp.arange(0, S, max(win // 2, 1))
        seg = fd[:, idx[:, None] + jnp.arange(win)[None, :]]
        seg_mask = fmask[:, idx[:, None] + jnp.arange(win)[None, :]]
        cnt = jnp.maximum(seg_mask.sum(-1), 1.0)
        l6 = ((seg**6).sum(-1) / cnt) ** (1 / 6)
        # prefer fully-valid 320 ms windows (masking == truncation); fall
        # back to partially-valid ones only for very short utterances
        fully = (seg_mask.min(-1) > 0).astype(jnp.float32)
        partial = (seg_mask.sum(-1) > 0).astype(jnp.float32)
        has_fully = fully.sum(-1, keepdims=True) > 0
        seg_valid = jnp.where(has_fully, fully, partial)
        n_seg = jnp.maximum(seg_valid.sum(-1), 1.0)
        return jnp.sqrt(((l6**2) * seg_valid).sum(-1) / n_seg)

    D = agg(frame_sym)
    DA = agg(frame_asym)

    raw = 4.5 - 0.1 * D - 0.0309 * DA
    if mode == "nb":
        mos = 0.999 + 4.0 / (1.0 + jnp.exp(-1.4945 * raw + 4.6607))
    else:
        mos = 0.999 + 4.0 / (1.0 + jnp.exp(-1.3669 * raw + 3.8224))
    return mos
