"""PESQ (ITU-T P.862) perceptual model in JAX — batched, on device.

The reference scores PESQ through the ITU reference C code (`pesq` wheel,
/root/reference/evaluation.py:12-26), one utterance per CPU process. That
binary is absent here, so this module implements the P.862 perceptual
model natively with the full published structure:

  level alignment -> receive filtering -> time-frequency decomposition
  (32 ms hann frames, 50% overlap) -> bark-band grouping -> partial
  frequency compensation -> time-varying gain compensation -> Zwicker-law
  loudness -> center-clipped disturbance with masking -> asymmetry
  weighting -> L2(bark) / L6(320 ms) / L2(time) aggregation -> raw PESQ ->
  MOS-LQO mapping (P.862.1 narrowband / P.862.2 wideband constants).

Deviations from the ITU implementation, stated plainly:
- bark band edges, band widths and hearing thresholds are generated
  analytically (Traunmüller bark warp + Terhardt threshold curve) instead
  of the ITU lookup tables;
- time alignment is a single global delay per utterance (envelope
  cross-correlation, the coarse half of the ITU search) rather than the
  full utterance-splitting + fine-alignment procedure; this framework's
  own enhancement pipeline is sample-aligned by construction (iSTFT with
  the noisy phase preserves timing), where the shift is the identity;
- the receive-side IRS filter is a smooth analytic approximation of the
  IRS-receive magnitude response.

Scores therefore track P.862 MOS-LQO closely in ordering and range but are
not certified-bit-exact; for ITU-conformant numbers run the ITU binary.
Unlike the reference's per-utterance CPU loop, this runs a whole padded
batch in one XLA program.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .stoi import metric_precision as _metric_precision
from .stoi import resample as _resample

SL = 3.71e-1  # loudness scaling (calibrated so 0 dB white noise ~ 1.5 MOS nb)
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


@functools.lru_cache(maxsize=4)
def _model_consts(fs: int):
    """Frame geometry + bark matrices for the P.862 model at fs."""
    if fs == 8000:
        n_frame, nb = 256, 42
    elif fs == 16000:
        n_frame, nb = 512, 49
    else:
        raise ValueError(f"PESQ model supports 8k/16k, got {fs}")
    hop = n_frame // 2
    n_bins = n_frame // 2 + 1
    freqs = np.linspace(0, fs / 2, n_bins)

    bark = _hz_to_bark(freqs)
    edges = np.linspace(bark[1], bark[-1], nb + 1)
    group = np.zeros((n_bins, nb), np.float32)
    idx = np.clip(np.searchsorted(edges, bark) - 1, 0, nb - 1)
    for k in range(1, n_bins):
        group[k, idx[k]] = 1.0
    counts = np.maximum(group.sum(axis=0), 1.0)
    pow_group = group / counts  # mean power per band

    centers_bark = 0.5 * (edges[:-1] + edges[1:])
    # invert bark warp for center freqs
    centers_hz = 1960.0 * (centers_bark + 0.53) / (26.28 - centers_bark)
    width_bark = np.diff(edges).astype(np.float32)

    thr_db = _terhardt_threshold_db(centers_hz / 1000.0)
    # intensity threshold per band (arbitrary internal scale, calibrated
    # through POWER normalization below)
    p0 = (10.0 ** (thr_db / 10.0)).astype(np.float32)

    window = np.hanning(n_frame + 1)[:n_frame].astype(np.float32)
    n = np.arange(n_frame)[:, None].astype(np.float64)
    k = np.arange(n_bins)[None, :].astype(np.float64)
    ang = 2 * math.pi * n * k / n_frame
    dft_re = (window[:, None] * np.cos(ang)).astype(np.float32)
    dft_im = (window[:, None] * -np.sin(ang)).astype(np.float32)

    # smooth IRS-receive-like bandpass (nb) magnitude response
    f_safe = np.maximum(freqs, 1.0)
    irs_db = (
        -18.0 * (np.log2(310.0 / f_safe).clip(min=0.0)) ** 2 / 2.0
        - 12.0 * (np.log2(f_safe / 3100.0).clip(min=0.0)) ** 2
    )
    irs_gain = (10.0 ** (irs_db / 20.0)).astype(np.float32)
    # wideband input filter: gentle highpass below 100 Hz
    wb_db = -24.0 * (np.log2(100.0 / f_safe).clip(min=0.0)) ** 2
    wb_gain = (10.0 ** (wb_db / 20.0)).astype(np.float32)

    band_freq_mask = ((freqs >= 350) & (freqs <= 3250)).astype(np.float32)
    return dict(
        n_frame=n_frame, hop=hop, n_bins=n_bins, nb=nb,
        pow_group=pow_group, width=width_bark, p0=p0,
        dft_re=dft_re, dft_im=dft_im,
        irs_gain=irs_gain, wb_gain=wb_gain, band_mask=band_freq_mask,
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


def _align_delay(ref: jnp.ndarray, deg: jnp.ndarray, max_delay: int):
    """Per-utterance delay estimate (samples), P.862-coarse-alignment
    style: cross-correlate 4 ms energy envelopes via FFT and take the
    argmax within +/- max_delay. Positive delay = deg lags ref."""
    dec = 64  # 4 ms at 16 kHz
    T = ref.shape[-1]
    n = (T // dec) * dec
    er = jnp.abs(ref[:, :n]).reshape(ref.shape[0], -1, dec).sum(-1)
    ed = jnp.abs(deg[:, :n]).reshape(deg.shape[0], -1, dec).sum(-1)
    er = er - er.mean(-1, keepdims=True)
    ed = ed - ed.mean(-1, keepdims=True)
    L = er.shape[-1]
    nfft = 1 << (2 * L - 1).bit_length()
    X = jnp.fft.rfft(er, nfft)
    Y = jnp.fft.rfft(ed, nfft)
    xc = jnp.fft.irfft(jnp.conj(X) * Y, nfft)  # xc[d] = sum er[t] ed[t+d... ]
    md = max(max_delay // dec, 1)
    # lags -md..md: negative lags live at nfft-|d|
    lags = jnp.concatenate([jnp.arange(0, md + 1), jnp.arange(nfft - md, nfft)])
    vals = xc[:, lags]
    best = jnp.argmax(vals, axis=-1)
    lag = jnp.where(best <= md, best, best - (2 * md + 1))
    return lag * dec


def _shift_back(x: jnp.ndarray, delay: jnp.ndarray):
    """x[i, t] -> x[i, t + delay_i] (zero-padded): undo a per-utterance
    lag so deg lines up with ref."""
    T = x.shape[-1]
    idx = jnp.arange(T)[None, :] + delay[:, None]
    valid = (idx >= 0) & (idx < T)
    return jnp.take_along_axis(x, jnp.clip(idx, 0, T - 1), axis=-1) * valid


def pesq_batch(
    ref: jnp.ndarray,
    deg: jnp.ndarray,
    sample_rate: int = 16000,
    mode: str = "nb",
    lengths=None,
    align: bool = True,
) -> jnp.ndarray:
    """Batched MOS-LQO, (B, T) x (B, T) -> (B,).

    align=True estimates one global delay per utterance (envelope
    cross-correlation, the coarse half of P.862's alignment search;
    +/- 500 ms range) and shifts the degraded signal before scoring.
    This framework's own enhancement outputs are sample-aligned by
    construction (delay 0, shift is the identity) — the search matters
    when scoring externally produced audio pairs."""
    assert mode in ("nb", "wb")
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
        deg = _shift_back(deg, delay)
        if lengths is not None:
            deg = deg * t_mask

    P_ref = _frames_power(ref, C)
    P_deg = _frames_power(deg, C)
    M = P_ref.shape[1]
    if frame_len_limit is not None:
        fmask = (jnp.arange(M)[None, :] < frame_len_limit[:, None]).astype(
            jnp.float32
        )
    else:
        fmask = jnp.ones(P_ref.shape[:2], jnp.float32)

    # receive filtering in the power domain
    gain = C["irs_gain"] if mode == "nb" else C["wb_gain"]
    g2 = jnp.asarray(gain * gain)
    P_ref = P_ref * g2
    P_deg = P_deg * g2

    # level alignment: mean band power (350-3250 Hz) over ACTIVE frames
    # (frames within 20 dB of the loudest, the P.862 speech-active notion)
    # scaled to 1e7
    bm = jnp.asarray(C["band_mask"])

    def align(P):
        band_p = (P * bm).sum(-1)  # (B, M)
        peak = band_p.max(axis=-1, keepdims=True)
        active = ((band_p > 0.01 * peak) & (fmask > 0)).astype(P.dtype)
        mean_p = (band_p * active).sum(-1) / jnp.maximum(
            active.sum(-1) * bm.sum(), 1.0
        )
        return P * (1e7 / jnp.maximum(mean_p, 1e-6))[:, None, None]

    P_ref = align(P_ref)
    P_deg = align(P_deg)

    # bark grouping
    G = jnp.asarray(C["pow_group"])
    hi = _metric_precision()
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

    # time-varying gain compensation (applied to the degraded signal)
    tot_ref = (B_ref_eq * fmask[..., None]).sum(-1) + 5e3
    tot_deg = (B_deg * fmask[..., None]).sum(-1) + 5e3
    ratio = jnp.clip(tot_ref / tot_deg, 3e-4, 5.0)

    def smooth(carry, r):
        s = 0.8 * carry + 0.2 * r
        return s, s

    _, ratio_s = jax.lax.scan(smooth, jnp.ones(ratio.shape[0]), ratio.T)
    B_deg_eq = B_deg * ratio_s.T[..., None]

    # Zwicker loudness
    def loud(Bp):
        r = (0.5 + 0.5 * Bp / p0) ** ZWICKER - 1.0
        return SL * (p0 / 0.5) ** ZWICKER * jnp.maximum(r, 0.0)

    L_ref = loud(B_ref_eq)
    L_deg = loud(B_deg_eq)

    # disturbance with masking deadzone
    d = L_deg - L_ref
    m = 0.25 * jnp.minimum(L_deg, L_ref)
    d_sym = jnp.sign(d) * jnp.maximum(jnp.abs(d) - m, 0.0)

    asym = ((B_deg_eq + 50.0) / (B_ref_eq + 50.0)) ** 1.2
    asym = jnp.where(asym < 3.0, 0.0, jnp.minimum(asym, 12.0))
    d_asym = d_sym * asym

    # aggregate: weighted L2 over bark
    w = jnp.asarray(C["width"] / C["width"].sum())
    frame_sym = jnp.sqrt(((d_sym**2) * w).sum(-1) * C["nb"])
    frame_asym = ((jnp.abs(d_asym)) * w).sum(-1) * C["nb"] / 2.0

    # frame weighting by audible power
    fw = ((tot_deg + 1e5) / 1e7) ** 0.04
    frame_sym = jnp.minimum(frame_sym / fw, 45.0) * fmask
    frame_asym = jnp.minimum(frame_asym / fw, 45.0) * fmask

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
