"""Independent scalar transcription of the P.862 pipeline.

`_pesq_scalar` below re-implements the perceptual model of
metrics/pesq_jax.py for ONE utterance in plain loop-style numpy, written
from the documented pipeline (level alignment -> receive filter ->
frames -> bark grouping with the published tables -> partial frequency
compensation -> time-varying gain with 0.2/0.8 smoothing -> modified
Zwicker loudness -> masked disturbance -> asymmetry -> pseudo-Lp /
L6(320 ms) / L2(time) aggregation -> MOS map). It shares only the
constant tables (`_model_consts` — data, not logic); every pipeline step
is computed differently (python loops, no masking arithmetic), so
agreement exercises the batched/vmapped/masked JAX code paths the same
way tests/test_stoi_reference.py guards the STOI kernel.
"""
import math

import jax.numpy as jnp
import numpy as np

from speech_enhancement_by_s3prl_tpu.metrics.pesq_jax import (
    ZWICKER,
    _model_consts,
    pesq_batch,
)


def _pesq_scalar(ref, deg, fs=16000, mode="nb"):
    C = _model_consts(fs)
    n_frame, hop, nb = C["n_frame"], C["hop"], C["nb"]
    n_frames = max((len(ref) - n_frame) // hop + 1, 1)

    def fix_level(x):
        nfft = 1 << (max(len(x), 2) - 1).bit_length()
        X = np.fft.rfft(np.asarray(x, np.float64), n=nfft)
        freqs = np.fft.rfftfreq(nfft, 1.0 / fs)
        band = (freqs >= 350.0) & (freqs <= 3250.0)
        energy = 2.0 * (np.abs(X[band]) ** 2).sum() / nfft
        power = energy / len(x)
        return x * math.sqrt(1e7 / max(power, 1e-12))

    ref = fix_level(np.asarray(ref, np.float64))
    deg = fix_level(np.asarray(deg, np.float64))

    def frame_powers(x):
        out = np.empty((n_frames, C["n_bins"]))
        for m in range(n_frames):
            fr = x[m * hop: m * hop + n_frame]
            re = fr @ C["dft_re"]
            im = fr @ C["dft_im"]
            out[m] = re * re + im * im
        return out

    P_ref = frame_powers(ref)
    P_deg = frame_powers(deg)

    gain = C["irs_gain"] if mode == "nb" else C["wb_gain"]
    P_ref = P_ref * (gain.astype(np.float64) ** 2)
    P_deg = P_deg * (gain.astype(np.float64) ** 2)

    G = C["group"].astype(np.float64)
    B_ref = P_ref @ G
    B_deg = P_deg @ G

    # partial frequency compensation on the reference
    B_ref_eq = np.empty_like(B_ref)
    for j in range(nb):
        factor = (B_deg[:, j].sum() + 1e3) / (B_ref[:, j].sum() + 1e3)
        factor = min(max(factor, 0.01), 100.0)
        B_ref_eq[:, j] = B_ref[:, j] * factor

    p0 = C["p0"].astype(np.float64)

    def audible(row):
        total = 0.0
        for j in range(1, nb):
            if row[j] > p0[j]:
                total += row[j]
        return total

    # time-varying gain compensation on the degraded signal
    B_deg_eq = np.empty_like(B_deg)
    aud_ref = np.empty(n_frames)
    s = None
    for m in range(n_frames):
        aud_ref[m] = audible(B_ref_eq[m])
        r = (aud_ref[m] + 5e3) / (audible(B_deg[m]) + 5e3)
        s = r if s is None else 0.2 * s + 0.8 * r
        sc = min(max(s, 3e-4), 5.0)
        B_deg_eq[m] = B_deg[m] * sc

    mzp = C["mzp"].astype(np.float64)
    sl = C["sl"]

    def loud(row):
        out = np.empty(nb)
        for j in range(nb):
            r = (0.5 + 0.5 * row[j] / p0[j]) ** mzp[j] - 1.0
            out[j] = sl * (p0[j] / 0.5) ** mzp[j] * max(r, 0.0)
        return out

    w = C["width"].astype(np.float64)
    W = w[1:].sum()
    frame_sym = np.empty(n_frames)
    frame_asym = np.empty(n_frames)
    for m in range(n_frames):
        L_ref = loud(B_ref_eq[m])
        L_deg = loud(B_deg_eq[m])
        sym2 = 0.0
        asym1 = 0.0
        for j in range(1, nb):  # band 0 excluded from the Lp norms
            d = L_deg[j] - L_ref[j]
            dead = 0.25 * min(L_deg[j], L_ref[j])
            ds = math.copysign(max(abs(d) - dead, 0.0), d)
            a = ((B_deg_eq[m, j] + 50.0) / (B_ref_eq[m, j] + 50.0)) ** 1.2
            a = 0.0 if a < 3.0 else min(a, 12.0)
            sym2 += (ds * w[j]) ** 2
            asym1 += abs(ds * a) * w[j]
        fw = ((aud_ref[m] + 1e5) / 1e7) ** 0.04
        frame_sym[m] = min(math.sqrt(W * sym2) / fw, 45.0)
        frame_asym[m] = min(asym1 / fw, 45.0)

    def agg(fd):
        win = 20
        starts = list(range(0, max(n_frames - win + 1, 1), win // 2))
        l6 = []
        for st in starts:
            seg = fd[st: st + win]
            l6.append((np.sum(seg ** 6) / win) ** (1 / 6))
        return math.sqrt(sum(x * x for x in l6) / len(l6))

    D, DA = agg(frame_sym), agg(frame_asym)
    raw = 4.5 - 0.1 * D - 0.0309 * DA
    if mode == "nb":
        return 0.999 + 4.0 / (1.0 + math.exp(-1.4945 * raw + 4.6607))
    return 0.999 + 4.0 / (1.0 + math.exp(-1.3669 * raw + 3.8224))


def _speechlike(rng, n, fs=16000):
    t = np.arange(n) / fs
    env = (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)) * (
        np.sin(2 * np.pi * 1.1 * t) > -0.3
    )
    carrier = np.convolve(rng.standard_normal(n), np.ones(3) / 3, mode="same")
    return (env * carrier * 0.3).astype(np.float32)


def test_pesq_batched_matches_scalar_transcription():
    rng = np.random.default_rng(11)
    for snr, mode in [(25.0, "nb"), (5.0, "nb"), (15.0, "wb")]:
        x = _speechlike(rng, 32000)
        noise = rng.standard_normal(x.shape).astype(np.float32)
        noise *= np.sqrt((x ** 2).sum() / (10 ** (snr / 10) * (noise ** 2).sum()))
        y = x + noise
        got = float(
            pesq_batch(jnp.asarray(x)[None], jnp.asarray(y)[None],
                       16000, mode=mode, align=False)[0]
        )
        want = _pesq_scalar(x, y, 16000, mode)
        assert abs(got - want) < 0.02, (mode, snr, got, want)


def test_pesq_length_masking_matches_scalar_on_trimmed():
    """Masked scoring of a padded batch == scalar pipeline on the trimmed
    signal (the `lengths` machinery must equal truncation)."""
    rng = np.random.default_rng(12)
    n = 24000
    x = _speechlike(rng, n)
    y = x + 0.05 * rng.standard_normal(n).astype(np.float32)
    xp = np.concatenate([x, np.zeros(8000, np.float32)])
    yp = np.concatenate([y, 0.3 * rng.standard_normal(8000).astype(np.float32)])
    got = float(
        pesq_batch(jnp.asarray(xp)[None], jnp.asarray(yp)[None],
                   16000, mode="nb", lengths=jnp.asarray([n]),
                   align=False)[0]
    )
    want = _pesq_scalar(x, y, 16000, "nb")
    assert abs(got - want) < 0.05, (got, want)
