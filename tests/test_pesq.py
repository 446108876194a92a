"""PESQ model sanity: range, ordering with SNR, masking invariance.

(The ITU binary is absent from this image; these tests pin the behavioral
invariants any P.862-faithful implementation must satisfy.)"""
import numpy as np

import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.metrics import pesq_nb_eval, pesq_wb_eval
from speech_enhancement_by_s3prl_tpu.metrics.pesq_jax import pesq_batch


def _speechlike(rng, n, fs=16000):
    t = np.arange(n) / fs
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)
    carrier = np.convolve(rng.standard_normal(n), np.ones(3) / 3, mode="same")
    return (env * carrier * 0.3).astype(np.float32)


def _voiced(rng, n, fs=16000):
    """Harmonic, formant-shaped, pause-bearing signal. The P.862 model's
    discrimination comes from noise exposed in spectral valleys and
    pauses; a flat-spectrum carrier masks additive noise almost fully
    (physically correct, but a weak probe)."""
    t = np.arange(n) / fs
    f0 = 120.0 * (1 + 0.08 * np.sin(2 * np.pi * 2.3 * t))
    phase = 2 * np.pi * np.cumsum(f0) / fs
    x = np.zeros(n)
    for h in range(1, 30):
        fh = h * 120.0
        amp = sum(
            np.exp(-0.5 * ((fh - fc) / bw) ** 2)
            for fc, bw in [(500, 80), (1500, 120), (2500, 200)]
        ) * (1.0 / h) ** 0.5
        x += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    env = (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)) * (
        np.sin(2 * np.pi * 1.1 * t) > -0.3
    )
    return (env * x / np.abs(x).max() * 0.3).astype(np.float32)


def _at_snr(x, noise, snr_db):
    scale = np.sqrt((x**2).sum() / (10 ** (snr_db / 10) * (noise**2).sum()))
    return x + scale * noise


def test_pesq_identical_is_high():
    rng = np.random.default_rng(0)
    x = np.stack([_speechlike(rng, 32000) for _ in range(2)])
    for mode in ("nb", "wb"):
        mos = np.asarray(pesq_batch(jnp.asarray(x), jnp.asarray(x), mode=mode))
        assert (mos > 4.0).all(), (mode, mos)
        assert (mos <= 5.0).all()


def test_pesq_decreases_with_noise():
    rng = np.random.default_rng(1)
    x = _voiced(rng, 48000)
    noise = rng.standard_normal(x.shape).astype(np.float32)
    scores = []
    for snr in (30.0, 10.0, 0.0, -10.0):
        y = _at_snr(x, noise, snr)
        scores.append(
            float(pesq_batch(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
        )
    assert scores[0] > scores[1] > scores[2] > scores[3], scores
    assert scores[0] > 3.5 and scores[3] < 2.0, scores
    assert all(1.0 <= s <= 5.0 for s in scores)


def test_pesq_level_invariance():
    """P.862 level-aligns both signals: a constant gain on the degraded
    signal must barely change the score."""
    rng = np.random.default_rng(2)
    x = _speechlike(rng, 32000)
    y = _at_snr(x, rng.standard_normal(x.shape).astype(np.float32), 15.0)
    a = float(pesq_batch(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
    b = float(pesq_batch(jnp.asarray(x)[None], jnp.asarray(y * 4.0)[None])[0])
    assert abs(a - b) < 0.1


def test_pesq_length_masking():
    rng = np.random.default_rng(3)
    x = _speechlike(rng, 24000)
    y = _at_snr(x, rng.standard_normal(x.shape).astype(np.float32), 10.0)
    full = float(pesq_batch(jnp.asarray(x)[None], jnp.asarray(y)[None])[0])
    xp = np.concatenate([x, np.zeros(8000, np.float32)])[None]
    yp = np.concatenate([y, np.zeros(8000, np.float32)])[None]
    masked = float(
        pesq_batch(jnp.asarray(xp), jnp.asarray(yp),
                   lengths=jnp.asarray([24000]))[0]
    )
    assert abs(masked - full) < 0.15


def test_pesq_8k_model():
    """The 42-band 8 kHz model path (256-pt frames, bins 1..128)."""
    rng = np.random.default_rng(6)
    x = _voiced(rng, 24000)[::2].copy()  # crude 8 kHz decimation
    noise = rng.standard_normal(x.shape).astype(np.float32)
    clean = float(
        pesq_batch(jnp.asarray(x)[None], jnp.asarray(x)[None],
                   sample_rate=8000, mode="nb", align=False)[0]
    )
    assert clean > 4.0
    y = _at_snr(x, noise, 5.0)
    noisy = float(
        pesq_batch(jnp.asarray(x)[None], jnp.asarray(y)[None],
                   sample_rate=8000, mode="nb", align=False)[0]
    )
    assert 1.0 <= noisy < clean - 1.0, (clean, noisy)


def test_pesq_analytic_fallback():
    """SE_PESQ_TABLES=analytic runs the same pipeline on the generated
    band model; scores stay in range and order."""
    from speech_enhancement_by_s3prl_tpu.metrics.pesq_jax import _model_consts

    rng = np.random.default_rng(7)
    x = _voiced(rng, 32000)
    y = _at_snr(x, rng.standard_normal(x.shape).astype(np.float32), 10.0)
    C = _model_consts(16000, "analytic")
    assert C["nb"] == 49 and C["group"].shape == (257, 49)

    # the env knob is re-read per call (not latched by the lru cache), so
    # flipping it mid-process switches band models — prime the default
    # model first to prove no stale-cache hit
    _model_consts(16000)
    import os

    os.environ["SE_PESQ_TABLES"] = "analytic"
    try:
        assert np.array_equal(_model_consts(16000)["group"], C["group"])
        clean = float(pesq_batch(jnp.asarray(x)[None], jnp.asarray(x)[None],
                                 align=False)[0])
        noisy = float(pesq_batch(jnp.asarray(x)[None], jnp.asarray(y)[None],
                                 align=False)[0])
    finally:
        del os.environ["SE_PESQ_TABLES"]
    assert clean > 4.0 and 1.0 <= noisy < clean


def test_reference_eval_api():
    rng = np.random.default_rng(4)
    tar = _speechlike(rng, 20000)
    src = _at_snr(tar, rng.standard_normal(tar.shape).astype(np.float32), 20.0)
    nb = pesq_nb_eval(src, tar)
    wb = pesq_wb_eval(src, tar)
    assert 1.0 <= nb <= 5.0 and 1.0 <= wb <= 5.0


def test_pesq_time_alignment():
    """P.862 aligns the pair before scoring: a bulk delay on the degraded
    signal must not crater the score (pesq_jax._align_delay estimates one
    global delay per utterance from envelope cross-correlation)."""
    from speech_enhancement_by_s3prl_tpu.metrics.pesq_jax import _align_delay

    rng = np.random.default_rng(5)
    x = _speechlike(rng, 48000)
    y = _at_snr(x, rng.standard_normal(x.shape).astype(np.float32), 25.0)
    shift = 1601  # ~100 ms, NOT a multiple of the 64-sample envelope cell
    y_late = np.zeros_like(y)
    y_late[shift:] = y[:-shift]

    ref = jnp.asarray(np.stack([x, x]))
    deg = jnp.asarray(np.stack([y, y_late]))
    d = np.asarray(_align_delay(ref, deg, max_delay=8000))
    # fine pass makes the bulk-delay estimate exact to the sample
    assert int(d[0]) == 0, d
    assert int(d[1]) == shift, d

    aligned = np.asarray(pesq_batch(ref, deg, mode="nb", align=True))
    raw = np.asarray(pesq_batch(ref, deg, mode="nb", align=False))
    # sample-aligned pair: the search is (near-)identity
    assert abs(aligned[0] - raw[0]) < 0.05
    # shifted pair: alignment recovers most of the un-shifted score,
    # the unaligned score craters
    assert aligned[1] > raw[1] + 0.5, (aligned, raw)
    assert abs(aligned[1] - aligned[0]) < 0.3, aligned


def test_pesq_alignment_short_utterance():
    """Utterances shorter than the +/-500 ms search range: the coarse
    lag table must clamp to the envelope length (regression — positive
    lag bins used to alias onto negative positions when the envelope FFT
    was smaller than the search range, returning garbage like +7849 for
    a true delay of -640 on a 0.2 s clip)."""
    from speech_enhancement_by_s3prl_tpu.metrics.pesq_jax import _align_delay

    rng = np.random.default_rng(11)
    T = 3200  # 0.2 s at 16 kHz < 2 * (fs // 2) search range
    x = rng.standard_normal(T).astype(np.float32) * 0.1
    x *= (np.sin(2 * np.pi * 8 * np.arange(T) / 16000) ** 2 + 0.1).astype(
        np.float32
    )
    for true in (-640, 0, 640):
        if true >= 0:
            y = np.concatenate([np.zeros(true, np.float32), x[: T - true]])
        else:
            y = np.concatenate([x[-true:], np.zeros(-true, np.float32)])
        d = int(_align_delay(jnp.asarray(x[None]), jnp.asarray(y[None]),
                             max_delay=8000)[0])
        assert d == true, (true, d)


def _burst_probe(rng, n=64000, fs=16000):
    """Realignment probe. P.862's bad-frame threshold (30 of a 45 clip)
    fires only on severe local distortion — misaligned SPEECH frames
    stay well under it (similar spectral envelopes; verified empirically
    up to 125 ms piecewise shifts). Loud broadband bursts against
    silence is the canonical trigger (dropout/delay-jump degradations).
    Layout: dense aperiodic bursts in the first 3/4 anchor the global
    envelope alignment at 0; two sparse bursts in the last 1/4 are the
    realignment subjects."""
    x = np.zeros(n, np.float32)
    anchor_end = n * 3 // 4
    pos = 0
    while pos < anchor_end - 2000:
        on = int(rng.uniform(0.08, 0.15) * fs)
        x[pos:pos + on] = rng.standard_normal(on) * 0.3
        pos += on + int(rng.uniform(0.03, 0.1) * fs)
    for pos in (anchor_end + 2500, anchor_end + 9000):
        x[pos:pos + 2400] = rng.standard_normal(2400) * 0.35
    return x, anchor_end


def test_pesq_bad_interval_realign_recovers_delay_jump():
    """P.862 bad-interval refinement (pesq_jax._bad_interval_realign):
    a mid-utterance delay jump defeats any single global alignment — the
    jumped region's frames score as bad intervals. realign=True
    re-aligns those intervals by raw-signal cross-correlation and
    re-scores them, recovering part of the lost MOS (partial by design:
    the ITU rule reuses the first pass's gain/frequency compensations
    and only accepts intervals whose disturbance drops)."""
    rng = np.random.default_rng(21)
    x, anchor_end = _burst_probe(rng)
    y = (x + 0.001 * rng.standard_normal(x.shape)).astype(np.float32)
    shift = 2000  # 125 ms jump, inside the ITU +/-2400-sample search
    y_pw = y.copy()
    y_pw[anchor_end + shift:] = y[anchor_end:-shift]

    ref = jnp.asarray(np.stack([x, x]))
    deg = jnp.asarray(np.stack([y, y_pw]))
    base = np.asarray(pesq_batch(ref, deg, mode="nb", realign=False))
    re_al = np.asarray(pesq_batch(ref, deg, mode="nb", realign=True))

    # aligned pair: refinement is acceptance-gated — identical score
    assert abs(re_al[0] - base[0]) < 0.05, (base, re_al)
    # delay-jumped pair: realignment recovers a material chunk of the
    # score the global-only alignment lost (measured +0.24 MOS)
    assert re_al[1] > base[1] + 0.15, (base, re_al)
    # and never overtakes the fully-aligned pair
    assert re_al[1] <= re_al[0] + 0.05, re_al


def test_pesq_realign_acceptance_never_hurts():
    """The ITU acceptance rule keeps a realigned interval only when its
    disturbance sum drops: across aligned AND misaligned pairs, realign
    must never materially lower MOS."""
    rng = np.random.default_rng(22)
    rows_ref, rows_deg = [], []
    for snr in (40.0, 15.0, 5.0):
        x = _voiced(rng, 32000)
        y = _at_snr(x, rng.standard_normal(x.shape).astype(np.float32), snr)
        rows_ref.append(x)
        rows_deg.append(y)
    ref = jnp.asarray(np.stack(rows_ref))
    deg = jnp.asarray(np.stack(rows_deg))
    base = np.asarray(pesq_batch(ref, deg, mode="nb", realign=False))
    re_al = np.asarray(pesq_batch(ref, deg, mode="nb", realign=True))
    assert (re_al >= base - 0.05).all(), (base, re_al)


def test_pesq_host_api_realigns_external_pairs():
    """pesq_mos_lqo (the reference evaluation.py calling convention)
    enables the bad-interval refinement for external pairs."""
    from speech_enhancement_by_s3prl_tpu.metrics.pesq import pesq_mos_lqo

    rng = np.random.default_rng(23)
    x = _voiced(rng, 32000)
    y = _at_snr(x, rng.standard_normal(x.shape).astype(np.float32), 25.0)
    half = len(y) // 2
    y_pw = y.copy()
    y_pw[half + 150:] = y[half:-150]
    mos = pesq_mos_lqo(x, y_pw, 16000, "nb")
    assert 1.0 <= mos <= 5.0
    base = float(
        pesq_batch(jnp.asarray(x)[None], jnp.asarray(y_pw)[None],
                   16000, "nb", realign=False)[0]
    )
    assert mos >= base - 0.05, (mos, base)
