"""Objective parity tests: each loss against an independent torch/numpy
implementation of the documented reference math (/root/reference/objective.py)."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch

from speech_enhancement_by_s3prl_tpu.objectives import (
    L1,
    SISDR,
    WSD,
    build_objective,
    sisdr,
)

B, T, F = 3, 20, 201
rng = np.random.default_rng(0)
predicted_np = rng.random((B, T, F)).astype(np.float32) + 0.01
log_predicted_np = np.log(predicted_np)
linear_tar_np = rng.random((B, T, F)).astype(np.float32) + 0.01
linear_inp_np = linear_tar_np + rng.random((B, T, F)).astype(np.float32) * 0.3
mask_np = np.zeros((B, T), np.float32)
for i, L_ in enumerate([20, 15, 9]):
    mask_np[i, :L_] = 1

ctx = dict(
    predicted=jnp.asarray(predicted_np),
    log_predicted=jnp.asarray(log_predicted_np),
    linear_tar=jnp.asarray(linear_tar_np),
    linear_inp=jnp.asarray(linear_inp_np),
    stft_length_masks=jnp.asarray(mask_np),
)


def test_l1_matches_masked_select_semantics():
    """L1 = mean |log_pred - log(tar+eps)| over valid frames only
    (masked_select semantics, /root/reference/objective.py:109-117)."""
    eps = 1e-10
    loss, _ = L1(eps=eps)(**ctx)
    sel = mask_np.astype(bool)
    expect = np.abs(
        log_predicted_np[sel] - np.log(linear_tar_np[sel] + eps)
    ).mean()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-5)


def test_SISDR_matches_reference_math():
    """Hand-rolled SI-SDR on sqrt spectra (/root/reference/objective.py:86-100)."""
    eps = 1e-10
    loss, _ = SISDR(eps=eps)(**ctx)

    src = np.sqrt(np.maximum(predicted_np, 0)) * mask_np[..., None]
    tar = np.sqrt(np.maximum(linear_tar_np, 0)) * mask_np[..., None]
    src, tar = src.reshape(B, -1), tar.reshape(B, -1)
    alpha = (src * tar).sum(1) / ((tar * tar).sum(1) + eps)
    ay = alpha[:, None] * tar
    norm = ((ay - src) ** 2).sum(1) + eps
    expect = (-10 * np.log10((ay * ay).sum(1) / norm + eps)).mean()
    np.testing.assert_allclose(float(loss), expect, rtol=1e-4)


def test_sisdr_scale_invariance():
    """asteroid-style SI-SDR: scaling the prediction must not change the
    loss (scale invariance), and a perfect match gives very negative loss."""
    loss1, _ = sisdr()(**ctx)
    ctx2 = dict(ctx)
    ctx2["predicted"] = ctx["predicted"] * 3.7
    loss2, _ = sisdr()(**ctx2)
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-3)

    perfect = dict(ctx)
    perfect["predicted"] = ctx["linear_tar"]
    loss3, _ = sisdr()(**perfect)
    assert float(loss3) < -50  # near-perfect reconstruction


def test_wsd_terms():
    """WSD = alpha * speech-distortion + (1-alpha) * noise-leakage with an
    energy-dB VAD gate (/root/reference/objective.py:127-141)."""
    offset_np = rng.random((B, T, F)).astype(np.float32)
    alpha, db_interval, eps = 0.3, 50.0, 1e-10
    loss, aux = WSD(alpha=alpha, db_interval=db_interval)(
        offset=jnp.asarray(offset_np), **ctx
    )
    assert "logger" in aux

    S, G = linear_tar_np, offset_np
    N = np.maximum(linear_inp_np - linear_tar_np, 0)
    energy = S.sum(-1, keepdims=True)
    thres = 10 * np.log10(energy.max() + eps) - db_interval
    vm = (10 * np.log10(energy + eps) > thres).astype(np.float32)
    m = mask_np[..., None]
    sp = (((S - G * S) * vm * m) ** 2).sum((-1, -2)).mean()
    nl = ((G * N * m) ** 2).sum((-1, -2)).mean()
    np.testing.assert_allclose(float(loss), alpha * sp + (1 - alpha) * nl, rtol=1e-4)


def test_registry_and_config_filtering():
    obj = build_objective("L1", log=True)  # vcb.yaml passes a stray 'log' key
    assert isinstance(obj, L1)
    obj = build_objective("WSD", db_interval=50, alpha=0.3)
    assert obj.alpha == 0.3
    with pytest.raises(AssertionError):
        build_objective("nope")


def test_losses_are_differentiable():
    import jax

    def f(pred):
        c = dict(ctx)
        c["predicted"] = pred
        c["log_predicted"] = jnp.log(pred)
        loss, _ = SISDR()(**c)
        return loss

    g = jax.grad(f)(ctx["predicted"])
    assert np.isfinite(np.asarray(g)).all()
