"""Perceptual objectives: stoi/estoi losses and PMSQE."""
import numpy as np

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.objectives import build_objective
from speech_enhancement_by_s3prl_tpu.objectives.pmsqe import PMSQE, bark_matrix


def _speechlike(rng, n, fs=16000):
    t = np.arange(n) / fs
    env = 0.6 + 0.4 * np.sin(2 * np.pi * 3 * t)
    carrier = np.convolve(rng.standard_normal(n), np.ones(3) / 3, mode="same")
    return (env * carrier * 0.3).astype(np.float32)


def test_stoi_loss_orders_degradation():
    """-STOI(clean, enhanced): cleaner prediction -> lower loss."""
    rng = np.random.default_rng(0)
    tar = np.stack([_speechlike(rng, 24000) for _ in range(2)])
    good = tar + 0.05 * rng.standard_normal(tar.shape).astype(np.float32)
    bad = tar + 0.8 * rng.standard_normal(tar.shape).astype(np.float32)
    masks = np.ones_like(tar)

    obj = build_objective("stoi")
    loss_good, _ = obj(wav_predicted=jnp.asarray(good), wav_tar=jnp.asarray(tar),
                       length_masks=jnp.asarray(masks))
    loss_bad, _ = obj(wav_predicted=jnp.asarray(bad), wav_tar=jnp.asarray(tar),
                      length_masks=jnp.asarray(masks))
    assert float(loss_good) < float(loss_bad)
    assert float(loss_good) < -0.9  # near-perfect -> loss ~ -1

    eobj = build_objective("estoi")
    eloss, _ = eobj(wav_predicted=jnp.asarray(good), wav_tar=jnp.asarray(tar),
                    length_masks=jnp.asarray(masks))
    assert float(eloss) < -0.7


def test_stoi_loss_differentiable():
    rng = np.random.default_rng(1)
    tar = jnp.asarray(np.stack([_speechlike(rng, 16000)]))
    masks = jnp.ones_like(tar)
    obj = build_objective("stoi")

    def f(pred):
        loss, _ = obj(wav_predicted=pred, wav_tar=tar, length_masks=masks)
        return loss

    g = jax.grad(f)(tar + 0.1)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_pmsqe_zero_for_identical_and_orders_noise():
    rng = np.random.default_rng(2)
    B, T, F = 2, 60, 201
    ref = jnp.asarray(rng.random((B, T, F)).astype(np.float32) * 1e4 + 1.0)
    masks = jnp.ones((B, T), jnp.float32)
    fn = PMSQE()
    same = float(fn(ref, ref, masks))
    # sub-masking-threshold distortion is inaudible by design: a 10%
    # deviation stays below d = max(diff - 0.25*min(L), 0) and scores ~same
    tiny = float(fn(ref * jnp.asarray(1 + 0.1 * rng.random((B, T, F)),
                                      jnp.float32), ref, masks))
    mid = float(fn(ref * jnp.asarray(1 + 1.0 * rng.random((B, T, F)),
                                     jnp.float32), ref, masks))
    big = float(fn(ref * jnp.asarray(1 + 4.0 * rng.random((B, T, F)),
                                     jnp.float32), ref, masks))
    assert same <= tiny <= mid < big
    assert same < 0.05


def test_pmsqe_objective_contract():
    rng = np.random.default_rng(3)
    B, T, F = 2, 40, 201
    ctx = dict(
        predicted=jnp.asarray(rng.random((B, T, F)), jnp.float32),
        linear_tar=jnp.asarray(rng.random((B, T, F)), jnp.float32),
        stft_length_masks=jnp.ones((B, T), jnp.float32),
    )
    obj = build_objective("pmsqe")
    loss, aux = obj(**ctx)
    assert np.isfinite(float(loss))

    g = jax.grad(lambda p: obj(predicted=p, linear_tar=ctx["linear_tar"],
                               stft_length_masks=ctx["stft_length_masks"])[0])(
        ctx["predicted"]
    )
    assert np.isfinite(np.asarray(g)).all()


def test_bark_matrix_partitions_bins():
    m = np.asarray(bark_matrix(201, 16000))
    assert m.shape == (201, 49)
    # every bin beyond DC lands in exactly one band (averaging weights)
    binary = (m > 0).sum(axis=1)
    assert (binary[1:] == 1).all()


def test_pmsqe_scale_pinned():
    """Regression pin of the loss SCALE on a fixed input: pmsqe has no
    external truth available (the reference's asteroid call was itself
    inconsistent, docs/PARITY_NOTES.md), so the effective learning rate of
    --objective pmsqe is protected by freezing this constant — an O(1)
    value comparable to the reference's typical PMSQE magnitudes."""
    rng = np.random.default_rng(42)
    B, T, F = 2, 50, 201
    tar = (rng.standard_normal((B, T, F)) ** 2).astype(np.float32)
    src = tar * (0.5 + 0.25 * rng.standard_normal((B, T, F)).astype(np.float32)) ** 2
    masks = np.ones((B, T), np.float32)
    masks[1, 40:] = 0
    obj = build_objective("pmsqe")
    loss, _ = obj(
        predicted=jnp.asarray(src),
        linear_tar=jnp.asarray(tar),
        stft_length_masks=jnp.asarray(masks),
    )
    np.testing.assert_allclose(float(loss), 0.54332, rtol=1e-3)
