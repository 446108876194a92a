"""BertAdam semantics and checkpoint lifecycle."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech_enhancement_by_s3prl_tpu.runner.checkpoint import (
    find_resume_ckpt,
    load_checkpoint,
    save_checkpoint,
)
from speech_enhancement_by_s3prl_tpu.runner.optim import (
    bert_adam,
    build_optimizer,
    warmup_linear_schedule,
)


def test_warmup_linear_schedule():
    s = warmup_linear_schedule(1.0, 0.1, 1000)
    np.testing.assert_allclose(float(s(0)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(s(50)), 0.5, atol=1e-6)   # mid warmup
    np.testing.assert_allclose(float(s(100)), 1.0, atol=1e-6)  # peak
    np.testing.assert_allclose(float(s(550)), 0.5, atol=1e-6)  # mid decay
    np.testing.assert_allclose(float(s(1000)), 0.0, atol=1e-6)


def test_bert_adam_no_bias_correction_with_decay_masking():
    """First-step update for BertAdam: m = (1-b1) g, v = (1-b2) g^2,
    u = m / (sqrt(v) + eps) + wd * p (decay NOT applied to bias), scaled by
    the warmup schedule — no bias correction anywhere."""
    params = {"dense": {"kernel": jnp.ones((2, 2)) * 0.5, "bias": jnp.ones(2)}}
    g = {"dense": {"kernel": jnp.full((2, 2), 0.1), "bias": jnp.full((2,), 0.1)}}
    lr, warm, total, wd, eps = 1.0, 0.5, 10, 0.01, 1e-6
    opt = bert_adam(lr, warm, total, weight_decay=wd, max_grad_norm=None,
                    eps=eps)
    state = opt.init(params)
    updates, _ = opt.update(g, state, params)

    m = 0.1 * 0.1  # (1 - b1) * g
    v = 0.001 * 0.1 * 0.1
    base = m / (np.sqrt(v) + eps)
    sched = (1 / 10) / 0.5  # step counts from 1 inside scale_by_schedule? see below
    # schedule is evaluated at the post-increment count (1): x = 1/10 -> 0.2 lr
    lr1 = 1.0 * (0.1 / 0.5)
    np.testing.assert_allclose(
        np.asarray(updates["dense"]["kernel"]),
        -(base + wd * 0.5) * lr1, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(updates["dense"]["bias"]), -base * lr1, rtol=1e-4
    )


def test_build_optimizer_names():
    assert build_optimizer("BertAdam", 1e-4) is not None
    assert build_optimizer("Adam", 1e-4) is not None
    with pytest.raises(ValueError):
        build_optimizer("SGD", 1e-4)


def test_checkpoint_payload_rotation_and_resume(tmp_path):
    params = {"w": jnp.ones((3,))}
    opt_state = {"mu": jnp.zeros((3,))}
    cfg = {"runner": {"total_step": 10}}
    args = {"seed": 1}

    for step in [2, 4, 6, 8]:
        save_checkpoint(str(tmp_path), step, params, opt_state, cfg, args,
                        max_keep=2)
    names = sorted(os.listdir(tmp_path))
    assert names == ["states-6.ckpt", "states-8.ckpt"]  # rotation kept 2

    # dir resume picks the newest
    assert find_resume_ckpt(str(tmp_path)).endswith("states-8.ckpt")
    payload = load_checkpoint(str(tmp_path))
    assert payload["Global_step"] == 8
    assert payload["Settings"]["Config"] == cfg
    assert payload["Settings"]["Paras"] == args
    np.testing.assert_array_equal(payload["Downstream"]["w"], np.ones(3))
