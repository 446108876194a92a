"""Gradient semantics of the LSTM execution modes.

- ``remat=True`` (SE_LSTM_REMAT) only changes WHAT is stored for the
  backward pass, not the math: grads must equal the non-remat grads
  exactly (same ops replayed).
- bf16-STORED input projections (SE_LSTM_XW_BF16, the inference/bench
  default and the measured +10% train-step configuration, docs/PERF.md)
  quantize the gate inputs; training grads must stay directionally
  faithful to f32 (cosine ~1) with small relative error.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.models.lstm import LSTMStack


def _setup(remat=False):
    model = LSTMStack(hidden_size=32, num_layers=2, bidirectional=True,
                      remat=remat)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 50, 16)), jnp.float32)
    tar = jnp.asarray(rng.standard_normal((4, 50, 64)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        return ((model.apply(p, x) - tar) ** 2).mean()

    return params, loss


def _flat(tree):
    return jnp.concatenate([l.ravel() for l in jax.tree.leaves(tree)])


def test_remat_grads_exact():
    params, loss = _setup(remat=False)
    g_plain = jax.grad(loss)(params)

    params_r, loss_r = _setup(remat=True)
    g_remat = jax.grad(loss_r)(params_r)

    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        g_plain, g_remat,
    )


def test_bf16_xw_grads_faithful(monkeypatch):
    params, loss = _setup()
    g_f32 = _flat(jax.grad(loss)(params))

    monkeypatch.setenv("SE_LSTM_XW_BF16", "1")
    params2, loss2 = _setup()
    g_bf16 = _flat(jax.grad(loss2)(params2))

    cos = float(
        (g_f32 @ g_bf16)
        / (jnp.linalg.norm(g_f32) * jnp.linalg.norm(g_bf16) + 1e-12)
    )
    rel = float(jnp.linalg.norm(g_f32 - g_bf16) / (jnp.linalg.norm(g_f32) + 1e-12))
    assert cos > 0.999, cos
    assert rel < 0.05, rel


def test_bf16_xw_forward_fidelity(monkeypatch):
    params, _ = _setup()
    model = LSTMStack(hidden_size=32, num_layers=2, bidirectional=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 50, 16)), jnp.float32)
    y_f32 = model.apply(params, x)
    monkeypatch.setenv("SE_LSTM_XW_BF16", "1")
    y_bf16 = model.apply(params, x)
    err = float(jnp.linalg.norm(y_f32 - y_bf16) / jnp.linalg.norm(y_f32))
    assert err < 5e-3, err
