"""Model-layer parity tests: the scan-based LSTM against torch.nn.LSTM with
identical weights, and the head contract (predicted, aux) shapes/semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from speech_enhancement_by_s3prl_tpu.models.heads import (
    LSTM,
    Linear,
    LinearResidual,
    Residual,
    build_head,
)
from speech_enhancement_by_s3prl_tpu.models.lstm import LSTMStack


def copy_lstm_params_to_torch(params, t_lstm, num_layers, bidirectional):
    sd = {}
    for layer in range(num_layers):
        for direction, tag in (("fwd", ""), ("bwd", "_reverse")):
            if direction == "bwd" and not bidirectional:
                continue
            p = params["params"][f"l{layer}_{direction}"] if f"l{layer}_{direction}" in params["params"] else params["params"][f"lstm"][f"l{layer}_{direction}"]
            sd[f"weight_ih_l{layer}{tag}"] = torch.tensor(np.asarray(p["w_ih"]))
            sd[f"weight_hh_l{layer}{tag}"] = torch.tensor(np.asarray(p["w_hh"]))
            sd[f"bias_ih_l{layer}{tag}"] = torch.tensor(np.asarray(p["b_ih"]))
            sd[f"bias_hh_l{layer}{tag}"] = torch.tensor(np.asarray(p["b_hh"]))
    t_lstm.load_state_dict(sd)


@pytest.mark.parametrize("bidirectional", [False, True])
@pytest.mark.parametrize("num_layers", [1, 2])
def test_lstm_stack_matches_torch(bidirectional, num_layers):
    B, T, D, H = 2, 17, 8, 12
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, D)).astype(np.float32)

    model = LSTMStack(H, num_layers=num_layers, bidirectional=bidirectional)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(model.apply(params, jnp.asarray(x)))

    t_lstm = torch.nn.LSTM(D, H, num_layers=num_layers, batch_first=True,
                           bidirectional=bidirectional)
    copy_lstm_params_to_torch(params, t_lstm, num_layers, bidirectional)
    with torch.no_grad():
        ref, _ = t_lstm(torch.tensor(x))
    np.testing.assert_allclose(ours, ref.numpy(), atol=2e-5)


def test_lstm_head_contract():
    """LSTM head: predicted == exp(log_predicted), aux carries log_predicted
    (/root/reference/model.py:57-60)."""
    B, T = 2, 9
    model = LSTM(input_size=201, output_size=201, hidden_size=16, num_layers=1)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((B, T, 201)),
                    dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)
    predicted, aux = model.apply(params, x)
    assert predicted.shape == (B, T, 201)
    np.testing.assert_allclose(
        np.asarray(predicted), np.exp(np.asarray(aux["log_predicted"])), rtol=1e-5
    )


def test_linear_residual_masks_noisy_spectrum():
    B, T, F = 2, 7, 201
    rng = np.random.default_rng(2)
    feats = jnp.asarray(rng.standard_normal((B, T, F)), dtype=jnp.float32)
    linears = jnp.asarray(rng.random((B, T, F)), dtype=jnp.float32)
    model = LinearResidual(cmvn=True)
    params = model.init(jax.random.PRNGKey(0), feats, linears)
    predicted, aux = model.apply(params, feats, linears)
    offset = np.asarray(aux["offset"])
    assert (offset >= 0).all() and (offset <= 1).all()  # sigmoid mask
    np.testing.assert_allclose(np.asarray(predicted), np.asarray(linears) * offset,
                               rtol=1e-5)


def test_residual_head_offset_aux():
    B, T, F = 1, 6, 201
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((B, T, 40)), dtype=jnp.float32)
    linears = jnp.asarray(rng.random((B, T, F)), dtype=jnp.float32)
    model = Residual(input_size=40, hidden_size=8, num_layers=1, cmvn=True)
    params = model.init(jax.random.PRNGKey(0), feats, linears)
    predicted, aux = model.apply(params, feats, linears)
    assert "offset" in aux and predicted.shape == (B, T, F)


def test_build_head_registry_filters_kwargs():
    """The CLI passes the whole args namespace as model config
    (/root/reference/run_downstream.py:208-210); unknown keys must be
    dropped, config keys applied."""
    m = build_head(
        "LSTM", input_size=201, output_size=201,
        hidden_size=256, num_layers=3, bidirectional=False, activation="ReLU",
        seed=1337, name="exp", n_jobs=12,  # stray args-namespace keys
    )
    assert isinstance(m, LSTM)
    assert m.hidden_size == 256 and m.num_layers == 3

    with pytest.raises(AssertionError):
        build_head("NoSuchModel", 1, 1)


def test_lstm_init_scheme():
    """xavier W_ih / orthogonal W_hh / zero biases
    (/root/reference/model.py:48-55)."""
    model = LSTMStack(32, num_layers=1)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 4, 16), jnp.float32)
    )["params"]["l0_fwd"]
    assert np.asarray(params["b_ih"]).sum() == 0
    assert np.asarray(params["b_hh"]).sum() == 0
    w_hh = np.asarray(params["w_hh"])  # (4H, H) tall: columns orthonormal
    np.testing.assert_allclose(w_hh.T @ w_hh, np.eye(32), atol=1e-4)
