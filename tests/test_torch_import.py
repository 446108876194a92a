"""Downstream torch-checkpoint importer parity: a torch LSTM head's state
dict (--dckpt warm-start format) must reproduce the torch forward pass
through our flax head."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from speech_enhancement_by_s3prl_tpu.models.heads import LSTM, Residual
from speech_enhancement_by_s3prl_tpu.models.torch_import import (
    convert_downstream_state,
    convert_lstm_state,
)


class TorchLSTMHead(tnn.Module):
    """The reference LSTM head shape (/root/reference/model.py:37-60)."""

    def __init__(self, input_size, hidden, layers, bidirectional, out):
        super().__init__()
        self.lstm = tnn.LSTM(input_size, hidden, num_layers=layers,
                             batch_first=True, bidirectional=bidirectional)
        self.scaling_layer = tnn.Sequential(
            tnn.Linear((2 if bidirectional else 1) * hidden, out), tnn.ReLU()
        )

    def forward(self, x):
        h, _ = self.lstm(x)
        log_predicted = self.scaling_layer(h)
        return log_predicted.exp(), log_predicted


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_head_import(bidirectional):
    torch.manual_seed(0)
    D, H, L, O = 12, 8, 2, 10
    t_head = TorchLSTMHead(D, H, L, bidirectional, O).eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 9, D)).astype(np.float32)
    with torch.no_grad():
        ref_pred, ref_log = t_head(torch.tensor(x))

    params = {"params": convert_downstream_state(t_head.state_dict(), "LSTM")}
    model = LSTM(input_size=D, output_size=O, hidden_size=H, num_layers=L,
                 bidirectional=bidirectional, activation="ReLU")
    pred, aux = model.apply(jax.tree.map(jnp.asarray, params), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(pred), ref_pred.numpy(), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(aux["log_predicted"]), ref_log.numpy(), atol=1e-5
    )


def test_convert_lstm_state_key_coverage():
    t = tnn.LSTM(6, 4, num_layers=2, batch_first=True, bidirectional=True)
    out = convert_lstm_state({f"lstm.{k}": v for k, v in t.state_dict().items()})
    assert set(out) == {"l0_fwd", "l0_bwd", "l1_fwd", "l1_bwd"}
    assert set(out["l0_fwd"]) == {"w_ih", "w_hh", "b_ih", "b_hh"}


@pytest.mark.parametrize("model_name", ["Linear", "LinearResidual"])
def test_linear_head_import(model_name):
    """Linear / LinearResidual --dckpt conversion parity
    (/root/reference/model.py:8-34: a single nn.Linear named 'linear')."""
    from speech_enhancement_by_s3prl_tpu.models.heads import (
        Linear as JLinear,
        LinearResidual,
    )

    torch.manual_seed(1)
    D, O = 10, 7
    t_lin = tnn.Linear(D, O)
    sd = {f"linear.{k}": v for k, v in t_lin.state_dict().items()}
    params = {"params": convert_downstream_state(sd, model_name)}

    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 5, D)).astype(np.float32)
    linears = np.abs(rng.standard_normal((2, 5, O)).astype(np.float32))
    with torch.no_grad():
        t_out = t_lin(torch.tensor(feats)).numpy()

    if model_name == "Linear":
        model = JLinear(input_size=D, output_size=O, activation="ReLU")
        pred, _ = model.apply(jax.tree.map(jnp.asarray, params),
                              jnp.asarray(feats))
        np.testing.assert_allclose(
            np.asarray(pred), np.maximum(t_out, 0.0), atol=1e-5
        )
    else:
        model = LinearResidual(input_size=D, output_size=O,
                               activation="Sigmoid", cmvn=False)
        pred, aux = model.apply(jax.tree.map(jnp.asarray, params),
                                jnp.asarray(feats), jnp.asarray(linears))
        sig = 1.0 / (1.0 + np.exp(-t_out))
        np.testing.assert_allclose(np.asarray(aux["offset"]), sig, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pred), linears * sig, atol=1e-5)


def test_convert_downstream_state_unknown_model():
    with pytest.raises(ValueError, match="no converter"):
        convert_downstream_state({}, "NotAHead")
