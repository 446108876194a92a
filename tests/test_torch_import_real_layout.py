"""Importer vs the REAL S3PRL checkpoint layout, reconstructed byte-exactly.

No real TERA ``states-*.ckpt`` exists in this image (env-gated since
round 2), so this fixture models the save format of the legacy S3PRL
TRANSFORMER pretraining runner as far as public sources pin it down
(/root/reference/run_downstream.py:181, /root/reference/model.py:97-101):

- top-level payload keys ``Transformer`` / ``SpecHead`` / ``Optimizer`` /
  ``Global_step`` / ``Settings``, with ``Settings = {'Config': <yaml
  dict>, 'Paras': <argparse.Namespace>}`` (the Namespace forces
  ``weights_only=False`` torch loads, like the reference's);
- TF-style ``TransformerLayerNorm`` parameters named ``gamma``/``beta``
  (the earliest pytorch-pretrained-BERT vocabulary the Mockingjay/TERA
  lineage copied) — NOT modern ``nn.LayerNorm``'s ``weight``/``bias``;
- optionally a uniform ``module.`` prefix (``torch.nn.DataParallel``
  save path).

A fixture failure here means the importer would reject a real ckpt for
layout reasons; forward parity is asserted against a torch encoder whose
layernorm *is* the TF-style gamma/beta module.
"""
import argparse
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from speech_enhancement_by_s3prl_tpu.models.torch_import import (  # noqa: E402
    convert_spechead_state,
    convert_transformer_state,
    load_s3prl_checkpoint,
)
from speech_enhancement_by_s3prl_tpu.models.transformer import (  # noqa: E402
    TransformerEncoder,
    sinusoidal_position_encoding,
)

HIDDEN, LAYERS, HEADS, INTER = 32, 2, 2, 48
INPUT_DIM, TARGET_DIM = 24, 24


class TFStyleLayerNorm(tnn.Module):
    """The Mockingjay/TERA ``TransformerLayerNorm``: gamma/beta params,
    epsilon inside the square root."""

    def __init__(self, hidden_size, eps=1e-12):
        super().__init__()
        self.gamma = tnn.Parameter(torch.ones(hidden_size))
        self.beta = tnn.Parameter(torch.zeros(hidden_size))
        self.variance_epsilon = eps

    def forward(self, x):
        u = x.mean(-1, keepdim=True)
        s = (x - u).pow(2).mean(-1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.variance_epsilon)
        return self.gamma * x + self.beta


class LegacyEncoder(tnn.Module):
    """S3PRL-layout encoder with the legacy gamma/beta layernorms."""

    class Layer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attention = tnn.ModuleDict({
                "self": tnn.ModuleDict({
                    "query": tnn.Linear(HIDDEN, HIDDEN),
                    "key": tnn.Linear(HIDDEN, HIDDEN),
                    "value": tnn.Linear(HIDDEN, HIDDEN),
                }),
                "output": tnn.ModuleDict({
                    "dense": tnn.Linear(HIDDEN, HIDDEN),
                    "LayerNorm": TFStyleLayerNorm(HIDDEN),
                }),
            })
            self.intermediate = tnn.ModuleDict(
                {"dense": tnn.Linear(HIDDEN, INTER)})
            self.output = tnn.ModuleDict({
                "dense": tnn.Linear(INTER, HIDDEN),
                "LayerNorm": TFStyleLayerNorm(HIDDEN),
            })

        def forward(self, h):
            B, T, _ = h.shape
            hd = HIDDEN // HEADS
            q = self.attention["self"]["query"](h).view(B, T, HEADS, hd)
            k = self.attention["self"]["key"](h).view(B, T, HEADS, hd)
            v = self.attention["self"]["value"](h).view(B, T, HEADS, hd)
            logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            probs = torch.softmax(logits, dim=-1)
            ctx = torch.einsum(
                "bhqk,bkhd->bqhd", probs, v).reshape(B, T, HIDDEN)
            h = self.attention["output"]["LayerNorm"](
                h + self.attention["output"]["dense"](ctx))
            inter = torch.nn.functional.gelu(self.intermediate["dense"](h))
            return self.output["LayerNorm"](h + self.output["dense"](inter))

    def __init__(self):
        super().__init__()
        self.input_representations = tnn.ModuleDict({
            "spec_transform": tnn.Linear(INPUT_DIM, HIDDEN),
            "LayerNorm": TFStyleLayerNorm(HIDDEN),
        })
        self.encoder = tnn.ModuleDict(
            {"layer": tnn.ModuleList([self.Layer() for _ in range(LAYERS)])})

    def forward(self, spec):
        h = self.input_representations["spec_transform"](spec)
        pe = torch.tensor(
            sinusoidal_position_encoding(h.shape[1], HIDDEN),
            dtype=h.dtype)
        h = self.input_representations["LayerNorm"](h + pe[None])
        for layer in self.encoder["layer"]:
            h = layer(h)
        return h


class LegacySpecHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.dense = tnn.Linear(HIDDEN, HIDDEN)
        self.LayerNorm = TFStyleLayerNorm(HIDDEN)
        self.output = tnn.Linear(HIDDEN, TARGET_DIM)


def _real_layout_ckpt(tmp_path, module_prefix=False):
    torch.manual_seed(0)
    enc, head = LegacyEncoder(), LegacySpecHead()
    for p in list(enc.parameters()) + list(head.parameters()):
        with torch.no_grad():
            p.add_(0.05 * torch.randn_like(p))
    enc_sd = {k: v.clone() for k, v in enc.state_dict().items()}
    head_sd = {k: v.clone() for k, v in head.state_dict().items()}
    if module_prefix:
        enc_sd = {f"module.{k}": v for k, v in enc_sd.items()}
        head_sd = {f"module.{k}": v for k, v in head_sd.items()}
    payload = {
        "Transformer": enc_sd,
        "SpecHead": head_sd,
        "Optimizer": {"state": {}, "param_groups": []},
        "Global_step": 12345,
        "Settings": {
            "Config": {
                "transformer": {
                    "input_dim": INPUT_DIM, "hidden_size": HIDDEN,
                    "num_hidden_layers": LAYERS,
                    "num_attention_heads": HEADS,
                    "intermediate_size": INTER, "hidden_act": "gelu",
                    "hidden_dropout_prob": 0.1,
                    "attention_probs_dropout_prob": 0.1,
                    "initializer_range": 0.02,
                    # the YAMLs quote this as a string — keep it a string
                    "layer_norm_eps": "1e-12",
                    "share_layer": False, "downsample_rate": 1,
                    "max_input_length": 0,
                },
                "online": {
                    "sample_rate": 16000, "win_ms": 25, "hop_ms": 10,
                    "n_freq": INPUT_DIM, "n_mels": 13, "n_mfcc": 13,
                    "input": {"feat_type": "linear", "channel": 0,
                              "log": True, "delta": 0, "cmvn": True},
                    "target": {"feat_type": "linear", "channel": 1,
                               "log": True, "delta": 0, "cmvn": False},
                },
            },
            "Paras": argparse.Namespace(
                gpu=True, multi_gpu=False, seed=1337, verbose=True),
        },
    }
    path = str(tmp_path / "states-12345.ckpt")
    torch.save(payload, path)
    return path, enc, head


def test_gamma_beta_layernorm_accepted(tmp_path):
    path, enc, _head = _real_layout_ckpt(tmp_path)
    lc = load_s3prl_checkpoint(path)
    assert "encoder" in lc.params and "spechead" in lc.params
    assert lc.config.hidden_size == HIDDEN
    assert lc.config.num_hidden_layers == LAYERS
    assert lc.input_dim == INPUT_DIM and lc.log_domain is True

    # gamma/beta landed in the flax scale/bias slots
    got = lc.params["encoder"]["input_ln"]["scale"]
    want = enc.input_representations["LayerNorm"].gamma.detach().numpy()
    np.testing.assert_array_equal(got, want)


def test_module_prefix_stripped(tmp_path):
    path, enc, _ = _real_layout_ckpt(tmp_path, module_prefix=True)
    lc = load_s3prl_checkpoint(path)
    got = lc.params["encoder"]["layer_1"]["output_ln"]["bias"]
    want = enc.encoder["layer"][1].output["LayerNorm"].beta.detach().numpy()
    np.testing.assert_array_equal(got, want)


def test_mixed_naming_rejected():
    sd = {
        "dense.weight": torch.zeros(HIDDEN, HIDDEN),
        "dense.bias": torch.zeros(HIDDEN),
        "LayerNorm.weight": torch.ones(HIDDEN),
        "LayerNorm.bias": torch.zeros(HIDDEN),
        "LayerNorm.gamma": torch.ones(HIDDEN),
        "LayerNorm.beta": torch.zeros(HIDDEN),
        "output.weight": torch.zeros(TARGET_DIM, HIDDEN),
        "output.bias": torch.zeros(TARGET_DIM),
    }
    with pytest.raises(ValueError, match="ambiguous"):
        convert_spechead_state(sd)


def test_missing_layernorm_loud():
    sd = {
        "dense.weight": torch.zeros(HIDDEN, HIDDEN),
        "dense.bias": torch.zeros(HIDDEN),
        "output.weight": torch.zeros(TARGET_DIM, HIDDEN),
        "output.bias": torch.zeros(TARGET_DIM),
    }
    with pytest.raises(KeyError, match="LayerNorm"):
        convert_spechead_state(sd)


def test_forward_parity_through_real_layout(tmp_path):
    """Importing the gamma/beta ckpt and running our flax encoder must
    reproduce the legacy torch encoder's forward (validates that the
    TF-style layernorm math equals our nn.LayerNorm application of the
    converted scale/bias on top of the known-good conversion chain)."""
    path, enc, _ = _real_layout_ckpt(tmp_path)
    lc = load_s3prl_checkpoint(path)

    model = TransformerEncoder(config=lc.config)
    x = np.random.default_rng(0).normal(
        size=(2, 7, INPUT_DIM)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           deterministic=True)
    params = jax.tree.map(lambda a: a, variables["params"])
    # graft every imported leaf into the initialized tree
    from speech_enhancement_by_s3prl_tpu.models.torch_import import (
        overlay_params,
    )
    params = overlay_params(params, lc.params["encoder"])
    ours = model.apply({"params": params}, jnp.asarray(x),
                       deterministic=True)
    if isinstance(ours, (tuple, list)):
        ours = ours[-1]
    with torch.no_grad():
        theirs = enc(torch.tensor(x)).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4)
