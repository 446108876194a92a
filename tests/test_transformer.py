"""Transformer encoder + checkpoint-importer parity.

A minimal torch implementation of the BERT-style post-LN encoder (the
architecture documented in SURVEY.md section 2.9 item 2) generates weights
in the S3PRL checkpoint naming; the importer converts them and the flax
encoder must reproduce the torch forward pass to float tolerance.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from speech_enhancement_by_s3prl_tpu.models.torch_import import (
    convert_spechead_state,
    convert_transformer_state,
)
from speech_enhancement_by_s3prl_tpu.models.transformer import (
    TransformerConfig,
    TransformerEncoder,
    TransformerSpecPredictionHead,
    sinusoidal_position_encoding,
)

CFG = TransformerConfig(
    input_dim=24,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    hidden_dropout_prob=0.0,
    attention_probs_dropout_prob=0.0,
)


class TorchSelfAttention(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.query = tnn.Linear(c.hidden_size, c.hidden_size)
        self.key = tnn.Linear(c.hidden_size, c.hidden_size)
        self.value = tnn.Linear(c.hidden_size, c.hidden_size)
        self.n_heads = c.num_attention_heads
        self.head_dim = c.hidden_size // c.num_attention_heads

    def forward(self, x):
        b, t, h = x.shape

        def split(z):
            return z.view(b, t, self.n_heads, self.head_dim).transpose(1, 2)

        q, k, v = split(self.query(x)), split(self.key(x)), split(self.value(x))
        att = (q @ k.transpose(-1, -2)) / math.sqrt(self.head_dim)
        ctx = att.softmax(-1) @ v
        return ctx.transpose(1, 2).reshape(b, t, h)


class TorchLayer(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.att = TorchSelfAttention(c)
        self.att_out = tnn.Linear(c.hidden_size, c.hidden_size)
        self.att_ln = tnn.LayerNorm(c.hidden_size, eps=c.layer_norm_eps)
        self.inter = tnn.Linear(c.hidden_size, c.intermediate_size)
        self.out = tnn.Linear(c.intermediate_size, c.hidden_size)
        self.out_ln = tnn.LayerNorm(c.hidden_size, eps=c.layer_norm_eps)

    def forward(self, x):
        x = self.att_ln(x + self.att_out(self.att(x)))
        x = self.out_ln(x + self.out(torch.nn.functional.gelu(self.inter(x))))
        return x


class TorchEncoder(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.spec_transform = tnn.Linear(c.input_dim, c.hidden_size)
        self.input_ln = tnn.LayerNorm(c.hidden_size, eps=c.layer_norm_eps)
        self.layers = tnn.ModuleList([TorchLayer(c) for _ in range(c.num_hidden_layers)])
        pe = sinusoidal_position_encoding(512, c.hidden_size)
        self.register_buffer("pe", torch.tensor(pe))

    def forward(self, spec):
        x = self.spec_transform(spec) + self.pe[None, : spec.shape[1]]
        x = self.input_ln(x)
        for layer in self.layers:
            x = layer(x)
        return x

    def s3prl_state_dict(self):
        sd = {}
        own = self.state_dict()
        sd["input_representations.spec_transform.weight"] = own["spec_transform.weight"]
        sd["input_representations.spec_transform.bias"] = own["spec_transform.bias"]
        sd["input_representations.LayerNorm.weight"] = own["input_ln.weight"]
        sd["input_representations.LayerNorm.bias"] = own["input_ln.bias"]
        for i in range(len(self.layers)):
            pre = f"encoder.layer.{i}"
            m = {
                f"{pre}.attention.self.query": f"layers.{i}.att.query",
                f"{pre}.attention.self.key": f"layers.{i}.att.key",
                f"{pre}.attention.self.value": f"layers.{i}.att.value",
                f"{pre}.attention.output.dense": f"layers.{i}.att_out",
                f"{pre}.attention.output.LayerNorm": f"layers.{i}.att_ln",
                f"{pre}.intermediate.dense": f"layers.{i}.inter",
                f"{pre}.output.dense": f"layers.{i}.out",
                f"{pre}.output.LayerNorm": f"layers.{i}.out_ln",
            }
            for dst, src in m.items():
                sd[f"{dst}.weight"] = own[f"{src}.weight"]
                sd[f"{dst}.bias"] = own[f"{src}.bias"]
        return sd


def test_encoder_matches_torch_reference():
    torch.manual_seed(0)
    t_enc = TorchEncoder(CFG).eval()
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 11, CFG.input_dim)).astype(np.float32)
    with torch.no_grad():
        ref = t_enc(torch.tensor(x)).numpy()

    params = convert_transformer_state(t_enc.s3prl_state_dict())
    enc = TransformerEncoder(CFG)
    ours = np.asarray(
        enc.apply({"params": params}, jnp.asarray(x), deterministic=True)
    )
    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_spechead_importer():
    torch.manual_seed(1)
    dense = tnn.Linear(CFG.hidden_size, CFG.hidden_size)
    ln = tnn.LayerNorm(CFG.hidden_size, eps=CFG.layer_norm_eps)
    out = tnn.Linear(CFG.hidden_size, 17)

    sd = {}
    for name, mod in [("dense", dense), ("LayerNorm", ln), ("output", out)]:
        sd[f"{name}.weight"] = mod.weight
        sd[f"{name}.bias"] = mod.bias

    rng = np.random.default_rng(1)
    h = rng.standard_normal((2, 5, CFG.hidden_size)).astype(np.float32)
    with torch.no_grad():
        ref = out(ln(torch.nn.functional.gelu(dense(torch.tensor(h))))).numpy()

    params = convert_spechead_state(sd)
    head = TransformerSpecPredictionHead(CFG, output_size=17)
    ours, _ = head.apply({"params": params}, jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-5)


def test_encoder_all_layers_and_downsample():
    cfg = TransformerConfig(
        input_dim=8, downsample_rate=2, hidden_size=16, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=32,
    )
    enc = TransformerEncoder(cfg)
    x = jnp.zeros((1, 10, 8), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    all_layers = enc.apply(params, x, output_all_layers=True)
    assert all_layers.shape == (2, 1, 5, 16)  # stacked frames: T 10 -> 5


def test_fused_attention_matches_naive(monkeypatch):
    """jax.nn.dot_product_attention path (default) reproduces the explicit
    einsum+softmax path (SE_ATTN_IMPL=naive) — same math, different
    lowering (no materialized (B, N, T, T) probability round-trip)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from speech_enhancement_by_s3prl_tpu.models.transformer import (
        TransformerConfig,
        TransformerEncoder,
    )

    cfg = TransformerConfig(
        input_dim=24, hidden_size=48, num_hidden_layers=2,
        num_attention_heads=6, intermediate_size=96,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    enc = TransformerEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    spec = jax.random.normal(jax.random.PRNGKey(1), (3, 50, 24), jnp.float32)
    p = enc.init({"params": rng, "dropout": rng}, spec)["params"]
    monkeypatch.delenv("SE_ATTN_IMPL", raising=False)
    fused = enc.apply({"params": p}, spec, deterministic=True)
    monkeypatch.setenv("SE_ATTN_IMPL", "naive")
    naive = enc.apply({"params": p}, spec, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(naive), atol=2e-5
    )
