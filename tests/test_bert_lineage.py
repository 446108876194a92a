"""Validate the S3PRL checkpoint importer against its lineage.

S3PRL's legacy ``transformer`` upstream (the TRANSFORMER consumed at
/root/reference/run_downstream.py:18, /root/reference/model.py:3-5) is a
direct adaptation of the HuggingFace BERT encoder: its per-layer state-dict
vocabulary (``attention.self.query`` / ``attention.output.dense`` /
``intermediate.dense`` / ``output.LayerNorm`` ...) and post-LN layer math
are BERT's. A real TERA ``states-*.ckpt`` is not obtainable in this image,
so the closest external truth for the importer's key names and math is the
installed ``transformers`` BERT itself:

1. the per-layer key vocabulary ``convert_transformer_state`` consumes must
   equal HF ``BertEncoder``'s per-layer state-dict keys exactly;
2. importing a real HF ``BertLayer``'s weights through the converter and
   running our flax ``TransformerLayer`` must reproduce the torch layer's
   forward output numerically (post-LN residual order, erf-gelu, fused-QKV
   split, 1/sqrt(d) scaling all checked at once);
3. the SpecHead transform keys (``dense``/``LayerNorm``) must match HF
   ``BertPredictionHeadTransform`` (the module S3PRL's
   TransformerSpecPredictionHead extends with an ``output`` linear).

Any drift between the importer's expected names and the BERT-family layout
the S3PRL checkpoints actually use fails here loudly.
"""
import re

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from speech_enhancement_by_s3prl_tpu.models.torch_import import (
    convert_spechead_state,
    convert_transformer_state,
)
from speech_enhancement_by_s3prl_tpu.models.transformer import (
    TransformerConfig,
    TransformerLayer,
)

# the exact per-layer key set convert_transformer_state reads (suffixes
# under encoder.layer.N.)
IMPORTER_LAYER_KEYS = {
    f"{mod}.{p}"
    for mod in (
        "attention.self.query",
        "attention.self.key",
        "attention.self.value",
        "attention.output.dense",
        "attention.output.LayerNorm",
        "intermediate.dense",
        "output.dense",
        "output.LayerNorm",
    )
    for p in ("weight", "bias")
}


def _bert_config(hidden=32, heads=4, inter=64, layers=1):
    from transformers.models.bert.configuration_bert import BertConfig

    cfg = BertConfig(
        hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=heads,
        intermediate_size=inter,
        vocab_size=16,
        hidden_act="gelu",
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        attn_implementation="eager",
    )
    # some transformers versions only honor the private attribute
    cfg._attn_implementation = "eager"
    return cfg


def test_importer_layer_vocabulary_matches_bert_lineage():
    from transformers.models.bert.modeling_bert import BertEncoder

    enc = BertEncoder(_bert_config(layers=2))
    for i in range(2):
        hf_keys = {
            k[len(f"layer.{i}.") :]
            for k in enc.state_dict()
            if k.startswith(f"layer.{i}.")
        }
        assert hf_keys == IMPORTER_LAYER_KEYS


def test_spechead_transform_vocabulary_matches_bert_lineage():
    from transformers.models.bert.modeling_bert import (
        BertPredictionHeadTransform,
    )

    tr = BertPredictionHeadTransform(_bert_config())
    hf_keys = set(tr.state_dict())
    # S3PRL's TransformerSpecPredictionHead = BertPredictionHeadTransform
    # (dense + act + LayerNorm) + an `output` linear projection
    assert hf_keys == {
        "dense.weight", "dense.bias", "LayerNorm.weight", "LayerNorm.bias",
    }
    sd = {k: v for k, v in tr.state_dict().items()}
    sd["output.weight"] = torch.zeros(7, tr.dense.out_features)
    sd["output.bias"] = torch.zeros(7)
    conv = convert_spechead_state(sd)
    assert set(conv) == {"dense", "ln", "output"}


def _import_bert_layer(layer, hidden, inter):
    """Run a real HF BertLayer state dict through the converter."""
    sd = {f"encoder.layer.0.{k}": v for k, v in layer.state_dict().items()}
    # converter requires the input_representations block; identity stubs
    sd["input_representations.spec_transform.weight"] = torch.eye(hidden)
    sd["input_representations.spec_transform.bias"] = torch.zeros(hidden)
    sd["input_representations.LayerNorm.weight"] = torch.ones(hidden)
    sd["input_representations.LayerNorm.bias"] = torch.zeros(hidden)
    return convert_transformer_state(sd)["layer_0"]


def test_layer_forward_parity_with_bert():
    from transformers.models.bert.modeling_bert import BertLayer

    cfg = _bert_config()
    torch.manual_seed(0)
    try:
        layer = BertLayer(cfg, layer_idx=0)
    except TypeError:  # older transformers
        layer = BertLayer(cfg)
    layer.eval()

    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, cfg.hidden_size)).astype(np.float32)
    with torch.no_grad():
        ref = layer(torch.tensor(x))[0].numpy()

    params = _import_bert_layer(layer, cfg.hidden_size, cfg.intermediate_size)
    ours = TransformerLayer(
        TransformerConfig(
            hidden_size=cfg.hidden_size,
            num_attention_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            hidden_act="gelu",
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            layer_norm_eps=cfg.layer_norm_eps,
        )
    )
    out = ours.apply({"params": _tree(params)}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5)


def _tree(params):
    import jax

    return jax.tree.map(jnp.asarray, params)
