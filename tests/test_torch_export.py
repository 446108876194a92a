"""S3PRL checkpoint export (models/torch_export.py): the inverse of the
importer. Validated three ways: exact tree round-trip through the importer,
strict state-dict load + forward parity against the S3PRL-layout torch
modules, and a full save -> build_upstream reload."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.models.torch_export import (
    export_spechead_state,
    export_transformer_state,
    save_s3prl_ckpt,
)
from speech_enhancement_by_s3prl_tpu.models.torch_import import (
    convert_spechead_state,
    convert_transformer_state,
    load_s3prl_checkpoint,
)
from speech_enhancement_by_s3prl_tpu.models.transformer import TransformerConfig
from speech_enhancement_by_s3prl_tpu.models.upstream import (
    UpstreamTransformer,
    build_upstream,
)
from tests.test_spechead_pretrained import (
    INPUT_DIM,
    TorchEncoder,
    TorchSpecHead,
    _pretrain_config,
)


def _make_upstream(seed=3):
    cfg = TransformerConfig.from_dict(_pretrain_config())
    return UpstreamTransformer(
        cfg, input_dim=INPUT_DIM, output_size=201, seed=seed, log_domain=True
    )


def _assert_tree_equal(a, b):
    la, ta = jax.tree.flatten(a)
    lb, tb = jax.tree.flatten(b)
    assert ta == tb
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_export_import_roundtrip_exact():
    """convert(export(params)) == params bit-for-bit (pure transposes)."""
    up = _make_upstream()
    _assert_tree_equal(
        convert_transformer_state(export_transformer_state(up.params["encoder"])),
        jax.tree.map(lambda x: np.asarray(x, np.float32), up.params["encoder"]),
    )
    _assert_tree_equal(
        convert_spechead_state(export_spechead_state(up.params["spechead"])),
        jax.tree.map(lambda x: np.asarray(x, np.float32), up.params["spechead"]),
    )


def test_exported_state_dict_loads_strict_and_matches_forward():
    """The exported layout is exactly what an S3PRL-shaped torch consumer
    expects (strict load succeeds) and reproduces the flax forward."""
    up = _make_upstream()
    tenc = TorchEncoder().eval()
    tenc.load_state_dict(export_transformer_state(up.params["encoder"]), strict=True)
    thead = TorchSpecHead().eval()
    thead.load_state_dict(export_spechead_state(up.params["spechead"]), strict=True)

    rng = np.random.default_rng(0)
    spec = rng.standard_normal((1, 12, INPUT_DIM)).astype(np.float32)
    with torch.no_grad():
        t_hidden = tenc(torch.tensor(spec))
        t_raw, _ = thead(t_hidden)
    j_hidden = up(jnp.asarray(spec))
    np.testing.assert_allclose(
        np.asarray(j_hidden), t_hidden.numpy(), atol=2e-5, rtol=1e-4
    )
    raw, _ = up.head.apply({"params": up.params["spechead"]}, j_hidden)
    np.testing.assert_allclose(np.asarray(raw), t_raw.numpy(), atol=2e-5, rtol=1e-4)


def test_save_and_reload_via_build_upstream(tmp_path):
    """save_s3prl_ckpt output flows through the production --ckpt path."""
    up = _make_upstream()
    path = str(tmp_path / "states-777.ckpt")
    save_s3prl_ckpt(
        path,
        _pretrain_config(),
        encoder_params=up.params["encoder"],
        spechead_params=up.params["spechead"],
        global_step=777,
        paras={"exported_by": "torch_export"},
    )

    lc = load_s3prl_checkpoint(path)
    assert lc.log_domain is True  # online.target.log travels
    assert lc.input_dim == INPUT_DIM

    up2 = build_upstream("transformer", INPUT_DIM, ckpt=path)
    rng = np.random.default_rng(1)
    spec = jnp.asarray(rng.standard_normal((2, 9, INPUT_DIM)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(up2(spec)), np.asarray(up(spec)), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(up2.spec_head(up2(spec))),
        np.asarray(up.spec_head(up(spec))),
        atol=1e-6,
    )


def test_save_requires_config_sections(tmp_path):
    up = _make_upstream()
    with pytest.raises(AssertionError):
        save_s3prl_ckpt(
            str(tmp_path / "bad.ckpt"),
            {"transformer": {}},  # missing 'online'
            encoder_params=up.params["encoder"],
        )


def test_export_rejects_layerless_trees():
    """A share_layer=True encoder stores one weight-tied 'layer_shared'
    subtree; the S3PRL torch layout cannot represent tying, so exporting
    must fail loudly instead of writing a layer-less checkpoint."""
    up = _make_upstream()
    enc = dict(up.params["encoder"])
    shared = enc.pop("layer_0")
    for k in [k for k in list(enc) if k.startswith("layer_")]:
        enc.pop(k)
    enc["layer_shared"] = shared
    with pytest.raises(ValueError, match="share_layer"):
        export_transformer_state(enc)
    enc.pop("layer_shared")
    with pytest.raises(ValueError, match="no layer_<i>"):
        export_transformer_state(enc)


def test_import_rejects_layerless_state_dict():
    sd = {
        "input_representations.spec_transform.weight": torch.zeros(4, 8),
        "input_representations.spec_transform.bias": torch.zeros(4),
        "input_representations.LayerNorm.weight": torch.ones(4),
        "input_representations.LayerNorm.bias": torch.zeros(4),
    }
    with pytest.raises(ValueError, match="encoder.layer"):
        convert_transformer_state(sd)
