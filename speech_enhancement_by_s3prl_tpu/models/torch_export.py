"""S3PRL checkpoint EXPORT — the inverse of ``torch_import``.

``torch_import`` converts S3PRL ``states-*.ckpt`` torch layouts into this
framework's flax trees; this module goes the other way: flax
encoder/SpecHead parameter trees -> the torch state-dict layout S3PRL's
``Transformer``/``SpecHead`` modules (and the reference's
``run_downstream.py --ckpt`` path, /root/reference/run_downstream.py:181,
/root/reference/model.py:97-117) expect.

Why this exists:

- **Upstream pretraining lives here, not in an external repo.** The
  reference outsources upstream pretraining to S3PRL and only *consumes*
  ``states-*.ckpt`` files; with an exporter, an upstream trained in this
  framework (via the Mockingjay downstream, which is exactly
  encoder+SpecHead) can be written as a standard S3PRL-layout checkpoint
  and fed back through ``--ckpt``/``--ckpt2`` — enabling the full
  active-learning experiment pipeline (noisy2clean / noisy2noise dual
  upstreams, /root/reference/run_active.sh) from scratch, no external
  artifacts.
- **Interop back to the reference stack**: a checkpoint exported here
  loads in any S3PRL consumer (torch ``load_state_dict`` layout), so
  migration works in both directions (docs/MIGRATION.md).

Layout inversions (mirror torch_import, same citations):
- flax Dense kernels are (in, out); torch ``nn.Linear`` stores (out, in).
- the fused qkv kernel is split back into query/key/value thirds.
- LayerNorm scale/bias -> weight/bias.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np


def _t(a):
    import torch

    # copy=True: jax array views are non-writable, torch wants ownership
    return torch.from_numpy(np.array(a, dtype=np.float32, copy=True))


def _dense_out(sd: Dict[str, Any], prefix: str, p: Dict[str, Any]) -> None:
    sd[f"{prefix}.weight"] = _t(np.asarray(p["kernel"]).T)
    sd[f"{prefix}.bias"] = _t(p["bias"])


def _layernorm_out(sd: Dict[str, Any], prefix: str, p: Dict[str, Any]) -> None:
    sd[f"{prefix}.weight"] = _t(p["scale"])
    sd[f"{prefix}.bias"] = _t(p["bias"])


def export_transformer_state(params: Dict[str, Any]) -> Dict[str, Any]:
    """TransformerEncoder params -> S3PRL ``Transformer`` state dict
    (inverse of torch_import.convert_transformer_state)."""
    sd: Dict[str, Any] = {}
    _dense_out(sd, "input_representations.spec_transform", params["spec_transform"])
    _layernorm_out(sd, "input_representations.LayerNorm", params["input_ln"])
    layer_ids = sorted(
        int(m.group(1))
        for k in params
        if (m := re.match(r"layer_(\d+)$", k)) is not None
    )
    if not layer_ids:
        # a share_layer=True encoder stores one 'layer_shared' subtree;
        # the S3PRL torch layout has no weight-tying representation, so
        # exporting it silently would produce a layer-less checkpoint
        raise ValueError(
            "no layer_<i> subtrees to export"
            + (
                " (share_layer=True encoders are weight-tied and have no "
                "S3PRL state-dict layout — untie before exporting)"
                if "layer_shared" in params
                else f"; got keys {sorted(params)}"
            )
        )
    for i in layer_ids:
        lp = params[f"layer_{i}"]
        pre = f"encoder.layer.{i}"
        qkv_k = np.asarray(lp["attention"]["qkv"]["kernel"])
        qkv_b = np.asarray(lp["attention"]["qkv"]["bias"])
        h = qkv_k.shape[1] // 3
        for j, name in enumerate(("query", "key", "value")):
            sd[f"{pre}.attention.self.{name}.weight"] = _t(
                qkv_k[:, j * h : (j + 1) * h].T
            )
            sd[f"{pre}.attention.self.{name}.bias"] = _t(qkv_b[j * h : (j + 1) * h])
        _dense_out(sd, f"{pre}.attention.output.dense", lp["attention"]["output"])
        _layernorm_out(sd, f"{pre}.attention.output.LayerNorm", lp["attention_ln"])
        _dense_out(sd, f"{pre}.intermediate.dense", lp["intermediate"])
        _dense_out(sd, f"{pre}.output.dense", lp["output"])
        _layernorm_out(sd, f"{pre}.output.LayerNorm", lp["output_ln"])
    return sd


def export_spechead_state(params: Dict[str, Any]) -> Dict[str, Any]:
    """TransformerSpecPredictionHead params -> S3PRL ``SpecHead`` state dict
    (inverse of torch_import.convert_spechead_state)."""
    sd: Dict[str, Any] = {}
    _dense_out(sd, "dense", params["dense"])
    _layernorm_out(sd, "LayerNorm", params["ln"])
    _dense_out(sd, "output", params["output"])
    return sd


def save_s3prl_ckpt(
    path: str,
    pretrain_config: Dict[str, Any],
    encoder_params: Optional[Dict[str, Any]] = None,
    spechead_params: Optional[Dict[str, Any]] = None,
    global_step: int = 0,
    paras: Optional[Dict[str, Any]] = None,
) -> str:
    """Write an S3PRL-layout ``states-*.ckpt``.

    ``pretrain_config`` is the pretraining YAML dict that travels inside
    the checkpoint (``transformer`` + ``online`` sections — the schema of
    config/pretrain_sample.yaml); every consumer (this framework's
    ``torch_import.load_s3prl_checkpoint``, the reference's
    run_downstream.py:126-134) reads architecture + feature geometry from
    ``Settings.Config``, so it must describe the exported weights.
    """
    import torch

    assert "transformer" in pretrain_config and "online" in pretrain_config, (
        "pretrain_config needs 'transformer' and 'online' sections "
        "(config/pretrain_sample.yaml schema) — consumers read architecture "
        "and feature geometry from Settings.Config"
    )
    payload: Dict[str, Any] = {
        "Settings": {"Config": pretrain_config, "Paras": dict(paras or {})},
        "Global_step": int(global_step),
    }
    if encoder_params is not None:
        payload["Transformer"] = export_transformer_state(encoder_params)
    if spechead_params is not None:
        payload["SpecHead"] = export_spechead_state(spechead_params)
    tmp = f"{path}.tmp"
    torch.save(payload, tmp)
    import os

    os.replace(tmp, path)
    return path
