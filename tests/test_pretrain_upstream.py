"""Upstream pretraining CLI (scripts/pretrain_upstream.py): random seed
checkpoint -> Mockingjay-downstream training -> exported S3PRL-layout
upstream, consumable by build_upstream/--ckpt."""
import os
import sys

import numpy as np
import pytest
import yaml

import jax.numpy as jnp

SCRIPTS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts")
sys.path.insert(0, SCRIPTS)

from speech_enhancement_by_s3prl_tpu.data.audio_io import write_wav
from speech_enhancement_by_s3prl_tpu.models.torch_import import (
    load_s3prl_checkpoint,
)
from speech_enhancement_by_s3prl_tpu.models.upstream import build_upstream


def _tiny_pretrain_yaml(path, target_channel=1):
    cfg = {
        "transformer": {
            "input_dim": 201, "downsample_rate": 1, "hidden_size": 16,
            "num_hidden_layers": 1, "num_attention_heads": 2,
            "intermediate_size": 32, "hidden_act": "gelu",
            "hidden_dropout_prob": 0.0, "attention_probs_dropout_prob": 0.0,
            "initializer_range": 0.02, "layer_norm_eps": "1e-12",
            "share_layer": False, "max_input_length": 0,
        },
        "online": {
            "sample_rate": 16000, "max_time": 1000, "target_level": -25,
            "win_ms": 25, "hop_ms": 10, "n_freq": 201, "n_mels": 40,
            "n_mfcc": 13,
            "input": {"feat_type": "linear", "channel": 0, "log": True,
                      "delta": 0, "cmvn": True},
            "target": {"feat_type": "linear", "channel": target_channel,
                       "log": True, "delta": 0, "cmvn": False},
        },
    }
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("pretrain_corpus")
    rng = np.random.default_rng(0)
    for sub, n in [("speech", 4), ("noise", 2)]:
        (root / sub).mkdir()
        for i in range(n):
            t = int(rng.integers(6000, 16000))
            write_wav(str(root / sub / f"{sub}{i}.wav"),
                      rng.standard_normal(t).astype(np.float32) * 0.1, 16000)
    return root


@pytest.mark.parametrize("target_channel", [1, 2])
def test_pretrain_upstream_end_to_end(corpus, tmp_path, target_channel):
    import pretrain_upstream

    cfg_path = _tiny_pretrain_yaml(str(tmp_path / "pre.yaml"), target_channel)
    out = pretrain_upstream.main([
        "--name", f"up{target_channel}",
        "--expdir", str(tmp_path / "exp"),
        "--config", cfg_path,
        "--speech", str(corpus / "speech"),
        "--noise", str(corpus / "noise"),
        "--target_channel", str(target_channel),
        "--total_step", "2",
        "--batch_size", "2",
        "--cpu",
    ])
    assert os.path.exists(out)

    lc = load_s3prl_checkpoint(out)
    assert lc.log_domain is True
    assert lc.pretrain_config["online"]["target"]["channel"] == target_channel
    assert "encoder" in lc.params and "spechead" in lc.params

    up = build_upstream("transformer", lc.input_dim, ckpt=out)
    feats = jnp.zeros((1, 7, lc.input_dim), jnp.float32)
    hidden = up(feats)
    assert hidden.shape == (1, 7, 16)
    spec = up.spec_head(hidden)
    assert spec.shape == (1, 7, 201)
    assert bool(jnp.isfinite(spec).all()) and float(spec.min()) >= 0.0

    # the seed and the trained export differ (training actually moved)
    seed = load_s3prl_checkpoint(
        os.path.join(str(tmp_path / "exp"), f"up{target_channel}", "seed.ckpt")
    )
    sk = np.asarray(seed.params["encoder"]["spec_transform"]["kernel"])
    tk = np.asarray(lc.params["encoder"]["spec_transform"]["kernel"])
    assert not np.array_equal(sk, tk)
