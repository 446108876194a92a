"""CLI arg/config resolution (run_downstream.get_downstream_args):
YAML load, CLI file-list overrides, resume snapshot restore."""
import os
import sys

import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import run_downstream as rd  # noqa: E402


def write_cfg(tmp_path):
    cfg = {
        "dataloader": {"batch_size": 2, "eval_batch_size": 2},
        "preprocessor": {
            "input_channel": 0, "target_channel": 1,
            "baseline": {"feat_type": "linear", "log": False, "delta": 0,
                         "cmvn": False},
        },
        "runner": {"learning_rate": 1e-4, "total_step": 10,
                   "gradient_clipping": 1.0, "log_step": 5, "eval_step": 100,
                   "max_keep": 2, "eval_splits": [], "eval_metrics": ["sisdr"]},
        "objective": {"L1": {}},
        "model": {"LSTM": {"hidden_size": 4, "num_layers": 1}},
        "OnlineDataset_train": {"speech": {"filestrs": "/a"},
                                "noise": {"filestrs": "/b"}},
        "OnlineDataset_test": {"speech": {"filestrs": "/c"},
                               "noise": {"filestrs": "/d"}},
    }
    p = tmp_path / "cfg.yaml"
    p.write_text(yaml.safe_dump(cfg))
    return str(p)


def test_cli_filestr_overrides(tmp_path, monkeypatch):
    """--train_speech etc. rewrite the OnlineDataset sections
    (/root/reference/run_downstream.py:89-93 behavior)."""
    cfg = write_cfg(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "run_downstream.py", "--config", cfg, "--name", "x",
        "--train_speech", "/override/speech", "--test_noise", "/override/noise",
    ])
    args, config = rd.get_downstream_args()
    assert config["OnlineDataset_train"]["speech"]["filestrs"] == "/override/speech"
    assert config["OnlineDataset_test"]["noise"]["filestrs"] == "/override/noise"
    assert config["OnlineDataset_train"]["noise"]["filestrs"] == "/b"  # untouched
    assert args.trainset == "OnlineDataset"  # explicit default (SURVEY 2.10)
    assert args.gpu is True  # not --cpu


def test_resume_restores_args_and_config(tmp_path, monkeypatch):
    """--resume loads args+config from the checkpoint snapshot; CLI values
    are superseded (/root/reference/run_downstream.py:94-106)."""
    from speech_enhancement_by_s3prl_tpu.runner.checkpoint import save_checkpoint

    saved_args = {"name": "orig", "objective": "SISDR", "downstream": "LSTM",
                  "seed": 42, "wandb": False}
    saved_cfg = {"runner": {"total_step": 77}}
    save_checkpoint(str(tmp_path / "exp"), 7, {"w": [1.0]}, {}, saved_cfg,
                    saved_args, max_keep=2)

    monkeypatch.setattr(sys, "argv", [
        "run_downstream.py", "--resume", str(tmp_path / "exp"),
        "--objective", "L1",  # superseded by the snapshot
    ])
    args, config = rd.get_downstream_args()
    assert args.objective == "SISDR"
    assert args.name == "orig"
    assert config["runner"]["total_step"] == 77
    assert args.resume.endswith("states-7.ckpt")


def test_compute_dtype_flag_reaches_modules(tmp_path, monkeypatch):
    """--compute_dtype travels the args namespace as a string and lands on
    the head/upstream modules as a jnp dtype (heads.normalize_compute_dtype);
    the default keeps reference f32."""
    import jax.numpy as jnp

    from speech_enhancement_by_s3prl_tpu.models.heads import (
        build_head,
        normalize_compute_dtype,
    )
    from speech_enhancement_by_s3prl_tpu.models.upstream import build_upstream

    assert normalize_compute_dtype("bf16") == jnp.bfloat16
    assert normalize_compute_dtype("f32") == jnp.float32
    assert normalize_compute_dtype(jnp.bfloat16) == jnp.bfloat16
    with pytest.raises(ValueError, match="compute_dtype"):
        normalize_compute_dtype("fp8")

    cfg = write_cfg(tmp_path)
    monkeypatch.setattr(sys, "argv", [
        "run_downstream.py", "--name", "t", "--config", cfg,
        "--upstream", "baseline", "--upstream2", "baseline",
        "--from_rawfeature", "--downstream", "LSTM", "--objective", "L1",
        "--expdir", str(tmp_path), "--compute_dtype", "bf16", "--cpu",
    ])
    args, config = rd.get_downstream_args()
    assert args.compute_dtype == "bf16"
    head = rd.get_downstream_model(args, 201, 201, config)
    assert head.compute_dtype == jnp.bfloat16

    up = build_upstream("transformer", 201, compute_dtype="bf16")
    assert up.encoder.compute_dtype == jnp.bfloat16
    # default stays f32 (reference numerics)
    head_default = build_head("LSTM", 201, 201, hidden_size=4, num_layers=1)
    assert head_default.compute_dtype == jnp.float32
