"""Serving upstream-backed checkpoints (VERDICT round-2 item: serve.py
used to hard-reject checkpoints whose head consumes upstream hidden
states). The whole upstream -> head -> iSTFT pipeline must run inside the
jitted enhance program for the live server, the offline CLI and the
jax.export artifact path — matching the reference's ability to run any
configured head (/root/reference/runner.py:447-453)."""
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.models.upstream import build_upstream
from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.runner.runner import Runner
from tests.test_e2e import corpus, make_args, make_config  # noqa: F401
from tests.test_spechead_pretrained import s3prl_ckpt  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _upstream_runner(corpus, tmp_path, s3prl_path):
    """A runner whose downstream consumes transformer hidden states
    (from_rawfeature/from_waveform both unset)."""
    config = make_config(corpus)
    args = make_args(
        str(tmp_path), upstream="transformer", ckpt=s3prl_path,
        from_rawfeature=False, from_waveform=False,
    )
    feat_list = [get_feat_config("linear", 0) for _ in range(3)] + [
        get_feat_config("phase", 0),
        get_feat_config("linear", 1),
        get_feat_config("phase", 1),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    pre.channel_inp, pre.channel_tar = 0, 1
    up = build_upstream("transformer", 201, s3prl_path)
    model = build_head("LSTM", input_size=up.out_dim, output_size=201,
                       **config["model"]["LSTM"])
    runner = Runner(args=args, config=config, preprocessor=pre, upstream=up,
                    upstream2=up, downstream=model, expdir=str(tmp_path))
    runner.set_model()
    return runner


@pytest.fixture(scope="module")
def upstream_ckpt_dir(corpus, s3prl_ckpt, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_up")
    path, _, _ = s3prl_ckpt
    runner = _upstream_runner(corpus, tmp, path)
    runner.train()  # a few steps so the ckpt isn't the raw init
    return str(tmp), path


def test_serve_upstream_backed_checkpoint(upstream_ckpt_dir):
    ckpt_dir, s3prl_path = upstream_ckpt_dir
    sys.path.insert(0, REPO)
    import serve

    enhance = serve.build_enhancer(ckpt_dir, 16000, -25.0)
    rng = np.random.default_rng(0)
    n = 12000
    t = np.arange(n) / 16000.0
    wav = (0.2 * np.sin(2 * np.pi * 260 * t)
           + 0.05 * rng.standard_normal(n)).astype(np.float32)
    out = enhance(wav)
    assert out.shape == (n,)
    assert np.isfinite(out).all() and np.abs(out).max() > 0
    # output is renormalized to -25 dB over the valid samples
    rms_db = 20 * np.log10(np.sqrt(np.mean(out**2)) + 1e-12)
    assert abs(rms_db - (-25.0)) < 0.5

    # the upstream encoder is really in the program: zeroing its weights
    # must change the enhanced audio
    params, enhance_raw, buckets = serve.build_raw_enhancer(
        ckpt_dir, 16000, -25.0
    )
    assert isinstance(params, dict) and "upstream" in params
    zeroed = {
        "downstream": params["downstream"],
        "upstream": jax.tree.map(jnp.zeros_like, params["upstream"]),
    }
    from speech_enhancement_by_s3prl_tpu.data.loader import bucket_length

    T = bucket_length(n, buckets)
    batch = np.zeros((1, T), np.float32)
    batch[0, :n] = wav
    a = np.asarray(enhance_raw(params, jnp.asarray(batch), jnp.asarray([n])))
    b = np.asarray(enhance_raw(zeroed, jnp.asarray(batch), jnp.asarray([n])))
    assert not np.allclose(a, b), "upstream params must affect the output"


def test_serve_upstream_missing_pretrain_ckpt(upstream_ckpt_dir, tmp_path):
    """A stale recorded S3PRL path fails loudly and --upstream_ckpt
    relocates it."""
    ckpt_dir, s3prl_path = upstream_ckpt_dir
    sys.path.insert(0, REPO)
    import shutil

    import serve
    from speech_enhancement_by_s3prl_tpu.runner.checkpoint import (
        find_resume_ckpt,
        load_checkpoint,
        save_checkpoint,
    )

    payload = load_checkpoint(find_resume_ckpt(ckpt_dir))
    args = dict(payload["Settings"]["Paras"])
    args["ckpt"] = "/nonexistent/states-1.ckpt"
    broken = tmp_path / "broken"
    save_checkpoint(
        str(broken), payload["Global_step"], payload["Downstream"],
        payload["Optimizer"], payload["Settings"]["Config"], args,
    )

    with pytest.raises(SystemExit, match="upstream_ckpt"):
        serve.build_raw_enhancer(str(broken), 16000, -25.0)

    moved = str(tmp_path / "relocated.ckpt")
    shutil.copy(s3prl_path, moved)
    params, enhance_raw, _ = serve.build_raw_enhancer(
        str(broken), 16000, -25.0, upstream_ckpt=moved
    )
    assert "upstream" in params


def test_serve_upstream_mesh_sharded(upstream_ckpt_dir):
    """dp mesh serving with an upstream-backed checkpoint: the params are
    a {downstream, upstream} dict and every leaf must ride the replicated
    sharding while the batch shards over 'data'."""
    ckpt_dir, _ = upstream_ckpt_dir
    sys.path.insert(0, REPO)
    import serve

    assert len(jax.devices()) >= 2, "conftest provisions 8 virtual devices"
    mesh_enh = serve.build_enhancer(ckpt_dir, 16000, -25.0, mesh_n=2)
    solo_enh = serve.build_enhancer(ckpt_dir, 16000, -25.0)
    rng = np.random.default_rng(4)
    wavs = [
        (0.1 * rng.standard_normal(int(n))).astype(np.float32)
        for n in (12000, 13000, 11000)
    ]
    outs = mesh_enh.run_batch(wavs)
    solo = solo_enh.run_batch(wavs)
    for o, s, w in zip(outs, solo, wavs):
        assert o.shape == w.shape
        np.testing.assert_allclose(o, s, atol=2e-4)


@pytest.fixture(scope="module")
def mockingjay_ckpt_dir(corpus, s3prl_ckpt, tmp_path_factory):
    """A trained Mockingjay-as-downstream checkpoint (head config travels
    in the S3PRL pretraining ckpt recorded as paras['dckpt'],
    /root/reference/model.py:129-153)."""
    from tests.test_spechead_pretrained import _make_runner

    tmp = tmp_path_factory.mktemp("serve_mj")
    path, _, _ = s3prl_ckpt
    runner = _make_runner(corpus, tmp, path, "Mockingjay", dckpt=path)
    runner.train()
    return str(tmp), path


def test_serve_mockingjay_dckpt_relocation(mockingjay_ckpt_dir, tmp_path):
    """Serving a Mockingjay-head checkpoint needs the recorded S3PRL
    pretraining ckpt for the head config: a stale path fails loudly and
    --dckpt relocates it (mirrors --upstream_ckpt for SpecHead)."""
    ckpt_dir, s3prl_path = mockingjay_ckpt_dir
    sys.path.insert(0, REPO)
    import shutil

    import serve
    from speech_enhancement_by_s3prl_tpu.runner.checkpoint import (
        find_resume_ckpt,
        load_checkpoint,
        save_checkpoint,
    )

    rng = np.random.default_rng(7)
    n = 11000
    wav = (0.1 * rng.standard_normal(n)).astype(np.float32)

    # recorded path valid: serves without flags
    enhance = serve.build_enhancer(ckpt_dir, 16000, -25.0)
    out = enhance(wav)
    assert out.shape == (n,) and np.isfinite(out).all()

    # stale recorded path: loud failure naming the relocation flag
    payload = load_checkpoint(find_resume_ckpt(ckpt_dir))
    args = dict(payload["Settings"]["Paras"])
    args["dckpt"] = "/nonexistent/states-1.ckpt"
    broken = tmp_path / "broken"
    save_checkpoint(
        str(broken), payload["Global_step"], payload["Downstream"],
        payload["Optimizer"], payload["Settings"]["Config"], args,
    )
    with pytest.raises(SystemExit, match="--dckpt"):
        serve.build_raw_enhancer(str(broken), 16000, -25.0)

    # relocation restores byte-identical serving
    moved = str(tmp_path / "relocated.ckpt")
    shutil.copy(s3prl_path, moved)
    reloc = serve.build_enhancer(str(broken), 16000, -25.0, dckpt=moved)
    np.testing.assert_allclose(reloc(wav), out, atol=1e-6)


def test_serve_mockingjay_divergent_feature_geometry(tmp_path):
    """A dckpt-bearing head must be served the dckpt's online.input
    feature, not the downstream config's baseline
    (run_downstream.get_preprocessor:165-178): a Mockingjay trained on
    40-dim log-mel gets 40-dim log-mel at serving time too. Regression —
    serving used to always build the 201-dim baseline linear feature,
    crashing param application for any divergent geometry (the other
    serving tests mask this because their fixture geometry happens to
    equal the baseline)."""
    import torch

    sys.path.insert(0, REPO)
    import serve
    from speech_enhancement_by_s3prl_tpu.models.heads import build_head
    from speech_enhancement_by_s3prl_tpu.runner.checkpoint import (
        save_checkpoint,
    )

    pre_cfg = {
        "transformer": {
            "input_dim": 40, "hidden_size": 32, "num_hidden_layers": 1,
            "num_attention_heads": 2, "intermediate_size": 48,
            "hidden_act": "gelu", "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0, "layer_norm_eps": 1e-12,
            "share_layer": False, "downsample_rate": 1,
        },
        "online": {
            "sample_rate": 16000, "win_ms": 25, "hop_ms": 10,
            "n_freq": 201, "n_mels": 40, "n_mfcc": 13,
            "input": {"feat_type": "mel", "channel": 0, "log": True,
                      "delta": 0, "cmvn": True},
            "target": {"feat_type": "linear", "channel": 1, "log": True,
                       "delta": 0, "cmvn": False},
        },
    }
    dck = str(tmp_path / "states-100.ckpt")
    torch.save({"Settings": {"Config": pre_cfg, "Paras": {}}}, dck)

    model = build_head("Mockingjay", input_size=40, output_size=201,
                       dckpt=dck)
    params = model.init(
        jax.random.key(0),
        features=jnp.zeros((1, 12, 40)), linears=jnp.zeros((1, 12, 201)),
    )
    config = {"preprocessor": {
        "input_channel": 0, "target_channel": 1,
        "baseline": {"feat_type": "linear", "log": False, "delta": 0,
                     "cmvn": False},
    }}
    paras = dict(downstream="Mockingjay", dckpt=dck, ckpt="",
                 upstream="baseline", from_rawfeature=True,
                 from_waveform=False)
    ckd = tmp_path / "trained"
    save_checkpoint(str(ckd), 100, params, {}, config, paras)

    enhance = serve.build_enhancer(str(ckd), 16000, -25.0)
    wav = (0.1 * np.random.default_rng(3).standard_normal(9000)).astype(
        np.float32
    )
    out = enhance(wav)
    assert out.shape == wav.shape and np.isfinite(out).all()


def test_serve_rawfeature_ckpt_defines_stft_geometry(tmp_path):
    """Training reads the preprocessor geometry from the recorded
    pretraining ckpt whenever --ckpt is set — even for rawfeature heads
    with a baseline upstream (run_downstream._pretrain_config:144-154).
    Serving must do the same: a checkpoint trained at 161-bin/20 ms
    geometry gets that geometry back, not the 201-bin default."""
    import torch

    sys.path.insert(0, REPO)
    import serve
    from speech_enhancement_by_s3prl_tpu.runner.checkpoint import (
        save_checkpoint,
    )

    pre_cfg = {
        "transformer": {"input_dim": 161, "hidden_size": 32,
                        "num_hidden_layers": 1, "num_attention_heads": 2,
                        "intermediate_size": 48, "hidden_act": "gelu",
                        "hidden_dropout_prob": 0.0,
                        "attention_probs_dropout_prob": 0.0,
                        "layer_norm_eps": 1e-12, "share_layer": False,
                        "downsample_rate": 1},
        "online": {"sample_rate": 16000, "win_ms": 20, "hop_ms": 10,
                   "n_freq": 161, "n_mels": 40, "n_mfcc": 13,
                   "input": {"feat_type": "linear", "channel": 0,
                             "log": False, "delta": 0, "cmvn": False},
                   "target": {"feat_type": "linear", "channel": 1,
                              "log": False, "delta": 0, "cmvn": False}},
    }
    pck = str(tmp_path / "states-50.ckpt")
    torch.save({"Settings": {"Config": pre_cfg, "Paras": {}}}, pck)

    model = build_head("LSTM", input_size=161, output_size=161,
                       hidden_size=8, num_layers=1, bidirectional=True)
    params = model.init(
        jax.random.key(0),
        features=jnp.zeros((1, 12, 161)), linears=jnp.zeros((1, 12, 161)),
    )
    config = {
        "preprocessor": {
            "input_channel": 0, "target_channel": 1,
            "baseline": {"feat_type": "linear", "log": False, "delta": 0,
                         "cmvn": False},
        },
        "model": {"LSTM": {"hidden_size": 8, "num_layers": 1,
                           "bidirectional": True}},
    }
    paras = dict(downstream="LSTM", dckpt="", ckpt=pck,
                 upstream="baseline", from_rawfeature=True,
                 from_waveform=False)
    ckd = tmp_path / "trained"
    save_checkpoint(str(ckd), 50, params, {}, config, paras)

    enhance = serve.build_enhancer(str(ckd), 16000, -25.0)
    wav = (0.1 * np.random.default_rng(9).standard_normal(8000)).astype(
        np.float32
    )
    out = enhance(wav)
    assert out.shape == wav.shape and np.isfinite(out).all()

    # stale recorded geometry source fails loudly with the relocation hint
    paras2 = dict(paras, ckpt="/nonexistent/states-9.ckpt")
    broken = tmp_path / "broken"
    save_checkpoint(str(broken), 50, params, {}, config, paras2)
    with pytest.raises(SystemExit, match="geometry"):
        serve.build_raw_enhancer(str(broken), 16000, -25.0)


def test_export_artifact_upstream_backed(upstream_ckpt_dir, tmp_path):
    """scripts/export_model.py bakes upstream+head into one StableHLO
    program; artifact serving returns the live path's audio."""
    ckpt_dir, s3prl_path = upstream_ckpt_dir
    sys.path.insert(0, REPO)
    import serve

    out = tmp_path / "artifact"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_model.py"),
         "--ckpt", ckpt_dir, "--out", str(out), "--cpu", "--max_sec", "2"],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    live = serve.build_enhancer(ckpt_dir, 16000, -25.0, max_bucket_ms=2000)
    art = serve.build_artifact_enhancer(str(out), 16000)
    rng = np.random.default_rng(1)
    n = 9000
    wav = (0.1 * rng.standard_normal(n)).astype(np.float32)
    np.testing.assert_allclose(art(wav), live(wav), atol=1e-4)
