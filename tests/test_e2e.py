"""End-to-end integration: synthetic corpus -> Runner.train a few steps ->
evaluate -> checkpoint/resume (SURVEY.md section 7, milestone M1: linear
log-magnitude STFT + LSTM head, no upstream, L1 loss)."""
import os
from argparse import Namespace

import numpy as np
import pytest

import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.data.audio_io import write_wav
from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.models.upstream import DummyUpstream
from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.runner.checkpoint import (
    find_resume_ckpt,
    load_checkpoint,
)
from speech_enhancement_by_s3prl_tpu.runner.runner import Runner


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    rng = np.random.default_rng(0)
    for sub, n in [("speech", 6), ("noise", 3)]:
        (root / sub).mkdir()
        for i in range(n):
            t = int(rng.integers(6000, 16000))
            write_wav(str(root / sub / f"{sub}{i}.wav"), rng.standard_normal(t) * 0.1,
                      16000)
    return root


def make_config(root):
    ds = dict(
        speech={"filestrs": str(root / "speech")},
        noise={"filestrs": str(root / "noise")},
        sample_rate=16000,
        max_time=1000,
        target_level=-25,
        snrs=[0, 4],
    )
    return {
        "dataloader": {"batch_size": 2, "eval_batch_size": 2, "active_batch_size": 2},
        "preprocessor": {
            "input_channel": 0,
            "target_channel": 1,
            "baseline": {"feat_type": "linear", "log": False, "delta": 0, "cmvn": False},
        },
        "runner": {
            "learning_rate": 1.0e-3,
            "warmup_proportion": 0.07,
            "gradient_clipping": 1.0,
            "total_step": 4,
            "log_step": 2,
            "eval_step": 100,
            "save_step": 100,
            "max_keep": 2,
            "eval_splits": [],
            "eval_metrics": ["sisdr", "stoi"],
            "active_query_num": 2,
            "sampler_collect_step": 2,
            "sampler_refresh_step": 100,
            "sampler_sample_num": 4,
            "active_refresh_step": 10,
            "active_buffer_weights": [1, 1, 1, 1],
        },
        "objective": {"L1": {}, "SISDR": {}},
        "model": {"LSTM": {"hidden_size": 8, "num_layers": 1, "bidirectional": False}},
        "OnlineDataset_train": {**ds, "infinite": True},
        "OnlineDataset_test": {**ds, "half_noise": "end"},
    }


def make_args(expdir, **over):
    base = dict(
        name="t", n_jobs=1, dev_num=2, upstream="baseline", ckpt="", dropout=None,
        upstream2="baseline", ckpt2="", dropout2=None, pseudo_clean=False,
        pseudo_noise=False, downstream="LSTM", dckpt="", objective="L1",
        from_waveform=False, from_rawfeature=True, trainset="OnlineDataset",
        optim="BertAdam", config="", expdir=expdir, seed=1337, cpu=True, wandb=False,
        eval_init=False, no_metric=False, save_best=False, active_sampling=False,
        record_num=2, sampler_device=None, active_layerid=None, n_iterate=2,
        sync_sampler=False, train_speech=None, train_noise=None, test_speech=None,
        test_noise=None, test=False, test_gradient=False, resume=None, gpu=False,
    )
    base.update(over)
    return Namespace(**base)


def make_runner(corpus, tmp_path, **args_over):
    config = make_config(corpus)
    args = make_args(str(tmp_path), **args_over)
    feat_list = [
        get_feat_config("linear", 0),  # upstream feat (baseline: raw linear)
        get_feat_config("linear", 0),  # downstream feat
        get_feat_config("linear", 0),
        get_feat_config("phase", 0),
        get_feat_config("linear", 1),
        get_feat_config("phase", 1),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    pre.channel_inp, pre.channel_tar = 0, 1
    model = build_head("LSTM", input_size=201, output_size=201,
                       **config["model"]["LSTM"])
    up = DummyUpstream(201)
    runner = Runner(
        args=args, config=config, preprocessor=pre, upstream=up, upstream2=up,
        downstream=model, expdir=str(tmp_path),
    )
    runner.set_model()
    return runner, config, args


def test_train_eval_checkpoint_resume(corpus, tmp_path):
    runner, config, args = make_runner(corpus, tmp_path)
    p0 = np.asarray(
        runner.state.params["params"]["scaling_layer"]["kernel"]
    ).copy()

    runner.train()  # 4 steps
    assert runner.global_step == 5
    p1 = np.asarray(runner.state.params["params"]["scaling_layer"]["kernel"])
    assert not np.allclose(p0, p1), "training must update parameters"

    # final save happened; payload has the reference keys
    ckpt_path = find_resume_ckpt(str(tmp_path))
    payload = load_checkpoint(ckpt_path)
    assert set(payload) >= {"Downstream", "Optimizer", "Global_step", "Settings"}
    assert payload["Global_step"] == 5

    # evaluate returns (loss, scores, wavs x3) with finite device metrics
    loss, scores, noisy, clean, enhanced = runner.evaluate()
    assert np.isfinite(loss)
    assert len(scores) == 2 and np.isfinite(scores).all()
    assert len(enhanced) >= 1 and enhanced[0].ndim == 1

    # resume restores step + params
    runner2, _, _ = make_runner(corpus, tmp_path, resume=str(tmp_path))
    assert runner2.global_step == 5
    np.testing.assert_allclose(
        np.asarray(runner2.state.params["params"]["scaling_layer"]["kernel"]),
        p1, atol=1e-6,
    )


def test_non_finite_guard_skips_update(corpus, tmp_path):
    runner, *_ = make_runner(corpus, tmp_path)
    import jax

    wavs = jnp.full((2, 3, 16000), jnp.nan)
    lengths = jnp.asarray([16000, 16000])
    p0 = np.asarray(runner.state.params["params"]["scaling_layer"]["kernel"]).copy()
    state, stats = runner.train_step(
        runner.state, wavs, lengths, jax.random.PRNGKey(0)
    )
    assert bool(stats["skipped"])
    np.testing.assert_array_equal(
        np.asarray(state.params["params"]["scaling_layer"]["kernel"]), p0
    )


def test_sisdr_objective_end_to_end(corpus, tmp_path):
    runner, *_ = make_runner(corpus, tmp_path, objective="SISDR")
    runner.train()
    assert runner.global_step == 5


def test_save_best_per_split(corpus, tmp_path):
    """--save_best writes per-split checkpoints on metric improvement
    (/root/reference/runner.py:335-338 semantics)."""
    runner, config, args = make_runner(corpus, tmp_path, save_best=True)
    runner.rconfig["eval_splits"] = ["dev"]
    runner.rconfig["eval_step"] = 2
    runner.train()
    best_dir = os.path.join(str(tmp_path), "dev")
    assert os.path.isdir(best_dir)
    assert any(f.startswith("states-") for f in os.listdir(best_dir))


def test_reference_metric_trio_eval(corpus, tmp_path):
    """vcb.yaml's default eval_metrics ['stoi','pesq_nb','sisdr'] all
    compute on device through the Runner."""
    runner, *_ = make_runner(corpus, tmp_path)
    runner.metric_names = ["stoi", "pesq_nb", "sisdr"]
    from speech_enhancement_by_s3prl_tpu.metrics import build_metrics

    runner.metrics = build_metrics(runner.metric_names)
    runner.rconfig["eval_metrics"] = runner.metric_names
    runner.set_model()
    loss, scores, *_ = runner.evaluate()
    assert len(scores) == 3
    assert np.isfinite(scores).all(), scores
    assert 1.0 <= scores[1] <= 5.0  # pesq MOS range


def test_profile_trace_written(corpus, tmp_path):
    """--profile traces one train step to expdir/profile
    (SURVEY.md section 5: tracing/profiling rebuild)."""
    runner, config, args = make_runner(corpus, tmp_path)
    runner.args.profile = True
    runner.rconfig["profile_step"] = 2
    runner.train()
    pdir = os.path.join(str(tmp_path), "profile")
    assert os.path.isdir(pdir)
    found = []
    for dirpath, _, names in os.walk(pdir):
        found += names
    assert found, "no trace files written"


def test_warm_start_downstream_torch_ckpt(corpus, tmp_path):
    """--dckpt warm start from a TORCH checkpoint (reference
    run_downstream.py:212-217 'SmallModel'/'Downstream' formats)."""
    import torch
    import torch.nn as tnn

    class TorchLSTMHead(tnn.Module):
        def __init__(self):
            super().__init__()
            self.lstm = tnn.LSTM(201, 8, num_layers=1, batch_first=True)
            self.scaling_layer = tnn.Sequential(tnn.Linear(8, 201), tnn.ReLU())

    torch.manual_seed(0)
    head = TorchLSTMHead()
    dckpt = str(tmp_path / "torch_head.ckpt")
    torch.save({"Downstream": head.state_dict()}, dckpt)

    runner, *_ = make_runner(corpus, tmp_path, dckpt=dckpt)
    got = np.asarray(runner.state.params["params"]["scaling_layer"]["kernel"])
    want = head.scaling_layer[0].weight.detach().numpy().T
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_dataset_mode_factory_branches(corpus, tmp_path):
    """subtrain (finite copy), query_dev (pseudo-mode dev split) and the
    unknown-mode guard (/root/reference/runner.py:154-200 surface)."""
    from speech_enhancement_by_s3prl_tpu.models.upstream import (
        DummyUpstream,
    )

    runner, *_ = make_runner(corpus, tmp_path)
    sub = runner.get_dataset("subtrain")
    assert len(sub) > 0

    # query_dev needs pseudo wavs -> give the runner a spec-head upstream
    from tests.test_active import small_upstream

    runner.upstream_model = runner.upstream_model2 = small_upstream()
    qd = runner.get_dataset("query_dev")
    wavs, case = qd[0]
    assert case == 3

    with pytest.raises(ValueError, match="unknown dataset mode"):
        runner.get_dataset("nope")
