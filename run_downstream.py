#!/usr/bin/env python
"""CLI for downstream speech-enhancement training/evaluation.

Drop-in replacement for the reference entry point
(/root/reference/run_downstream.py): the same flag vocabulary, YAML config
format, resume semantics (checkpoint snapshot of args+config wins over CLI,
run_downstream.py:94-106), CLI file-list overrides (run_downstream.py:89-93)
and wandb hooks — wired to the TPU-native runner. Differences, per
SURVEY.md section 2.10: explicit registries instead of eval(), and
``--trainset`` is a real flag (defaulting to OnlineDataset) instead of a
resume-only ghost.
"""
import argparse
import os
import random
import sys
from importlib import import_module

import numpy as np
import yaml

REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO_ROOT)

from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.models.upstream import build_upstream
from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.runner.checkpoint import (
    find_resume_ckpt,
    load_checkpoint,
)
from speech_enhancement_by_s3prl_tpu.utils.config import update_args


def get_downstream_args():
    parser = argparse.ArgumentParser(
        description="TPU-native S3PRL-style speech-enhancement downstream"
    )
    parser.add_argument("--resume", help="checkpoint path/dir for continual training")

    parser.add_argument("--name", help="experiment name")
    parser.add_argument("--n_jobs", default=4, type=int)
    parser.add_argument("--dev_num", default=500, type=int)

    # upstream settings
    parser.add_argument("--upstream", choices=["transformer", "baseline"],
                        default="transformer")
    parser.add_argument("--ckpt", default="", help="upstream pretrained ckpt")
    parser.add_argument("--dropout", type=float)

    # upstream2 settings
    parser.add_argument("--upstream2", choices=["transformer", "baseline"],
                        default="transformer")
    parser.add_argument("--ckpt2", default="", help="2nd upstream pretrained ckpt")
    parser.add_argument("--dropout2", type=float)

    # how to use upstreams
    parser.add_argument("--pseudo_clean", action="store_true")
    parser.add_argument("--pseudo_noise", action="store_true")

    # downstream options
    parser.add_argument("--downstream", default="LSTM")
    parser.add_argument("--dckpt", default="", help="downstream warm-start ckpt")
    parser.add_argument("--objective", default="L1")
    parser.add_argument("--from_waveform", action="store_true")
    parser.add_argument("--from_rawfeature", action="store_true")
    parser.add_argument("--trainset", default="OnlineDataset",
                        help="dataset class for train/query splits")

    parser.add_argument("--optim", default="BertAdam", choices=["BertAdam", "Adam"])

    parser.add_argument("--config", default="config/vcb.yaml")
    parser.add_argument("--expdir", default="result")
    parser.add_argument("--seed", default=1337, type=int)
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument(
        "--compute_dtype", default="f32", choices=["f32", "bf16"],
        help="matmul/activation compute dtype for the upstream and the "
        "downstream head (losses, metrics, layer norms and optimizer "
        "state stay f32). bf16 is the measured TPU throughput "
        "configuration (docs/PERF.md); f32 keeps reference numerics",
    )
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--eval_init", action="store_true")
    parser.add_argument("--no_metric", action="store_true")
    parser.add_argument("--save_best", action="store_true")

    parser.add_argument("--active_sampling", action="store_true")
    parser.add_argument("--record_num", default=5, type=int)
    parser.add_argument("--sampler_device", type=int)
    parser.add_argument("--active_layerid", type=int)
    parser.add_argument("--n_iterate", type=int)
    parser.add_argument("--sync_sampler", action="store_true")

    parser.add_argument("--train_speech")
    parser.add_argument("--train_noise")
    parser.add_argument("--test_speech")
    parser.add_argument("--test_noise")

    parser.add_argument("--test", action="store_true")
    parser.add_argument("--test_gradient", action="store_true")
    parser.add_argument("--profile", action="store_true",
                        help="trace one train step to expdir/profile")
    parser.add_argument("--mesh", default=None,
                        help="DxM device mesh for dp x tp training, e.g. 4x2")

    args = parser.parse_args()

    if args.resume is None:
        setattr(args, "gpu", not args.cpu)
        with open(args.config) as f:
            config = yaml.safe_load(f)
        # CLI overrides of dataset file lists (run_downstream.py:89-93)
        for overwrite in ["train_speech", "train_noise", "test_speech", "test_noise"]:
            filestrs = getattr(args, overwrite)
            if filestrs is None:
                continue
            dataset_type, data_type = overwrite.split("_")
            section = f"OnlineDataset_{dataset_type}"
            config.setdefault(section, {}).setdefault(data_type, {})[
                "filestrs"
            ] = filestrs
    else:
        resume_ckpt = find_resume_ckpt(args.resume)
        payload = load_checkpoint(resume_ckpt)
        args = update_args(args, payload["Settings"]["Paras"])
        config = payload["Settings"]["Config"]
        setattr(args, "resume", resume_ckpt)

    if args.wandb:
        try:
            wandb = import_module("wandb")
        except ModuleNotFoundError as e:
            raise SystemExit(
                "--wandb requires the wandb package (not installed in this "
                "environment); TensorBoard logging is always on"
            ) from e
        if getattr(args, "wandbid", None) is None:
            wandb.init(name=args.name, sync_tensorboard=True)
            setattr(args, "wandbid", wandb.run.id)
            wandb.config.update({"args": vars(args), "config": config})
        else:
            wandb.init(name=args.name, resume=args.wandbid, sync_tensorboard=True)

    return args, config


def _pretrain_config(args):
    """The pretraining-stage config defining the preprocessor
    (/root/reference/run_downstream.py:126-134)."""
    if args.ckpt != "":
        import torch

        return torch.load(args.ckpt, map_location="cpu", weights_only=False)[
            "Settings"
        ]["Config"]
    with open(os.path.join(REPO_ROOT, "config", "pretrain_sample.yaml")) as f:
        return yaml.safe_load(f)


def get_preprocessor(args, config):
    pretrain_config = _pretrain_config(args)

    if args.upstream == "transformer":
        upstream_feat = dict(pretrain_config["online"]["input"])
    else:
        upstream_feat = dict(config["preprocessor"]["baseline"])

    if args.dckpt != "":
        try:
            dpayload = load_checkpoint(args.dckpt)
            dconfig = dpayload["Settings"]["Config"]
        except Exception:
            import torch

            dconfig = torch.load(args.dckpt, map_location="cpu", weights_only=False)[
                "Settings"
            ]["Config"]
        if "online" in dconfig:
            downstream_feat = dict(dconfig["online"]["input"])
        else:
            downstream_feat = dict(dconfig["preprocessor"]["baseline"])
    else:
        downstream_feat = dict(config["preprocessor"]["baseline"])

    channel_inp = config["preprocessor"]["input_channel"]
    channel_tar = config["preprocessor"]["target_channel"]
    upstream_feat["channel"] = channel_inp
    downstream_feat["channel"] = channel_inp

    # phase carriers use 'uphase' (packed [re|im], a free slice of the
    # STFT) instead of radians: istft consumes either, the waveforms are
    # identical (tests/test_uphase.py), and the radian form costs an
    # arctan2 + cos/sin round trip over the full spectrogram
    feat_list = [
        upstream_feat,
        downstream_feat,
        get_feat_config("linear", channel_inp),
        get_feat_config("uphase", channel_inp),
        get_feat_config("linear", channel_tar),
        get_feat_config("uphase", channel_tar),
    ]
    preprocessor = OnlinePreprocessor(
        **pretrain_config["online"], feat_list=feat_list
    )
    preprocessor.channel_inp = channel_inp
    preprocessor.channel_tar = channel_tar

    dims = preprocessor.feat_dims()
    return preprocessor, dims[0], dims[1], dims[4]


def get_downstream_model(args, input_dim, output_dim, config):
    if args.dckpt == "":
        model_config = config.get("model", {}).get(args.downstream, {}) or {}
    else:
        model_config = {}
        if args.downstream != "Mockingjay":
            try:
                dpayload = load_checkpoint(args.dckpt)
                dconfig = dpayload["Settings"]["Config"]
                dparas = dpayload["Settings"]["Paras"]
            except Exception:
                import torch

                t = torch.load(args.dckpt, map_location="cpu", weights_only=False)
                dconfig = t["Settings"]["Config"]
                dparas = vars(t["Settings"]["Paras"]) if not isinstance(
                    t["Settings"]["Paras"], dict
                ) else t["Settings"]["Paras"]
            if "small_model" in dconfig:
                model_config = dconfig["small_model"]["model"]
            else:
                down = dparas.get("downstream", args.downstream) if isinstance(
                    dparas, dict
                ) else args.downstream
                model_config = dconfig["model"][down]

    configs = dict(vars(args))
    configs.update(model_config)
    return build_head(
        args.downstream, input_size=input_dim, output_size=output_dim, **configs
    )


def main():
    args, config = get_downstream_args()

    random.seed(args.seed)
    np.random.seed(args.seed)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    # SE_PRNG=rbg: hardware-RNG dropout keys — threefry mask generation
    # is the dominant cost of attention-dropout finetuning at scale
    # (docs/PERF.md Mockingjay section). Default stays threefry.
    if os.environ.get("SE_PRNG"):
        jax.config.update("jax_default_prng_impl", os.environ["SE_PRNG"])

    if getattr(args, "mesh", None):
        # multi-host pods: one-call jax.distributed setup (no-op for
        # single-process runs); the mesh itself is built in Runner.set_model
        from speech_enhancement_by_s3prl_tpu.parallel.distributed import (
            initialize_distributed,
            topology_summary,
        )

        if initialize_distributed():
            print(f"[distributed] {topology_summary()}", flush=True)
        if args.cpu:
            # CPU backend: provision enough virtual devices for the mesh
            # (SURVEY.md section 4 — multi-device code is testable without
            # TPUs via XLA host-device emulation). Must run before the
            # first backend query (e.g. setup_compile_cache below).
            need = 1
            for part in str(args.mesh).lower().split("x"):
                need *= int(part)
            jax.config.update("jax_num_cpu_devices", need)

    # persistent XLA compile cache (TPU only: remote compiles are expensive;
    # CPU AOT cache entries can abort on machine-feature mismatch)
    from speech_enhancement_by_s3prl_tpu.utils.config import (
        setup_compile_cache,
    )

    setup_compile_cache()

    expdir = os.path.join(args.expdir, args.name or "default")
    os.makedirs(expdir, exist_ok=True)

    preprocessor, upstream_dim, downstream_dim, tar_linear_dim = get_preprocessor(
        args, config
    )

    # resume snapshots from before the flag default to f32
    compute_dtype = getattr(args, "compute_dtype", "f32")
    upstream_model = build_upstream(
        args.upstream, upstream_dim, args.ckpt, args.dropout, tar_linear_dim,
        compute_dtype=compute_dtype,
    )
    upstream_model2 = build_upstream(
        args.upstream2, upstream_dim, args.ckpt2, args.dropout2, tar_linear_dim,
        compute_dtype=compute_dtype,
    )

    if args.from_waveform:
        # internal-extraction semantics: the model sees the upstream-input
        # features (see runner/trainer.py _down_inp)
        downstream_inpdim = upstream_dim
    elif args.from_rawfeature:
        downstream_inpdim = downstream_dim
    else:
        downstream_inpdim = upstream_model.out_dim
    downstream_model = get_downstream_model(
        args, downstream_inpdim, tar_linear_dim, config
    )

    from speech_enhancement_by_s3prl_tpu.runner.runner import Runner

    runner = Runner(
        args=args,
        config=config,
        preprocessor=preprocessor,
        upstream=upstream_model,
        upstream2=upstream_model2,
        downstream=downstream_model,
        expdir=expdir,
    )
    runner.set_model()

    if args.test:
        runner.evaluate()
    elif args.test_gradient:
        runner.test_gradient()
    else:
        runner.train()


if __name__ == "__main__":
    main()
