#!/usr/bin/env python
"""Upstream pretraining CLI.

The reference consumes S3PRL ``states-*.ckpt`` upstreams (noisy2clean /
noisy2noise spec-prediction transformers, /root/reference/run_active.sh)
but outsources *producing* them to the external S3PRL repo. This script
closes that loop in-framework:

1. random-initialise an encoder+SpecHead from a pretraining YAML
   (config/pretrain_sample.yaml schema) and write it as a SEED S3PRL-layout
   checkpoint (models/torch_export.py) — construction path = production
   path;
2. train it as the Mockingjay downstream (exactly encoder+SpecHead,
   models/spec_head.py) through the ordinary ``run_downstream.py`` stack:
   OnlineDataset mixing, BertAdam, the jitted train step — predicting the
   spec of ``--target_channel`` (1 = clean -> a noisy2clean upstream,
   2 = scaled noise -> noisy2noise);
3. export the trained weights back to an S3PRL-layout ``states-<step>.ckpt``
   consumable by ``--ckpt``/``--ckpt2`` (here and in the reference stack).

Example (the two upstreams of the active-learning experiment):

    python scripts/pretrain_upstream.py --name noisy2clean \
        --config config/pretrain_sample.yaml --expdir exp/up \
        --speech corpus/speech --noise corpus/noise --target_channel 1 \
        --total_step 400 --cpu
"""
from __future__ import annotations

import argparse
import glob
import os
import re
import sys

import yaml

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def build_run_config(pretrain: dict, args) -> dict:
    """Downstream-run config (the vcb.yaml schema) for the pretraining run.

    The downstream input feature comes from the seed checkpoint's
    ``online.input`` (run_downstream.get_preprocessor dckpt branch), so
    ``preprocessor.baseline`` here only covers the no-dckpt fallback."""
    online = pretrain["online"]
    baseline = {
        k: v for k, v in online["input"].items() if k != "channel"
    }
    ds_common = dict(
        speech={"filestrs": args.speech},
        noise={"filestrs": args.noise},
        sample_rate=online.get("sample_rate", 16000),
        max_time=online.get("max_time", 10000),
        target_level=online.get("target_level", -25),
        snrs=list(args.snrs),
    )
    return {
        "dataloader": {
            "batch_size": args.batch_size,
            "eval_batch_size": args.batch_size,
            "active_batch_size": args.batch_size,
        },
        "preprocessor": {
            "input_channel": 0,
            "target_channel": args.target_channel,
            "baseline": baseline,
        },
        "runner": {
            "learning_rate": args.learning_rate,
            "warmup_proportion": 0.07,
            "gradient_clipping": 1.0,
            "total_step": args.total_step,
            "log_step": max(args.total_step // 10, 1),
            "eval_step": args.total_step * 10,  # no mid-run eval
            "save_step": args.total_step,
            "max_keep": 2,
            "eval_splits": [],
            "eval_metrics": ["sisdr"],
        },
        "objective": {args.objective: {}},
        "model": {},
        "OnlineDataset_train": {**ds_common, "infinite": True},
        "OnlineDataset_test": {**ds_common, "half_noise": "end"},
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--name", required=True)
    ap.add_argument("--expdir", required=True)
    ap.add_argument("--config", default=os.path.join(REPO_ROOT, "config",
                                                     "pretrain_sample.yaml"),
                    help="pretraining YAML (transformer + online sections)")
    ap.add_argument("--speech", required=True, help="speech filestrs")
    ap.add_argument("--noise", required=True, help="noise filestrs")
    ap.add_argument("--target_channel", type=int, default=1, choices=[1, 2],
                    help="1: predict clean spec (noisy2clean), "
                         "2: predict noise spec (noisy2noise)")
    ap.add_argument("--objective", default="L1")
    ap.add_argument("--total_step", type=int, default=400)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--learning_rate", type=float, default=4e-4)
    ap.add_argument("--snrs", type=float, nargs="+", default=[-4, 0, 4])
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from speech_enhancement_by_s3prl_tpu.models.torch_export import save_s3prl_ckpt
    from speech_enhancement_by_s3prl_tpu.models.torch_import import (
        _feat_dim_from_online,
    )
    from speech_enhancement_by_s3prl_tpu.models.transformer import TransformerConfig
    from speech_enhancement_by_s3prl_tpu.models.upstream import UpstreamTransformer

    with open(args.config) as f:
        pretrain = yaml.safe_load(f)
    online = pretrain["online"]
    online["input"] = {**online["input"], "channel": 0}
    online["target"] = {**online["target"], "channel": args.target_channel}

    # architecture input width follows the online input feature (the S3PRL
    # convention: transformer.input_dim is derived, not trusted)
    input_dim = _feat_dim_from_online(online, "input")
    target_dim = _feat_dim_from_online(online, "target")
    pretrain["transformer"]["input_dim"] = input_dim
    cfg = TransformerConfig.from_dict(pretrain)
    log_domain = bool(online["target"].get("log", False))

    expdir = os.path.join(args.expdir, args.name)
    os.makedirs(expdir, exist_ok=True)

    seed_up = UpstreamTransformer(
        cfg, input_dim=input_dim, output_size=target_dim, seed=args.seed,
        log_domain=log_domain,
    )
    seed_path = os.path.join(expdir, "seed.ckpt")
    save_s3prl_ckpt(
        seed_path, pretrain,
        encoder_params=seed_up.params["encoder"],
        spechead_params=seed_up.params["spechead"],
        global_step=0,
        paras={"pretrain_upstream": vars(args)},
    )
    print(f"[pretrain_upstream] seed checkpoint: {seed_path}", flush=True)

    run_cfg = build_run_config(pretrain, args)
    cfg_path = os.path.join(expdir, "run_config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(run_cfg, f)

    import run_downstream

    argv_run = [
        "--name", "train",
        "--config", cfg_path,
        "--expdir", expdir,
        "--upstream", "baseline",
        "--upstream2", "baseline",
        "--from_rawfeature",
        "--downstream", "Mockingjay",
        "--dckpt", seed_path,
        "--objective", args.objective,
        "--seed", str(args.seed),
        "--dev_num", "0",
    ]
    if args.cpu:
        argv_run.append("--cpu")
    old_argv = sys.argv
    sys.argv = [os.path.join(REPO_ROOT, "run_downstream.py")] + argv_run
    try:
        run_downstream.main()
    finally:
        sys.argv = old_argv

    # export the trained downstream (mockingjay + spechead) as S3PRL layout
    from speech_enhancement_by_s3prl_tpu.runner.checkpoint import load_checkpoint

    ckpts = glob.glob(os.path.join(expdir, "train", "states-*.ckpt"))
    assert ckpts, f"no states-*.ckpt produced under {expdir}/train"
    last = max(ckpts, key=lambda p: int(re.search(r"states-(\d+)", p).group(1)))
    payload = load_checkpoint(last)
    tree = payload["Downstream"]
    if "params" in tree:
        tree = tree["params"]
    step = int(payload.get("Global_step", args.total_step))
    out_path = os.path.join(expdir, f"states-{step}.ckpt")
    save_s3prl_ckpt(
        out_path, pretrain,
        encoder_params=tree["mockingjay"],
        spechead_params=tree["spechead"],
        global_step=step,
        paras={"pretrain_upstream": vars(args)},
    )
    print(f"[pretrain_upstream] exported upstream: {out_path}", flush=True)
    return out_path


if __name__ == "__main__":
    main()
