#!/usr/bin/env python
"""Reference-scale endurance run: 20,000 steps at the active.yaml cadence.

The reference trains total_step=20000 (/root/reference/config/vcb.yaml);
short CI-style runs never exercise the long-horizon lifecycle. This
script runs ONE continuous training at the reference cadence — log 500 /
eval 1000 / save 2000 / media 4000 / sampler_refresh 50 /
active_refresh 10, with --active_sampling --sync_sampler --save_best —
on a synthetic corpus, and verifies the behaviors that only show up over
hours:

- checkpoint rotation honors max_keep with per-split best ckpts kept;
- every cadence fires the expected number of times (TB scalar counts);
- host RSS stays bounded (no loader/sampler/TB leak): polled every 30 s
  from outside the process, asserted < --rss_budget_mb of drift between
  the post-warmup plateau and the end;
- metric curves move the right way (loss down; eval metrics recorded
  into an extract_results-compatible CSV).

The model is deliberately small (--hidden/--layers) so 20k steps fit a
single CPU core in ~1-2 h: this is a lifecycle soak, not a quality run
(quality evidence lives in docs/EXPERIMENTS.md). Run on TPU hardware the
same script works unmodified (drop --cpu) but mind the one-client-per-
tunnel rule.

Usage:
  python scripts/endurance_run.py --workdir /tmp/endurance [--steps 20000]
      [--hidden 64] [--layers 1] [--cpu] [--rss_budget_mb 1500]
"""
from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time

import numpy as np
import yaml

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def pretrain_upstreams(args, wd: str) -> dict:
    """The reference's --ckpt/--ckpt2 pair (noisy2clean / noisy2noise),
    pretrained in-framework — the active sampler's pseudo-wav builds
    need a SpecHead-bearing upstream (runner._build_pseudo_wavs)."""
    import glob as globlib

    import pretrain_upstream

    pre_cfg = {
        "transformer": {
            "input_dim": 201, "downsample_rate": 1,
            "hidden_size": args.up_hidden, "num_hidden_layers": 2,
            "num_attention_heads": 2, "intermediate_size": 2 * args.up_hidden,
            "hidden_act": "gelu", "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0, "initializer_range": 0.02,
            "layer_norm_eps": "1e-12", "share_layer": False,
            "max_input_length": 0,
        },
        "online": {
            "sample_rate": 16000, "max_time": args.max_time,
            "target_level": -25, "win_ms": 25, "hop_ms": 10, "n_freq": 201,
            "n_mels": 40, "n_mfcc": 13,
            "input": {"feat_type": "linear", "channel": 0, "log": True,
                      "delta": 0, "cmvn": True},
            "target": {"feat_type": "linear", "channel": 1, "log": True,
                       "delta": 0, "cmvn": False},
        },
    }
    pre_path = os.path.join(wd, "pretrain.yaml")
    yaml.safe_dump(pre_cfg, open(pre_path, "w"))
    ups = {}
    for name, tch in [("noisy2clean", 1), ("noisy2noise", 2)]:
        done = globlib.glob(
            os.path.join(wd, "upstreams", name, "states-*.ckpt"))
        if done:
            ups[name] = done[0]
            continue
        ups[name] = pretrain_upstream.main([
            "--name", name, "--expdir", os.path.join(wd, "upstreams"),
            "--config", pre_path,
            "--speech", os.path.join(wd, "corpus", "speech_train"),
            "--noise", os.path.join(wd, "corpus", "noise_pool"),
            "--target_channel", str(tch),
            "--total_step", str(args.up_steps),
            "--batch_size", "4", "--seed", "0",
        ] + (["--cpu"] if args.cpu else []))
    return ups


def build_config(args, wd: str) -> str:
    """The adaptation experiment's config shape at the ACTIVE.YAML
    cadence: log 500 / eval 1000 / save 2000 / media 4000 /
    sampler_refresh 50 / active_refresh 10 all fire many times over
    20k steps."""
    from types import SimpleNamespace

    from experiment_active_adaptation import downstream_config

    exp_args = SimpleNamespace(
        batch_size=4, active_batch_size=8, query_num=8,
        learning_rate=4e-4, max_time=args.max_time, snrs=[-4, 0, 4],
        objective="L1", hidden=args.hidden,
    )
    cfg = downstream_config(
        wd, exp_args,
        train_noise=os.path.join(wd, "corpus", "noise_pool"),
        test_noise=os.path.join(wd, "corpus", "noise_target"),
        total_step=args.steps,
        pseudo_modes=[0, 1, 2, 3],
    )
    cfg["model"]["LSTM"]["num_layers"] = args.layers
    cfg["runner"].update(
        log_step=500, eval_step=1000, save_step=2000, media_step=4000,
        max_keep=args.max_keep, sampler_refresh_step=50,
        sampler_collect_step=25, sampler_sample_num=10,
        active_refresh_step=10,
        eval_splits=["subtrain", "dev", "query_dev", "test"],
    )
    path = os.path.join(args.workdir, "endurance.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    return path


def monitor(proc: subprocess.Popen, rss_csv: str, poll_s: float):
    """Poll the child's RSS (plus its children: loader threads live in-
    process, but a future multi-process loader would too) every poll_s."""
    t0 = time.monotonic()
    with open(rss_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["wall_s", "rss_mb"])
        while proc.poll() is None:
            try:
                with open(f"/proc/{proc.pid}/status") as st:
                    for line in st:
                        if line.startswith("VmRSS"):
                            kb = int(line.split()[1])
                            w.writerow(
                                [round(time.monotonic() - t0, 1),
                                 round(kb / 1024.0, 1)]
                            )
                            f.flush()
                            break
            except FileNotFoundError:
                break
            time.sleep(poll_s)
    return proc.wait()


def tb_scalars(expdir: str) -> dict:
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    for root, _dirs, files in os.walk(expdir):
        for fn in files:
            if fn.startswith("events.out"):
                acc = EventAccumulator(root)
                acc.Reload()
                return {
                    tag: [(s.step, s.value) for s in acc.Scalars(tag)]
                    for tag in acc.Tags()["scalars"]
                }
    return {}


def analyze(args, expdir: str, rss_csv: str) -> dict:
    scalars = tb_scalars(expdir)
    report: dict = {"steps": args.steps, "checks": {}, "curves": {}}

    def check(name, ok, detail):
        report["checks"][name] = {"ok": bool(ok), "detail": detail}
        print(f"[endurance] {'PASS' if ok else 'FAIL'} {name}: {detail}")

    # cadences fired the expected number of times
    loss_tags = [t for t in scalars if t.endswith("loss") and "eval" not in t]
    train_pts = max((len(scalars[t]) for t in loss_tags), default=0)
    check("log_cadence", train_pts >= args.steps // 500,
          f"{train_pts} train-loss points (expect >= {args.steps // 500})")
    eval_tags = [t for t in scalars if "dev" in t or "test" in t]
    n_evals = max((len(scalars[t]) for t in eval_tags), default=0)
    check("eval_cadence", n_evals >= args.steps // 1000,
          f"{n_evals} eval points across {len(eval_tags)} tags "
          f"(expect >= {args.steps // 1000})")

    # loss moved down
    if loss_tags:
        pts = scalars[loss_tags[0]]
        first, last = pts[0][1], pts[-1][1]
        check("loss_decreases", last < first,
              f"{loss_tags[0]}: {first:.4f} -> {last:.4f}")
        report["curves"]["loss"] = pts

    # checkpoint rotation: rotating states-*.ckpt capped at max_keep;
    # best-* per split survive
    name_dir = None
    for d in os.listdir(expdir):
        if os.path.isdir(os.path.join(expdir, d)):
            name_dir = os.path.join(expdir, d)
    ckpts = sorted(os.listdir(name_dir)) if name_dir else []
    rotating = [c for c in ckpts if c.startswith("states-")
                and os.path.isfile(os.path.join(name_dir, c))]
    # per-split best ckpts live in SPLIT SUBDIRECTORIES (reference
    # layout: expdir/<name>/<split>/states-*.ckpt, runner.save_states
    # with the split name), not under a best- prefix
    best = {
        d: sorted(os.listdir(os.path.join(name_dir, d)))
        for d in ckpts
        if os.path.isdir(os.path.join(name_dir, d))
    }
    n_best = sum(len(v) for v in best.values())
    check("ckpt_rotation", 0 < len(rotating) <= args.max_keep,
          f"{len(rotating)} rotating (max_keep={args.max_keep})")
    check("save_best_per_split", n_best > 0 and all(
        0 < len(v) <= args.max_keep for v in best.values()),
        f"{n_best} best ckpts across {len(best)} splits "
        f"(each capped at max_keep): "
        + ", ".join(f"{d}={len(v)}" for d, v in sorted(best.items())))

    # RSS plateau: compare the median of the 2nd quarter (post-warmup)
    # to the median of the last quarter
    rows = list(csv.DictReader(open(rss_csv)))
    rss = np.array([float(r["rss_mb"]) for r in rows])
    if len(rss) >= 8:
        q = len(rss) // 4
        plateau, tail = float(np.median(rss[q:2 * q])), float(
            np.median(rss[-q:])
        )
        drift = tail - plateau
        check("rss_bounded", drift < args.rss_budget_mb,
              f"plateau {plateau:.0f} MB -> tail {tail:.0f} MB "
              f"(drift {drift:+.0f} MB, budget {args.rss_budget_mb})")
        report["rss"] = {"plateau_mb": plateau, "tail_mb": tail,
                         "drift_mb": drift, "peak_mb": float(rss.max()),
                         "samples": len(rss)}
    else:
        check("rss_bounded", False, f"only {len(rss)} RSS samples")

    # extract_results-compatible CSV of the eval curves
    curves_csv = os.path.join(args.workdir, "eval_curves.csv")
    with open(curves_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["tag", "step", "value"])
        for tag in sorted(eval_tags):
            for step, value in scalars[tag]:
                w.writerow([tag, step, value])
    report["eval_curves_csv"] = curves_csv
    report["ok"] = all(c["ok"] for c in report["checks"].values())
    return report


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/endurance")
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--up_hidden", type=int, default=64)
    ap.add_argument("--up_steps", type=int, default=300)
    ap.add_argument("--max_time", type=int, default=2000)
    ap.add_argument("--max_keep", type=int, default=3)
    ap.add_argument("--rss_budget_mb", type=float, default=1500.0)
    ap.add_argument("--poll_s", type=float, default=30.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--analyze_only", action="store_true",
                    help="re-run the checks on an existing workdir")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    expdir = os.path.join(args.workdir, "exp")
    rss_csv = os.path.join(args.workdir, "rss.csv")

    if not args.analyze_only:
        import jax

        if args.cpu:
            jax.config.update("jax_platforms", "cpu")
        wd = os.path.abspath(args.workdir)
        corpus = os.path.join(wd, "corpus")
        if not os.path.isdir(corpus):
            from experiment_active_adaptation import gen_corpus

            os.makedirs(corpus, exist_ok=True)
            gen_corpus(corpus, np.random.default_rng(0))
        ups = pretrain_upstreams(args, wd)
        cfg_path = build_config(args, wd)
        cmd = [
            sys.executable, os.path.join(REPO_ROOT, "run_downstream.py"),
            "--name", "endurance", "--config", cfg_path,
            "--upstream", "transformer", "--ckpt", ups["noisy2clean"],
            "--upstream2", "transformer", "--ckpt2", ups["noisy2noise"],
            "--from_rawfeature", "--downstream", "LSTM",
            "--objective", "L1", "--expdir", expdir,
            "--dev_num", "3", "--record_num", "4", "--n_jobs", "2",
            "--active_sampling", "--sync_sampler", "--save_best",
        ] + (["--cpu"] if args.cpu else [])
        print("[endurance] launching:", " ".join(cmd))
        t0 = time.monotonic()
        with open(os.path.join(args.workdir, "train.log"), "w") as log:
            proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT,
                                    cwd=REPO_ROOT)
            rc = monitor(proc, rss_csv, args.poll_s)
        wall = time.monotonic() - t0
        print(f"[endurance] training exited rc={rc} after {wall / 60:.1f} min")
        if rc != 0:
            print("[endurance] tail of train.log:")
            print("".join(open(
                os.path.join(args.workdir, "train.log")).readlines()[-30:]))
            sys.exit(rc)

    report = analyze(args, expdir, rss_csv)
    out = os.path.join(args.workdir, "report.json")
    json.dump(report, open(out, "w"), indent=1)
    print(f"[endurance] report -> {out} ok={report['ok']}")
    sys.exit(0 if report["ok"] else 1)


if __name__ == "__main__":
    main()
