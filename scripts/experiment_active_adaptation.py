#!/usr/bin/env python
"""The reference's headline experiment, reproduced end-to-end on synthetic
data: ACTIVE (gradient-matched) vs UNIFORM sample selection for adapting an
enhancement head to an unseen noise domain (/root/reference/run_active.sh
vs run_uniform.sh).

Pipeline (every stage is this framework's production path):

1. synthesize a corpus: formant-harmonic "speech"; three noise domains —
   white + pink (SOURCE) and tonal bell-like bursts (TARGET, held out);
2. pretrain the two upstreams in-framework (scripts/pretrain_upstream.py):
   noisy2clean (--target_channel 1) and noisy2noise (--target_channel 2)
   — the reference's --ckpt/--ckpt2 pair;
3. pretrain the downstream LSTM head on SOURCE-domain mixtures (the
   reference's --dckpt warm start);
4. adapt to the TARGET domain for the same step budget twice from the same
   warm start: with --active_sampling --sync_sampler (gradient-embedding
   matching against the pseudo-target query, buffer resampling) and
   without (uniform stream) — identical configs otherwise, exactly the
   run_active.sh / run_uniform.sh contrast;
5. measure (a) selection enrichment: per-noise-domain match rates of the
   sync sampler on real (case-1) candidates, (b) adaptation outcome:
   init/final STOI / PESQ-NB / SI-SDR on target-domain test mixtures.

Writes <workdir>/results.json and prints a summary table.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np
import yaml

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


# ---------------------------------------------------------------- corpus --

def _speech(rng, n_samp, sr=16000):
    """Formant-enveloped harmonic utterance with syllabic amplitude
    modulation — the synthetic 'speech' of docs/PERF.md's quality runs."""
    t = np.arange(n_samp) / sr
    f0 = rng.uniform(110, 280)
    x = np.zeros(n_samp)
    formants = rng.uniform([400, 1200], [900, 2600])
    for k in range(1, 12):
        fk = f0 * k
        if fk > sr / 2 - 200:
            break
        env = sum(np.exp(-0.5 * ((fk - fc) / 350.0) ** 2) for fc in formants)
        x += (env + 0.05) / k * np.sin(2 * np.pi * fk * t + rng.uniform(0, 6.28))
    syll = 0.55 + 0.45 * np.sin(2 * np.pi * rng.uniform(2.5, 5.0) * t
                                + rng.uniform(0, 6.28))
    x *= syll
    return (x / (np.abs(x).max() + 1e-9) * 0.5).astype(np.float32)


def _white(rng, n_samp):
    x = rng.standard_normal(n_samp)
    return (x / (np.abs(x).max() + 1e-9) * 0.5).astype(np.float32)


def _pink(rng, n_samp):
    spec = np.fft.rfft(rng.standard_normal(n_samp))
    f = np.maximum(np.fft.rfftfreq(n_samp), 1.0 / n_samp)
    x = np.fft.irfft(spec / np.sqrt(f * n_samp), n_samp)
    return (x / (np.abs(x).max() + 1e-9) * 0.5).astype(np.float32)


def _tonal(rng, n_samp, sr=16000):
    """Bell-like bursts: retriggered decaying sinusoid stacks — spectrally
    sparse, nothing like white/pink (the unseen TARGET domain)."""
    x = np.zeros(n_samp)
    pos = 0
    while pos < n_samp:
        freqs = rng.uniform(700, 3400, size=rng.integers(2, 5))
        dur = int(rng.uniform(0.25, 0.5) * sr)
        seg = np.arange(min(dur, n_samp - pos)) / sr
        burst = sum(np.sin(2 * np.pi * fq * seg + rng.uniform(0, 6.28))
                    * np.exp(-seg * rng.uniform(4, 10)) for fq in freqs)
        x[pos:pos + len(seg)] += burst
        pos += int(rng.uniform(0.3, 0.6) * sr)
    return (x / (np.abs(x).max() + 1e-9) * 0.5).astype(np.float32)


def gen_corpus(root, rng, n_speech_train=16, n_speech_test=6,
               n_white=6, n_pink=6, n_tonal_train=3, n_tonal_test=4,
               sr=16000):
    from speech_enhancement_by_s3prl_tpu.data.audio_io import write_wav

    def put(sub, name, wav):
        d = os.path.join(root, sub)
        os.makedirs(d, exist_ok=True)
        write_wav(os.path.join(d, name), wav, sr)

    for i in range(n_speech_train):
        put("speech_train", f"s{i}.wav", _speech(rng, int(rng.uniform(1.5, 2.5) * sr)))
    for i in range(n_speech_test):
        put("speech_test", f"t{i}.wav", _speech(rng, int(rng.uniform(1.5, 2.5) * sr)))
    # noise_pool: adaptation-time candidate noise (source majority, target
    # family minority); noise_source: downstream-pretrain noise;
    # noise_target: held-out target-domain (test + query) noise
    for i in range(n_white):
        w = _white(rng, int(rng.uniform(1.5, 2.5) * sr))
        for sub in ("noise_pool", "noise_source", "noise_white"):
            put(sub, f"white{i}.wav", w)
    for i in range(n_pink):
        p = _pink(rng, int(rng.uniform(1.5, 2.5) * sr))
        for sub in ("noise_pool", "noise_source", "noise_pink"):
            put(sub, f"pink{i}.wav", p)
    for i in range(n_tonal_train):
        tn = _tonal(rng, int(rng.uniform(1.5, 2.5) * sr))
        for sub in ("noise_pool", "noise_tonal_train"):
            put(sub, f"tonal{i}.wav", tn)
    for i in range(n_tonal_test):
        put("noise_target", f"tonal{i}.wav", _tonal(rng, int(rng.uniform(1.5, 2.5) * sr)))


# ---------------------------------------------------------------- configs --

def _ds(speech, noise, max_time, snrs):
    return dict(
        speech={"filestrs": speech},
        noise={"filestrs": noise},
        sample_rate=16000, max_time=max_time, target_level=-25,
        snrs=list(snrs),
    )


def downstream_config(workdir, args, train_noise, test_noise, total_step,
                      pseudo_modes=None):
    cfg = {
        "dataloader": {
            "batch_size": args.batch_size,
            "eval_batch_size": args.batch_size,
            "active_batch_size": args.active_batch_size,
        },
        "preprocessor": {
            "input_channel": 0,
            "target_channel": 1,
            "baseline": {"feat_type": "linear", "log": True, "delta": 0,
                         "cmvn": True},
        },
        "runner": {
            "learning_rate": args.learning_rate,
            "warmup_proportion": 0.07,
            "gradient_clipping": 1.0,
            "total_step": total_step,
            "log_step": max(total_step // 5, 1),
            "eval_step": total_step,
            "save_step": total_step,
            "max_keep": 2,
            "eval_splits": ["test"],
            "eval_metrics": ["stoi", "pesq_nb", "sisdr"],
            "active_query_num": args.query_num,
            "active_refresh_step": 10,
            "active_buffer_weights": [1, 1, 1, 1],
            "sampler_refresh_step": 10_000,
            "sampler_collect_step": 25,
            "sampler_sample_num": 10,
        },
        "objective": {args.objective: {}},
        "model": {"LSTM": {"hidden_size": args.hidden, "num_layers": 2,
                           "bidirectional": True}},
        "OnlineDataset_train": {
            **_ds(os.path.join(workdir, "corpus", "speech_train"), train_noise,
                  args.max_time, args.snrs),
            "infinite": True,
        },
        "OnlineDataset_test": {
            **_ds(os.path.join(workdir, "corpus", "speech_test"), test_noise,
                  args.max_time, [0]),
            "half_noise": "end",
        },
    }
    if pseudo_modes is not None:
        cfg["OnlineDataset_train"]["pseudo_modes"] = list(pseudo_modes)
    return cfg


def _run_cli(argv):
    import run_downstream

    old = sys.argv
    sys.argv = [os.path.join(REPO_ROOT, "run_downstream.py")] + argv
    try:
        run_downstream.main()
    finally:
        sys.argv = old


def _last_ckpt(expdir):
    import glob as g
    import re

    ckpts = g.glob(os.path.join(expdir, "states-*.ckpt"))
    assert ckpts, f"no checkpoints under {expdir}"
    return max(ckpts, key=lambda p: int(re.search(r"states-(\d+)", p).group(1)))


def _tb_metrics(expdir):
    """{tag: [(step, value), ...]} for the test_* eval scalars."""
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(expdir, size_guidance={"scalars": 0})
    acc.Reload()
    out = {}
    for tag in acc.Tags().get("scalars", []):
        if tag.startswith("test_"):
            out[tag] = [(e.step, float(e.value)) for e in acc.Scalars(tag)]
    return out


# -------------------------------------------------------------- enrichment --

def measure_enrichment(workdir, args, cfg_path, dckpt, n2c, n2n, domains):
    """Per-noise-domain sync-sampler match rates on real (case-1)
    candidates: does gradient matching against the pseudo-target query
    prefer target-family noise?"""
    import jax

    import jax.numpy as jnp

    import run_downstream as rd
    from speech_enhancement_by_s3prl_tpu.active.sampler import (
        hist_scoring,
        hist_thresholding,
        make_scoring_fn,
        matching,
    )
    from speech_enhancement_by_s3prl_tpu.runner.runner import Runner

    old = sys.argv
    sys.argv = [
        os.path.join(REPO_ROOT, "run_downstream.py"),
        "--name", "probe", "--config", cfg_path, "--expdir",
        os.path.join(workdir, "probe"),
        "--upstream", "transformer", "--ckpt", n2c,
        "--upstream2", "transformer", "--ckpt2", n2n,
        "--from_rawfeature", "--downstream", "LSTM",
        "--objective", args.objective, "--dckpt", dckpt,
        "--dev_num", "2", "--record_num", "4", "--n_jobs", "1",
        "--seed", str(args.seed),
    ] + (["--cpu"] if args.cpu else [])
    try:
        cli_args, config = rd.get_downstream_args()
        if cli_args.cpu:
            jax.config.update("jax_platforms", "cpu")
        preprocessor, up_dim, down_dim, tar_dim = rd.get_preprocessor(
            cli_args, config
        )
        from speech_enhancement_by_s3prl_tpu.models.upstream import build_upstream

        up1 = build_upstream("transformer", up_dim, n2c)
        up2 = build_upstream("transformer", up_dim, n2n)
        down = rd.get_downstream_model(cli_args, down_dim, tar_dim, config)
        runner = Runner(args=cli_args, config=config, preprocessor=preprocessor,
                        upstream=up1, upstream2=up2, downstream=down,
                        expdir=os.path.join(workdir, "probe"))
        runner.set_model()
    finally:
        sys.argv = old

    scoring = make_scoring_fn(runner.builder, args.active_layerid)
    queryset = runner.get_dataset("query")
    qloader = runner.get_dataloader(queryset, bsz=args.query_num)
    q_len, q_wavs, _ = next(iter(qloader))
    q_scores = scoring(runner.state.params, q_wavs, q_len, mean=True)
    # the reference's alternative scorer: noise-spectrum histogram
    # signatures (/root/reference/sampler.py:219-235) — the query batch's
    # pseudo-noise channel vs each candidate's real noise channel
    q_hist = hist_scoring(runner.preprocessor, jnp.asarray(q_wavs), mean=True)

    rates = {}
    for domain, noise_dir in domains.items():
        runner.config["OnlineDataset_train"]["noise"] = {"filestrs": noise_dir}
        runner.config["OnlineDataset_train"]["pseudo_modes"] = [1]
        cand = runner.get_dataset("train")
        cloader = runner.get_dataloader(cand, bsz=args.active_batch_size)
        matches, scores, seen = 0, [], 0
        hist_matches, hist_scores = 0, []
        it = iter(cloader)
        for _ in range(args.enrich_batches):
            try:
                lengths, wavs, _cases = next(it)
            except StopIteration:
                # small per-domain pools exhaust in a couple of batches
                # (len(speech) // batch with drop_last) — restart the epoch
                it = iter(cloader)
                lengths, wavs, _cases = next(it)
            m = np.asarray(matching(
                q_scores, scoring(runner.state.params, wavs, lengths)
            ))
            matches += int((m > 0).sum())
            scores.extend(m.tolist())
            mh = np.asarray(matching(
                q_hist, hist_scoring(runner.preprocessor, jnp.asarray(wavs))
            ))
            hist_matches += int(np.asarray(hist_thresholding(mh)).sum())
            hist_scores.extend(mh.tolist())
            seen += len(m)
        rates[domain] = {
            "match_rate": matches / seen,
            "mean_score": float(np.mean(scores)),
            "hist_match_rate": hist_matches / seen,
            "hist_mean_score": float(np.mean(hist_scores)),
            "n": seen,
        }
    return rates


# ------------------------------------------------------------------- main --

def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--up_steps", type=int, default=300)
    ap.add_argument("--down_steps", type=int, default=300)
    ap.add_argument("--adapt_steps", type=int, default=200)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--active_batch_size", type=int, default=8)
    ap.add_argument("--query_num", type=int, default=8)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--up_hidden", type=int, default=64)
    ap.add_argument("--up_layers", type=int, default=2)
    ap.add_argument("--learning_rate", type=float, default=4e-4)
    ap.add_argument("--objective", default="SISDR")
    ap.add_argument("--max_time", type=int, default=2000)
    ap.add_argument("--snrs", type=float, nargs="+", default=[-4, 0, 4])
    ap.add_argument("--enrich_batches", type=int, default=3)
    ap.add_argument(
        "--active_layerid", type=int, default=None,
        help="restrict gradient embeddings to LSTM layer k (the CLI's "
        "--active_layerid; None scores the whole tree like the reference "
        "default — both work with the SE_SCORE_IMPL=capture engine).",
    )
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    wd = os.path.abspath(args.workdir)
    corpus = os.path.join(wd, "corpus")
    os.makedirs(corpus, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    gen_corpus(corpus, rng)
    print(f"[experiment] corpus at {corpus}", flush=True)

    # -- stage 2: the two upstreams (noisy2clean / noisy2noise) ----------
    pre_cfg = {
        "transformer": {
            "input_dim": 201, "downsample_rate": 1,
            "hidden_size": args.up_hidden, "num_hidden_layers": args.up_layers,
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
    with open(pre_path, "w") as f:
        yaml.safe_dump(pre_cfg, f)

    import glob as globlib

    import pretrain_upstream

    ups = {}
    for name, tch in [("noisy2clean", 1), ("noisy2noise", 2)]:
        done = [p for p in globlib.glob(
            os.path.join(wd, "upstreams", name, "states-*.ckpt"))]
        if done:
            ups[name] = done[0]
            print(f"[experiment] reusing upstream {ups[name]}", flush=True)
            continue
        ups[name] = pretrain_upstream.main([
            "--name", name, "--expdir", os.path.join(wd, "upstreams"),
            "--config", pre_path,
            "--speech", os.path.join(corpus, "speech_train"),
            "--noise", os.path.join(corpus, "noise_pool"),
            "--target_channel", str(tch),
            "--total_step", str(args.up_steps),
            "--batch_size", str(args.batch_size),
            "--seed", str(args.seed),
        ] + (["--cpu"] if args.cpu else []))

    # -- stage 3: source-domain downstream warm start ---------------------
    src_cfg = downstream_config(
        wd, args,
        train_noise=os.path.join(corpus, "noise_source"),
        test_noise=os.path.join(corpus, "noise_target"),
        total_step=args.down_steps,
    )
    src_cfg_path = os.path.join(wd, "source.yaml")
    with open(src_cfg_path, "w") as f:
        yaml.safe_dump(src_cfg, f)
    if not globlib.glob(os.path.join(wd, "down", "source", "states-*.ckpt")):
        _run_cli([
            "--name", "source", "--config", src_cfg_path,
            "--expdir", os.path.join(wd, "down"),
            "--upstream", "baseline", "--upstream2", "baseline",
            "--from_rawfeature", "--downstream", "LSTM",
            "--objective", args.objective, "--seed", str(args.seed),
            "--dev_num", "2", "--n_jobs", "1",
        ] + (["--cpu"] if args.cpu else []))
    dckpt = _last_ckpt(os.path.join(wd, "down", "source"))
    print(f"[experiment] source-domain warm start: {dckpt}", flush=True)

    # -- stage 4: adaptation, active vs uniform ---------------------------
    adapt_cfg = downstream_config(
        wd, args,
        train_noise=os.path.join(corpus, "noise_pool"),
        test_noise=os.path.join(corpus, "noise_target"),
        total_step=args.adapt_steps,
        pseudo_modes=[0, 1, 2, 3],
    )
    adapt_cfg_path = os.path.join(wd, "adapt.yaml")
    with open(adapt_cfg_path, "w") as f:
        yaml.safe_dump(adapt_cfg, f)

    common = [
        "--config", adapt_cfg_path,
        "--upstream", "transformer", "--ckpt", ups["noisy2clean"],
        "--upstream2", "transformer", "--ckpt2", ups["noisy2noise"],
        "--from_rawfeature", "--downstream", "LSTM",
        "--objective", args.objective, "--dckpt", dckpt,
        "--eval_init", "--seed", str(args.seed),
        "--dev_num", "2", "--record_num", "4", "--n_jobs", "1",
    ] + (["--cpu"] if args.cpu else [])
    results = {"config": vars(args)}
    layerid_flag = (
        ["--active_layerid", str(args.active_layerid)]
        if args.active_layerid is not None else []
    )
    for mode, extra in [
        ("active", ["--active_sampling", "--sync_sampler"] + layerid_flag),
        ("uniform", []),
    ]:
        expdir = os.path.join(wd, "adapt", mode)
        tb = _tb_metrics(expdir) if os.path.isdir(expdir) else {}
        if any(len(v) >= 2 for v in tb.values()):
            print(f"[experiment] reusing finished {mode} run", flush=True)
        else:
            _run_cli(["--name", mode, "--expdir", os.path.join(wd, "adapt")]
                     + common + extra)
            tb = _tb_metrics(expdir)
        results[mode] = {
            tag: {"init": vals[0][1], "final": vals[-1][1]}
            for tag, vals in tb.items()
        }
        print(f"[experiment] {mode}: "
              + ", ".join(f"{t} {v['init']:.3f}->{v['final']:.3f}"
                          for t, v in sorted(results[mode].items())),
              flush=True)

    # -- stage 5: selection enrichment ------------------------------------
    results["enrichment"] = measure_enrichment(
        wd, args, adapt_cfg_path, dckpt,
        ups["noisy2clean"], ups["noisy2noise"],
        domains={
            "white": os.path.join(corpus, "noise_white"),
            "pink": os.path.join(corpus, "noise_pink"),
            "tonal_train": os.path.join(corpus, "noise_tonal_train"),
            "tonal_target": os.path.join(corpus, "noise_target"),
        },
    )
    print("[experiment] enrichment:", json.dumps(results["enrichment"]),
          flush=True)

    out = os.path.join(wd, "results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"[experiment] results: {out}", flush=True)
    return results


if __name__ == "__main__":
    main()
