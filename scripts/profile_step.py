#!/usr/bin/env python
"""Capture a device trace of one bench-mode step and print the top ops.

The observability companion to bench.py's MFU columns: MFU says HOW FAR
from the roofline a mode is, this says WHERE the time goes. Captures a
``jax.profiler.trace`` around a few steps of the requested mode's jitted
program, parses the XPlane protobuf with ``tensorboard_plugin_profile``
(no TensorBoard UI needed), and prints per-op self-times aggregated by
fusion name on the device plane — the table PERF.md's trace-guided
optimizations (e.g. the round-3 dropout rebuild) are read from.

Usage:
  python scripts/profile_step.py --mode mockingjay --batch 64 --steps 3 \
      [--dtype bf16] [--outdir /tmp/prof] [--top 40] [--cpu]

Env knobs honored exactly as in bench.py (SE_*, BENCH_*).
"""
import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(path: str, top: int = 40):
    """Aggregate event self-durations per device plane from an xplane.pb."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:  # plugin layouts vary across versions
        from tensorboard_plugin_profile.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    # device planes: "/device:TPU:0" / "TPU:0". On CPU-only traces the
    # XLA op events land on the "/host:CPU" plane instead — fall back to
    # it when no accelerator plane exists (lets --cpu smoke runs work).
    names = [p.name for p in xs.planes]
    has_dev = any(
        ("TPU" in n or "GPU" in n or "device" in n) and "CUPTI" not in n
        for n in names
    )
    tables = {}
    for plane in xs.planes:
        name = plane.name
        if has_dev:
            if "TPU" not in name and "GPU" not in name and "device" not in name:
                continue
            if "CUPTI" in name or name.startswith("/host"):
                continue
        elif name != "/host:CPU":
            continue
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        agg = defaultdict(lambda: [0.0, 0])
        total = 0.0
        for line in plane.lines:
            # XLA op lines carry per-op events; steps/queues are other lines
            for ev in line.events:
                dur_ms = ev.duration_ps / 1e9
                nm = ev_meta.get(ev.metadata_id, str(ev.metadata_id))
                agg[nm][0] += dur_ms
                agg[nm][1] += 1
            if line.events:
                total += sum(e.duration_ps for e in line.events) / 1e9
        if agg:
            tables[name] = (total, sorted(
                agg.items(), key=lambda kv: -kv[1][0]
            )[:top])
    return tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="mockingjay",
                    choices=["mockingjay", "train", "enhance", "eval",
                             "upstream", "score"])
    ap.add_argument("--batch", type=int, default=0)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--dtype", default="")
    ap.add_argument("--utt_sec", type=int, default=10)
    ap.add_argument("--outdir", default="/tmp/se_profile")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--parse_only", default="",
                    help="parse an existing .xplane.pb instead of tracing")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.parse_only:
        report(parse_xplane(args.parse_only, args.top))
        return

    if args.batch:
        os.environ["BENCH_BATCH"] = str(args.batch)
    if args.dtype:
        os.environ["BENCH_DTYPE"] = args.dtype
    os.environ["BENCH_MODE"] = args.mode
    os.environ["BENCH_UTT_SEC"] = str(args.utt_sec)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if os.environ.get("SE_PRNG"):
        jax.config.update("jax_default_prng_impl", os.environ["SE_PRNG"])
    import jax.numpy as jnp

    from speech_enhancement_by_s3prl_tpu.utils.config import setup_compile_cache

    setup_compile_cache("/root/.jax_cache")
    import __graft_entry__ as graft

    sr = 16000
    T = sr * args.utt_sec
    batch = int(os.environ.get("BENCH_BATCH", "64"))
    wavs = jax.jit(
        lambda k: jax.random.normal(k, (batch, 3, T), jnp.float32) * 0.05
    )(jax.random.PRNGKey(0))
    lengths = jnp.full((batch,), T, jnp.int32)
    rng = jax.random.PRNGKey(0)

    # build the same step the bench mode times (bench.py is the contract)
    if args.mode == "mockingjay":
        import dataclasses

        from speech_enhancement_by_s3prl_tpu.models.spec_head import Mockingjay
        from speech_enhancement_by_s3prl_tpu.models.transformer import (
            TransformerConfig,
        )

        base = graft._build(delta=1)
        tf_cfg = TransformerConfig(input_dim=80)
        if os.environ.get("BENCH_MJ_DROPOUT") is not None:
            rate = float(os.environ["BENCH_MJ_DROPOUT"])
            tf_cfg.hidden_dropout_prob = rate
            tf_cfg.attention_probs_dropout_prob = rate
        model = Mockingjay(
            output_size=201, config=tf_cfg,
            compute_dtype=(
                jnp.bfloat16
                if os.environ.get("BENCH_DTYPE", "f32") in ("bf16", "bfloat16")
                else jnp.float32
            ),
            remat=os.environ.get("SE_TF_REMAT", "0") == "1",
        )
        builder = dataclasses.replace(
            base, model=model, from_waveform=True, from_rawfeature=False
        )
        state = builder.init_state(rng, wavs[:2], lengths[:2])
        step = builder.train_step_fn()

        def run_one():
            nonlocal state
            state, stats = step(state, wavs, lengths, rng)
            return stats["loss"]
    elif args.mode in ("train", "enhance", "eval", "upstream", "score"):
        builder = graft._build()
        state = builder.init_state(rng, wavs[:2], lengths[:2])
        if args.mode == "train":
            step = builder.train_step_fn()

            def run_one():
                nonlocal state
                state, stats = step(state, wavs, lengths, rng)
                return stats["loss"]
        elif args.mode == "eval":
            # BENCH_EVAL_METRICS mirrors bench.py's eval/eval_full split
            # (e.g. "sisdr,stoi,estoi,pesq_nb,pesq_wb" traces eval_full)
            metrics = tuple(
                m.strip() for m in os.environ.get(
                    "BENCH_EVAL_METRICS", "sisdr,stoi"
                ).split(",") if m.strip()
            )
            import dataclasses as _dc

            builder = _dc.replace(builder, eval_metrics=metrics)
            estep = builder.eval_step_fn(wav_out="first")

            def run_one():
                out = estep(state.params, wavs, lengths)
                return {"loss": out["loss"], **out["scores"]}
        elif args.mode == "upstream":
            from speech_enhancement_by_s3prl_tpu.models.transformer import (
                TransformerConfig,
            )
            from speech_enhancement_by_s3prl_tpu.models.upstream import (
                UpstreamTransformer,
            )

            up = UpstreamTransformer(
                TransformerConfig(input_dim=80, hidden_dropout_prob=0.0,
                                  attention_probs_dropout_prob=0.0),
                input_dim=80,
                compute_dtype=(
                    jnp.bfloat16
                    if os.environ.get("BENCH_DTYPE", "bf16") in ("bf16",
                                                                 "bfloat16")
                    else jnp.float32
                ),
            )
            frames = args.utt_sec * 100 + 1
            feats = jax.random.normal(rng, (batch, frames, 80), jnp.float32)
            fwd = jax.jit(lambda p, f: up(f, params=p).sum())

            def run_one():
                return fwd(up.params, feats)
        elif args.mode == "score":
            from speech_enhancement_by_s3prl_tpu.active.sampler import (
                make_scoring_fn,
            )

            scoring = make_scoring_fn(builder, active_layerid=0)
            fn = jax.jit(scoring.raw_per_sample)

            def run_one():
                return fn(state.params, wavs, lengths, rng)
        else:  # enhance
            enh = jax.jit(
                lambda p, w, l: graft.make_enhance(builder)(p, w, l).sum()
            )

            def run_one():
                return enh(state.params, wavs, lengths)

    out = run_one()  # compile + warmup outside the trace
    jax.tree.map(lambda x: jnp.asarray(x).sum().item(), out)

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        last = None
        for _ in range(args.steps):
            last = run_one()
        jax.tree.map(lambda x: jnp.asarray(x).sum().item(), last)

    paths = sorted(glob.glob(
        os.path.join(args.outdir, "**", "*.xplane.pb"), recursive=True
    ), key=os.path.getmtime)
    assert paths, f"no xplane.pb under {args.outdir}"
    print(f"[profile] parsing {paths[-1]} ({args.steps} steps)")
    report(parse_xplane(paths[-1], args.top), steps=args.steps)


def report(tables, steps=1):
    for plane, (total, rows) in tables.items():
        print(f"\n== plane {plane}: {total / steps:.2f} ms/step "
              f"(sum of event durations; {steps} steps) ==")
        for name, (ms, cnt) in rows:
            print(f"{ms / steps:9.3f} ms  x{cnt:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
