#!/usr/bin/env python
"""Export a trained checkpoint as a portable serving artifact.

    python scripts/export_model.py --ckpt exp/run/states-20000.ckpt \
        --out exp/run/artifact [--cpu] [--max_sec 30]

Produces one `jax.export` StableHLO program per serving duration bucket
(weights baked in, batch dimension symbolic) plus a manifest. The
artifact is deployed with `python serve.py --artifact <dir>` — the
serving host needs jax but neither the checkpoint nor this framework's
model code (utils/export_artifact.py documents the contract).
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--upstream_ckpt", default="",
                    help="relocated S3PRL pretraining checkpoint for "
                         "upstream-backed downstream checkpoints")
    ap.add_argument("--dckpt", default="",
                    help="relocated S3PRL pretraining checkpoint holding a "
                         "Mockingjay head's config")
    ap.add_argument("--out", required=True)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--target_level", type=float, default=-25.0)
    ap.add_argument("--max_sec", type=float, default=0.0,
                    help="drop buckets longer than this (0 = keep all)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from serve import build_raw_enhancer
    from speech_enhancement_by_s3prl_tpu.utils.export_artifact import (
        export_enhance,
    )

    params, enhance_raw, buckets = build_raw_enhancer(
        args.ckpt, args.sample_rate, args.target_level,
        upstream_ckpt=args.upstream_ckpt, dckpt=args.dckpt,
    )
    if args.max_sec:
        buckets = [t for t in buckets if t <= args.max_sec * args.sample_rate]
        if not buckets:
            ap.error(
                f"--max_sec {args.max_sec} excludes every serving bucket"
            )
    paths = export_enhance(
        enhance_raw, params, buckets, args.out,
        sample_rate=args.sample_rate,
    )
    for t, p in sorted(paths.items()):
        print(f"[export] {t / args.sample_rate:5.1f} s bucket -> {p} "
              f"({os.path.getsize(p) / 1e6:.1f} MB)")
    print(f"[export] manifest -> {os.path.join(args.out, 'manifest.json')}")


if __name__ == "__main__":
    main()
