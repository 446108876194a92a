#!/usr/bin/env python
"""Batch enhancement CLI — the serving path.

Loads a trained downstream checkpoint and enhances audio files: decode ->
bucketed batches -> one jitted enhance program per bucket (fused STFT,
model forward, iSTFT with noisy phase, level renorm) -> WAV out. This is
the deployment surface the reference lacks (its only entry points are
train/eval; SURVEY.md section 1).

Usage:
  python enhance.py --ckpt result/exp1 --downstream LSTM \
      --inputs 'noisy/*.wav' --outdir enhanced/
"""
import argparse
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="", help="checkpoint file or dir")
    ap.add_argument("--upstream_ckpt", default="",
                    help="relocated S3PRL pretraining checkpoint for "
                         "upstream-backed downstream checkpoints")
    ap.add_argument("--dckpt", default="",
                    help="relocated S3PRL pretraining checkpoint holding a "
                         "Mockingjay head's config")
    ap.add_argument("--artifact", default="",
                    help="jax.export deployment artifact directory "
                         "(scripts/export_model.py) instead of a checkpoint")
    ap.add_argument("--inputs", required=True, help="glob/dir of noisy audio")
    ap.add_argument("--outdir", default="enhanced")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--target_level", type=float, default=None,
                    help="output level in dB (default -25; artifacts bake "
                         "the export-time level in — the flag is rejected "
                         "with --artifact)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard each batch over N devices (data-parallel "
                         "serving over ICI); 0 = single device")
    args = ap.parse_args()

    if bool(args.ckpt) == bool(args.artifact):
        ap.error("pass exactly one of --ckpt / --artifact")
    if args.artifact and args.mesh:
        ap.error("--artifact serving is single-device (no --mesh)")
    if args.artifact and args.target_level is not None:
        ap.error("--target_level is baked into the artifact at export time"
                 " (re-export with scripts/export_model.py to change it)")
    if args.artifact and (args.upstream_ckpt or args.dckpt):
        ap.error("--upstream_ckpt/--dckpt are resolved at export time "
                 "(pass them to scripts/export_model.py instead)")
    target_level = -25.0 if args.target_level is None else args.target_level

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.mesh:
            # CPU backend: provision virtual devices so the mesh path is
            # testable without TPUs (SURVEY.md section 4)
            jax.config.update("jax_num_cpu_devices", args.mesh)

    from speech_enhancement_by_s3prl_tpu.data.audio_io import load_audio, write_wav
    from speech_enhancement_by_s3prl_tpu.data.datasets import find_audio_files

    # the enhancer pipelines (ckpt -> jitted program per duration bucket,
    # dp mesh, AOT cache, long-input streaming; or a jax.export artifact)
    # are shared with the HTTP endpoint
    from serve import build_artifact_enhancer, build_enhancer

    # offline CLI: fixed --batch_size chunks, so skip the online
    # micro-batcher's power-of-two row rounding; keep the CLI's historical
    # 30 s bucket ceiling (files beyond it stream in crossfaded windows)
    if args.artifact:
        enhancer = build_artifact_enhancer(
            args.artifact, args.sample_rate, round_pow2=False
        )
    else:
        enhancer = build_enhancer(
            args.ckpt, args.sample_rate, target_level, mesh_n=args.mesh,
            max_bucket_ms=30000, round_pow2=False,
            upstream_ckpt=args.upstream_ckpt, dckpt=args.dckpt,
        )

    if os.path.isdir(args.inputs):
        files = find_audio_files(args.inputs)
    else:
        files = sorted(glob.glob(args.inputs))
    assert files, f"no inputs matched {args.inputs}"
    os.makedirs(args.outdir, exist_ok=True)

    t0 = time.time()
    total_audio = 0.0
    for i in range(0, len(files), args.batch_size):
        chunk = files[i : i + args.batch_size]
        wavs = [load_audio(f, sr=args.sample_rate)[0] for f in chunk]
        lengths = np.array([len(w) for w in wavs])

        # short files ride one padded device batch; over-bucket files
        # stream through fixed crossfaded windows (enhancer internals)
        long_idx = [j for j, w in enumerate(wavs) if len(w) > enhancer.max_len]
        short_idx = [j for j, w in enumerate(wavs) if len(w) <= enhancer.max_len]
        out = [None] * len(wavs)
        for j in long_idx:
            out[j] = enhancer(wavs[j])
        if short_idx:
            res = enhancer.run_batch([wavs[j] for j in short_idx])
            for k, j in enumerate(short_idx):
                out[j] = res[k]

        for j, f in enumerate(chunk):
            name = os.path.splitext(os.path.basename(f))[0] + ".wav"
            write_wav(os.path.join(args.outdir, name),
                      out[j][: lengths[j]], args.sample_rate)
        total_audio += lengths.sum() / args.sample_rate
        print(f"[enhance] {min(i + args.batch_size, len(files))}/{len(files)}",
              flush=True)

    dt = time.time() - t0
    print(f"[enhance] {len(files)} files, {total_audio:.1f}s audio in "
          f"{dt:.1f}s wall ({total_audio / dt:.1f}x realtime incl. I/O)")


if __name__ == "__main__":
    main()
