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
    ap.add_argument("--ckpt", required=True, help="checkpoint file or dir")
    ap.add_argument("--inputs", required=True, help="glob/dir of noisy audio")
    ap.add_argument("--outdir", default="enhanced")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--target_level", type=float, default=-25.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard each batch over N devices (data-parallel "
                         "serving over ICI); 0 = single device")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.mesh:
            # CPU backend: provision virtual devices so the mesh path is
            # testable without TPUs (SURVEY.md section 4)
            jax.config.update("jax_num_cpu_devices", args.mesh)
    from speech_enhancement_by_s3prl_tpu.utils.config import (
        setup_compile_cache,
    )

    setup_compile_cache()
    import jax.numpy as jnp

    from speech_enhancement_by_s3prl_tpu.data.audio_io import load_audio, write_wav
    from speech_enhancement_by_s3prl_tpu.data.datasets import find_audio_files
    from speech_enhancement_by_s3prl_tpu.data.loader import (
        bucket_length,
        default_buckets,
    )
    from speech_enhancement_by_s3prl_tpu.models.heads import build_head
    from speech_enhancement_by_s3prl_tpu.ops.audio import (
        length_masks,
        masked_normalize_decibel,
    )
    from speech_enhancement_by_s3prl_tpu.ops.features import (
        OnlinePreprocessor,
        get_feat_config,
    )
    from speech_enhancement_by_s3prl_tpu.runner.checkpoint import load_checkpoint

    payload = load_checkpoint(args.ckpt)
    paras = payload["Settings"]["Paras"]
    config = payload["Settings"]["Config"]
    params = jax.tree.map(jnp.asarray, payload["Downstream"])
    if not (paras.get("from_rawfeature") or paras.get("from_waveform")):
        raise SystemExit(
            "this checkpoint was trained on upstream hidden states; serve it "
            "through run_downstream.py --test (upstream wiring) — the "
            "lightweight enhance CLI supports raw-feature heads"
        )

    downstream = paras.get("downstream", "LSTM")
    model_cfg = config.get("model", {}).get(downstream, {}) or {}
    baseline_feat = dict(config["preprocessor"]["baseline"])
    baseline_feat["channel"] = 0
    feat_list = [
        baseline_feat,
        baseline_feat,
        get_feat_config("linear", 0),
        get_feat_config("phase", 0),
        get_feat_config("linear", 0),
        get_feat_config("phase", 0),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    dims = pre.feat_dims()
    model = build_head(downstream, input_size=dims[1], output_size=dims[2],
                       **{**paras, **model_cfg})

    def enhance_fn(params, wavs, lengths):
        feats = pre(wavs[:, None, :])
        _, down_feat, linear_inp, phase_inp, *_ = feats
        predicted, _ = model.apply(params, features=down_feat,
                                   linears=linear_inp)
        wav = pre.istft(predicted, phase_inp)
        pad = wavs.shape[-1] - wav.shape[-1]
        wav = jnp.pad(wav, ((0, 0), (0, max(pad, 0))))[:, : wavs.shape[-1]]
        masks = length_masks(lengths, wavs.shape[-1])
        return masked_normalize_decibel(wav, args.target_level, masks)

    # the streaming (long-file) path always runs single-device: it feeds
    # one window at a time, which cannot shard over the batch axis
    enhance_single = jax.jit(enhance_fn)

    batch_round = 1
    if args.mesh:
        # data-parallel serving: the batch axis sharded over every device,
        # params replicated. Serving has no gradient sync, so the only
        # collective is the initial param broadcast — each chip enhances
        # its batch shard independently and throughput scales linearly
        # with the mesh (the reference serves nothing; SURVEY.md section 1).
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = jax.devices()[: args.mesh]
        assert len(devices) == args.mesh, (
            f"--mesh {args.mesh} but only {len(devices)} devices visible"
        )
        mesh = Mesh(np.array(devices), ("data",))
        rep = NamedSharding(mesh, P())
        params = jax.device_put(
            params, jax.tree.map(lambda _: rep, params)
        )
        enhance = jax.jit(
            enhance_fn,
            in_shardings=(
                jax.tree.map(lambda _: rep, params),
                NamedSharding(mesh, P("data", None)),
                NamedSharding(mesh, P("data")),
            ),
            out_shardings=NamedSharding(mesh, P("data", None)),
        )
        batch_round = args.mesh
    else:
        enhance = enhance_single

    if os.path.isdir(args.inputs):
        files = find_audio_files(args.inputs)
    else:
        files = sorted(glob.glob(args.inputs))
    assert files, f"no inputs matched {args.inputs}"
    os.makedirs(args.outdir, exist_ok=True)

    buckets = default_buckets(args.sample_rate, 30000)

    def enhance_one(wav: np.ndarray) -> np.ndarray:
        """Single-utterance path, streamed in fixed crossfaded windows when
        the signal exceeds the largest bucket (constant memory, no
        recompiles — ops/streaming.py)."""
        from speech_enhancement_by_s3prl_tpu.ops.streaming import (
            enhance_streaming,
        )

        def window_fn(w):
            out = np.asarray(
                enhance_single(
                    params, jnp.asarray(w[None]), jnp.asarray([len(w)])
                )
            )
            return out[0]

        return enhance_streaming(
            window_fn, wav, sample_rate=args.sample_rate,
            window_sec=buckets[-1] / args.sample_rate, overlap_sec=1.0,
        )

    t0 = time.time()
    total_audio = 0.0
    for i in range(0, len(files), args.batch_size):
        chunk = files[i : i + args.batch_size]
        wavs = [load_audio(f, sr=args.sample_rate)[0] for f in chunk]
        lengths = np.array([len(w) for w in wavs])

        long_idx = [j for j, w in enumerate(wavs) if len(w) > buckets[-1]]
        short_idx = [j for j, w in enumerate(wavs) if len(w) <= buckets[-1]]
        out = [None] * len(wavs)
        for j in long_idx:
            out[j] = enhance_one(wavs[j])
        if short_idx:
            T = bucket_length(int(max(lengths[j] for j in short_idx)), buckets)
            # sharded batches must divide evenly over the mesh: round the
            # row count up by repeating row 0 (extra outputs are discarded)
            n_rows = -(-len(short_idx) // batch_round) * batch_round
            batch = np.zeros((n_rows, T), np.float32)
            blens = np.full((n_rows,), T, np.int64)
            for k, j in enumerate(short_idx):
                batch[k, : lengths[j]] = wavs[j]
                blens[k] = lengths[j]
            batch[len(short_idx):] = batch[0]
            blens[len(short_idx):] = blens[0]
            res = np.asarray(
                enhance(params, jnp.asarray(batch), jnp.asarray(blens))
            )
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
