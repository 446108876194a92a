#!/usr/bin/env python
"""Benchmark: enhancement real-time factor per chip.

Measures the full enhance pipeline on the flagship model (BLSTM mask head,
active.yaml geometry: 3x256 BLSTM over 120-dim log-mel+delta features) —
fused STFT feature extraction, model forward, iSTFT decode with noisy
phase, level renorm — on 10 s utterances, and reports audio-seconds
processed per wall-clock second per chip (real-time factor).

Baseline context (BASELINE.md): the reference publishes no numbers; the
north-star target is >=10x real-time per chip. ``vs_baseline`` is the
ratio of the measured RTF to that 10x target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Default mode is ``all``: every benchmark mode runs in its own
subprocess (env knobs like SE_LSTM_XW_BF16/SE_LSTM_UNROLL are read at
import time, and one TPU client at a time is mandatory on the axon
tunnel), and the single JSON line carries the enhance headline plus a
``modes`` object with every mode's result — the whole perf claim in one
driver artifact. ``BENCH_MODE=<mode>`` runs one mode exactly as before;
``BENCH_MODES=a,b`` restricts the all-run; ``BENCH_TOTAL_BUDGET``
(seconds, default 2400) stops scheduling further modes once exceeded so
a cold-cache run cannot blow the driver's patience.
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# (name, env overrides) — every mode of the scoreboard. Batch/dtype
# follow the measured per-mode sweet spots (docs/PERF.md).
ALL_MODES = [
    # every flagship mode defaults to the time-major Pallas recurrence
    # (+33% enhance over the scan champion; the custom-VJP backward
    # kernel makes train +134% — docs/PERF.md round-3 tables); the
    # AOT exec cache absorbs its per-process Mosaic recompile.
    # HS_BF16 everywhere the TM kernel runs at B=768: a FRESH compile of
    # the f32-out variant needs 16.8MB scoped VMEM (> 16MB limit) — the
    # 39.5-39.7k f32-out numbers in docs/PERF.md came from a cached
    # executable that no longer reproduces; bf16-out measures the same
    # (39.3k) and compiles reliably.
    ("enhance", {"BENCH_MODE": "enhance", "SE_PALLAS_LSTM": "1",
                 "SE_PALLAS_HS_BF16": "1"}),
    # train through the differentiable TM kernel: B=256 is the sweep
    # winner (13,991x/15,079x/16,610x at 128/192/256); the scan path
    # peaked at B=128 (7,101x). Loss trajectories match the scan to ~6
    # decimals over 40 steps (train-quality check, docs/PERF.md).
    # B=352 fits once dxw streams in xw's dtype and SE_PALLAS_VJP_BF16
    # stores the backward's residual/cotangent/weight streams bf16
    # (B=256 plain VJP 20.8k -> 320: 21.9k -> 352: 22.1k; B=384 remains
    # over the scoped-VMEM limit).
    ("train", {"BENCH_MODE": "train", "SE_PALLAS_LSTM": "1",
               "BENCH_BATCH": "352", "SE_PALLAS_VJP_BF16": "1"}),
    # eval's surrounding program leaves ~820KB less scoped VMEM than
    # enhance's, tipping the B=768 time-major kernel just over the 16MB
    # limit; the bf16 hidden-state OUT stream (measured cost ~0) frees
    # 1.5MB and fits it.
    ("eval", {"BENCH_MODE": "eval", "SE_PALLAS_LSTM": "1",
              "SE_PALLAS_HS_BF16": "1"}),
    ("eval_full", {"BENCH_MODE": "eval", "SE_PALLAS_LSTM": "1",
                   "SE_PALLAS_HS_BF16": "1",
                   "BENCH_EVAL_METRICS": "sisdr,stoi,estoi,pesq_nb,pesq_wb"}),
    ("upstream", {"BENCH_MODE": "upstream"}),
    # Dropout-live finetune champion config (docs/PERF.md): the in-house
    # Pallas flash-attention kernel with in-kernel hash dropout
    # (SE_ATTN_IMPL=flash). Round 4 (v1 kernel) took 1,348x (chunked-
    # hash) to 2,106x; the round-5 LAYOUT-NATIVE rebuild (kernel consumes
    # the (B, T, N*D) projection layout — no pad/transpose plumbing, bf16
    # grads, O(T)-operand softmax passes) measures 2,766x at block 512
    # (2,677x block 256; block 1024 exceeds scoped VMEM in the backward).
    # B=128 measured 1,835x on v1 — B=64 stays. rbg hardware RNG (+10%)
    # and hash masks for the 13 hidden-state dropout sites (+3%) carry
    # over. Flash stays dropout-live-only: the rate=0 forward (upstream
    # mode) keeps XLA's fused attention — see PERF.md round-5 rate=0
    # sweep.
    ("mockingjay", {"BENCH_MODE": "mockingjay", "BENCH_DTYPE": "bf16",
                    "BENCH_BATCH": "64", "SE_PALLAS_LSTM": "0",
                    "SE_PRNG": "rbg", "SE_ATTN_IMPL": "flash",
                    "SE_ATTN_FLASH_BLOCK": "512",
                    "SE_HIDDEN_DROPOUT_IMPL": "hash"}),
    # capture engine (one batched backward + outer-product einsums,
    # active/sampler.py impl='capture') instead of vmap(grad): runs the
    # recurrence batched so the differentiable Pallas kernel applies —
    # 2,358 utts/s vs 569 for vmap+scan (+314%). Embedding cosine vs
    # vmap+scan >= 0.999998 at the flagship shape on the real chip;
    # match rank order and thresholding identical (docs/PERF.md).
    ("score", {"BENCH_MODE": "score", "SE_SCORE_IMPL": "capture",
               "SE_PALLAS_LSTM": "1", "SE_PALLAS_VJP_BF16": "1",
               "SE_PALLAS_HS_BF16": "1", "BENCH_DTYPE": "bf16"}),
    ("loader", {"BENCH_MODE": "loader"}),
    # single-request serving latency (B=1), the serve.py fast path
    ("latency", {"BENCH_MODE": "latency", "SE_PALLAS_LSTM": "1",
                 "SE_PALLAS_HS_BF16": "1"}),
    # end-to-end disk->decode->enhance->WAV-write, all stages overlapped
    ("pipeline", {"BENCH_MODE": "pipeline", "SE_PALLAS_LSTM": "1",
                  "SE_PALLAS_HS_BF16": "1"}),
]


# v5e peaks: 197 bf16 TFLOPS (the MXU rate default-precision f32 matmuls
# also run at — TPU truncates operands to bf16 unless precision is raised),
# 819 GB/s HBM. Override per target chip.
PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", "197"))
PEAK_HBM_GBPS = float(os.environ.get("BENCH_PEAK_HBM_GBPS", "819"))


def roofline_fields(seconds_per_step, cost_fn, *cost_args, src="jaxpr",
                    **cost_kwargs):
    """MFU / bandwidth-utilization fields for a mode's JSON line.

    FLOPs come from the jaxpr cost walker (utils/costs.py) — XLA's own
    cost analysis counts while bodies once, undercounting every scan-shaped
    program here by the trip count. For Pallas modes the caller passes the
    SCAN-EQUIVALENT twin (same math, no opaque custom calls); ``src``
    labels which program was costed. ``hbm_*_model`` is the traffic model
    (program I/O + matmul operands/results with loop-invariance), not a
    hardware counter — see the costs module docstring."""
    try:
        from speech_enhancement_by_s3prl_tpu.utils.costs import program_cost

        c = program_cost(cost_fn, *cost_args, **cost_kwargs)
    except Exception as e:  # never let accounting sink the measurement
        return {"roofline_error": f"{type(e).__name__}: {e}"[-300:]}
    tflops = c["flops"] / seconds_per_step / 1e12
    gbps = c["hbm_bytes_model"] / seconds_per_step / 1e9
    out = {
        "flops_per_step": c["flops"],
        "dot_flops_per_step": c["dot_flops"],
        "tflops": round(tflops, 2),
        "mfu": round(tflops / PEAK_TFLOPS, 4),
        "hbm_gbytes_per_step_model": round(c["hbm_bytes_model"] / 1e9, 4),
        "hbm_gbps_model": round(gbps, 1),
        "hbm_util_model": round(gbps / PEAK_HBM_GBPS, 4),
        "flops_src": src,
    }
    if c["opaque_calls"]:
        out["roofline_opaque_calls"] = c["opaque_calls"]
    if c["unbounded_loops"]:
        out["roofline_unbounded_loops"] = c["unbounded_loops"]
    return out


def bench_loader():
    """Host input-pipeline throughput: file decode + on-the-fly SNR mixing
    + bucketed collate through OnlineDataset/DataLoader, no accelerator
    involved. Runs anywhere and never claims the (single-client) TPU.

    The number is per-HOST-CORE-POOL, not per chip: this relay host has
    one core, a real TPU-VM host has ~100+, and the loader's thread
    workers scale with them (decode is ctypes/numpy, mostly GIL-free).
    """
    import tempfile

    from speech_enhancement_by_s3prl_tpu.data.audio_io import write_wav
    from speech_enhancement_by_s3prl_tpu.data.datasets import OnlineDataset
    from speech_enhancement_by_s3prl_tpu.data.loader import (
        DataLoader,
        default_buckets,
    )

    sr = 16000
    rng = np.random.default_rng(0)
    n_speech = int(os.environ.get("BENCH_LOADER_FILES", "64"))
    fmt = os.environ.get("BENCH_LOADER_FORMAT", "wav")
    with tempfile.TemporaryDirectory() as root:
        sdir, ndir = os.path.join(root, "s"), os.path.join(root, "n")
        os.makedirs(sdir), os.makedirs(ndir)
        if fmt == "flac":
            # the FLAC *encoder* lives in the test suite only (production
            # scope is decode); reuse it to exercise the native decoder
            from tests.test_flac import (
                encode_fixed1_rice,
                frame_header,
                streaminfo,
            )
            for i in range(n_speech):
                n_frames = int(rng.integers(24, 40))  # 6.1-10.2 s @ 16 kHz
                data = streaminfo(sr, 1, 16, n_frames * 4096)
                for fi in range(n_frames):
                    samples = np.cumsum(
                        rng.integers(-7, 8, size=4096)
                    ).astype(np.int64)
                    data += (
                        frame_header(0b1100, fi)
                        + encode_fixed1_rice(samples).bytes()
                        + b"\x00\x00"
                    )
                with open(os.path.join(sdir, f"s{i:03d}.flac"), "wb") as f:
                    f.write(data)
        else:
            for i in range(n_speech):
                n = int(sr * rng.uniform(6.0, 10.0))
                t = np.arange(n) / sr
                f0 = rng.uniform(100, 300)
                wav = 0.25 * np.sin(2 * np.pi * f0 * t) + 0.02 * rng.standard_normal(n)
                write_wav(os.path.join(sdir, f"s{i:03d}.wav"),
                          wav.astype(np.float32), sr)
        for i in range(16):
            n = int(sr * rng.uniform(2.0, 5.0))
            write_wav(os.path.join(ndir, f"n{i:03d}.wav"),
                      (0.2 * rng.standard_normal(n)).astype(np.float32), sr)

        dataset = OnlineDataset(
            speech={"filestrs": [sdir]}, noise={"filestrs": [ndir]},
            sample_rate=sr, max_time=60000, snrs=(-6, -3, 0, 3, 6),
            infinite=True,
        )
        batch = int(os.environ.get("BENCH_BATCH", "16"))
        workers = int(os.environ.get("BENCH_LOADER_WORKERS", "4"))
        loader = DataLoader(
            dataset, batch_size=batch, num_workers=workers,
            buckets=default_buckets(), seed=0,
        )

        def epoch_stats():
            audio_s, utts = 0.0, 0
            for lengths, wavs, *rest in loader:
                audio_s += float(np.sum(lengths)) / sr
                utts += len(lengths)
            return audio_s, utts

        epoch_stats()  # warmup: page cache, thread pool, allocator
        iters = int(os.environ.get("BENCH_ITERS", "3"))
        times, audio_total, utt_total = [], 0.0, 0
        for _ in range(iters):
            t0 = time.perf_counter()
            a, u = epoch_stats()
            times.append(time.perf_counter() - t0)
            audio_total += a
            utt_total += u
        dt = float(np.sum(times))
        rtf = audio_total / dt
        print(json.dumps({
            "metric": "loader_audio_rtf_per_host",
            "value": round(rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtf / 10.0, 3),
            "utts_per_sec": round(utt_total / dt, 2),
            "workers": workers,
            "format": fmt,
        }))


def bench_pipeline():
    """End-to-end deployment throughput: disk -> decode -> batch ->
    h2d -> jitted enhance -> d2h -> 16-bit WAV encode -> disk, every
    stage overlapped (decode/encode thread pools, bounded queues,
    double-buffered device leg). This is the number a `--test`-over-a-
    corpus deployment actually gets (/root/reference/runner.py:521-622
    is the equivalent workflow), where the per-stage modes measure
    isolated ceilings.

    Reported alongside the e2e RTF: per-stage busy fractions, decode and
    encode RTFs, h2d/d2h bandwidth, the device-only RTF at this batch
    size, the device idle fraction, and the feed math (host cores needed
    to saturate one chip at the measured decode+encode rate). On this
    relay-tunneled dev host the host<->device path is pathologically
    slow (CLAUDE.md gotcha) — the bandwidth fields make that bottleneck
    attributable instead of hiding it in one opaque number.

    Knobs (VERDICT r4 #5 — measured, not extrapolated, feed math):
    - BENCH_PIPE_D2H=i16|f32 (default i16): i16 quantizes to 16-bit PCM
      ON DEVICE (the WAV target depth — no fidelity loss vs the host
      quantizer, which rounds identically) so the return stream ships
      2 bytes/sample instead of 4 and the encode leg writes frames with
      zero host-side conversion.
    - BENCH_PIPE_SWEEP=1,2,4,8: re-run the overlapped pipeline at each
      decode-worker count and report the measured scaling table next to
      the single-run feed math.
    """
    import queue
    import tempfile
    import threading

    from speech_enhancement_by_s3prl_tpu.data.audio_io import (
        load_audio,
        write_wav,
        write_wav_pcm16,
    )

    import jax

    from speech_enhancement_by_s3prl_tpu.utils.config import (
        setup_compile_cache,
    )

    setup_compile_cache("/root/.jax_cache")
    import jax.numpy as jnp

    import __graft_entry__ as graft

    enhance, (params, _, _) = graft.entry()

    sr = 16000
    utt_sec = int(os.environ.get("BENCH_UTT_SEC", "10"))
    T = sr * utt_sec
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    n_files = int(os.environ.get("BENCH_PIPE_FILES", str(batch * 3)))
    epochs = int(os.environ.get("BENCH_PIPE_EPOCHS", "2"))
    workers = int(os.environ.get("BENCH_PIPE_WORKERS", "4"))
    d2h_dtype = os.environ.get("BENCH_PIPE_D2H", "i16")
    assert d2h_dtype in ("i16", "f32"), d2h_dtype
    sweep = [
        int(w) for w in os.environ.get("BENCH_PIPE_SWEEP", "").split(",")
        if w.strip()
    ]

    def enhance_first(params, wavs, lengths):
        # serving output: channel-0 enhanced wav only
        out = enhance(params, wavs, lengths)
        if d2h_dtype == "i16":
            # on-device 16-bit PCM quantization: same rint(clip(...))
            # the host WAV writer applies, fused into the enhance
            # program — the d2h stream halves
            out = jnp.clip(
                jnp.rint(out.astype(jnp.float32) * 32767.0),
                -32768.0, 32767.0,
            ).astype(jnp.int16)
        return out

    fn = None
    if (
        os.environ.get("SE_EXEC_CACHE", "1") == "1"
        and jax.default_backend() != "cpu"
    ):
        from speech_enhancement_by_s3prl_tpu.models.lstm import DEFAULT_UNROLL
        from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
            compile_cached,
        )

        env_key = ",".join(
            f"{k}={os.environ.get(k, '')}"
            for k in (
                "BENCH_HEAD", "BENCH_DTYPE", "SE_PALLAS_LSTM",
                "SE_PALLAS_FUSED", "SE_LSTM_XW_BF16", "SE_LSTM_XW_INT8",
                "SE_PALLAS_TM", "SE_PALLAS_HS_BF16", "SE_PALLAS_MXU_BF16",
                "SE_PALLAS_GATES_BF16",
            )
        ) + f",unroll={DEFAULT_UNROLL}"
        fn = compile_cached(
            enhance_first, params,
            jnp.zeros((batch, 3, T), jnp.float32),
            jnp.full((batch,), T, jnp.int32),
            fn_key=f"bench_pipeline_b{batch}_d2h{d2h_dtype}|{env_key}",
            verbose=True,
        )
    if fn is None:
        fn = jax.jit(enhance_first)

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as root:
        indir = os.path.join(root, "in")
        outdir = os.path.join(root, "out")
        os.makedirs(indir), os.makedirs(outdir)
        t = np.arange(T) / sr
        for i in range(n_files):
            f0 = rng.uniform(100, 300)
            wav = (0.25 * np.sin(2 * np.pi * f0 * t)
                   + 0.05 * rng.standard_normal(T)).astype(np.float32)
            write_wav(os.path.join(indir, f"u{i:04d}.wav"), wav, sr)
        files = sorted(
            os.path.join(indir, f) for f in os.listdir(indir)
        )

        # -- isolated encode micro-bench (the WAV writer is production
        # scope; FLAC is decode-only — native/seio.cpp) ----------------
        enc_wav = (0.1 * rng.standard_normal(T)).astype(np.float32)
        n_enc = 32
        t0 = time.perf_counter()
        for i in range(n_enc):
            write_wav(os.path.join(outdir, f"enc{i}.wav"), enc_wav, sr)
        encode_rtf = n_enc * utt_sec / (time.perf_counter() - t0)

        # -- overlapped pipeline ---------------------------------------
        lengths_dev = jnp.full((batch,), T, jnp.int32)
        total_utts = (n_files * epochs // batch) * batch

        def run_once(n_workers):
            """One overlapped end-to-end run at this decode-worker
            count; returns (e2e_rtf, wall, audio_s, busy, utts)."""
            q_dec: queue.Queue = queue.Queue(maxsize=batch * 2)
            q_batch: queue.Queue = queue.Queue(maxsize=2)
            q_out: queue.Queue = queue.Queue(maxsize=2)
            busy = {"decode": 0.0, "h2d": 0.0, "device": 0.0, "d2h": 0.0,
                    "encode": 0.0}
            lock = threading.Lock()

            def add(stage, dt):
                with lock:
                    busy[stage] += dt

            def decoder(paths):
                for p in paths:
                    t0 = time.perf_counter()
                    wav, _ = load_audio(p, sr=sr)
                    wav = np.broadcast_to(
                        wav[: T] if len(wav) >= T
                        else np.pad(wav, (0, T - len(wav))),
                        (3, T),
                    )  # channels: (noisy, clean, noise) — serving uses ch 0
                    add("decode", time.perf_counter() - t0)
                    q_dec.put(np.ascontiguousarray(wav, np.float32))

            def batcher():
                got = 0
                while got < total_utts:
                    rows = [q_dec.get() for _ in range(batch)]
                    got += batch
                    q_batch.put(np.stack(rows))
                q_batch.put(None)

            def device_leg():
                while True:
                    host_batch = q_batch.get()
                    if host_batch is None:
                        q_out.put(None)
                        return
                    t0 = time.perf_counter()
                    dev = jax.device_put(host_batch)
                    # block_until_ready returns early on the axon tunnel
                    # (CLAUDE.md gotcha); a 4-byte fetch is the reliable
                    # transfer-complete sync (+~35 ms RTT, noise vs the
                    # multi-second relay transfer it bounds)
                    np.asarray(dev[0, 0, :1])
                    t1 = time.perf_counter()
                    out = fn(params, dev, lengths_dev)
                    q_out.put(out)  # dispatch async; encoder's d2h syncs
                    add("h2d", t1 - t0)

            def encoder(counter):
                idx = 0
                while True:
                    out = q_out.get()
                    if out is None:
                        return
                    t0 = time.perf_counter()
                    host = np.asarray(out)  # d2h fetch (+ device sync)
                    t1 = time.perf_counter()
                    for row in host:
                        path = os.path.join(outdir, f"o{idx:05d}.wav")
                        if d2h_dtype == "i16":
                            write_wav_pcm16(path, row, sr)
                        else:
                            write_wav(path, row, sr)
                        idx += 1
                    add("d2h", t1 - t0)
                    add("encode", time.perf_counter() - t1)
                    counter["utts"] = idx

            paths = (files * epochs)[:total_utts]
            counter: dict = {"utts": 0}
            threads = [
                threading.Thread(
                    target=decoder, args=(paths[w::n_workers],), daemon=True
                )
                for w in range(n_workers)
            ] + [
                threading.Thread(target=batcher, daemon=True),
                threading.Thread(target=device_leg, daemon=True),
            ]
            enc_thread = threading.Thread(
                target=encoder, args=(counter,), daemon=True
            )
            t0 = time.perf_counter()
            for th in threads:
                th.start()
            enc_thread.start()
            enc_thread.join()
            wall = time.perf_counter() - t0
            audio_s = counter["utts"] * utt_sec
            return audio_s / wall, wall, audio_s, busy, counter["utts"]

        # warmup: one batch end to end (compile + page cache + pools)
        warm = np.stack([
            np.broadcast_to(load_audio(files[i], sr=sr)[0][:T], (3, T))
            for i in range(batch)
        ]).astype(np.float32)
        np.asarray(fn(params, jax.device_put(warm), lengths_dev))

        worker_sweep = []
        for w in sweep:
            if w == workers:
                continue
            rtf_w, wall_w, audio_w, busy_w, _ = run_once(w)
            worker_sweep.append({
                "workers": w,
                "e2e_rtf": round(rtf_w, 2),
                "decode_rtf_per_core": round(
                    audio_w / max(busy_w["decode"], 1e-9), 2
                ),
                "decode_busy_frac": round(busy_w["decode"] / wall_w, 4),
            })

        e2e_rtf, wall, audio_s, busy, n_done = run_once(workers)

        # device-only RTF at this batch size: dispatch 3 iterations from
        # an on-device input, sync once (the per-stage ceiling the e2e
        # number is fed against)
        dev_in = jax.device_put(warm)
        out = fn(params, dev_in, lengths_dev)
        float(jnp.asarray(out).sum())
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(params, dev_in, lengths_dev)
        float(jnp.asarray(out).sum())
        device_rtf = 3 * batch * utt_sec / (time.perf_counter() - t0)

        bytes_in = total_utts * 3 * T * 4
        bytes_out = total_utts * T * (2 if d2h_dtype == "i16" else 4)
        # busy["decode"] sums per-worker seconds, so audio/busy is the
        # per-core decode rate; host cores to keep one chip fed =
        # device RTF x host-core-seconds per audio-second (decode+encode)
        cores_needed = device_rtf * (
            (busy["decode"] + busy["encode"]) / max(audio_s, 1e-9)
        )
        print(json.dumps({
            "metric": "pipeline_e2e_rtf_per_chip",
            "value": round(e2e_rtf, 2),
            "unit": "x_realtime",
            "vs_baseline": round(e2e_rtf / 10.0, 3),
            "device_rtf": round(device_rtf, 2),
            "device_idle_frac": round(
                max(0.0, 1.0 - (audio_s / device_rtf) / wall), 4
            ),
            "decode_rtf_per_core": round(
                audio_s / max(busy["decode"], 1e-9), 2
            ),
            "encode_rtf_per_core": round(encode_rtf, 2),
            "h2d_gbps": round(bytes_in / max(busy["h2d"], 1e-9) / 1e9, 4),
            "d2h_gbps": round(bytes_out / max(busy["d2h"], 1e-9) / 1e9, 4),
            "busy_frac": {k: round(v / wall, 4) for k, v in busy.items()},
            "cores_to_saturate_chip": round(cores_needed, 1),
            "batch": batch,
            "utts": total_utts,
            "workers": workers,
            "d2h_dtype": d2h_dtype,
            **({"worker_sweep": worker_sweep} if worker_sweep else {}),
        }))


def run_all():
    names = [
        m.strip()
        for m in os.environ.get(
            "BENCH_MODES", ",".join(n for n, _ in ALL_MODES)
        ).split(",")
        if m.strip()
    ]
    budget = float(os.environ.get("BENCH_TOTAL_BUDGET", "2400"))
    t_start = time.time()
    modes: dict = {}
    skipped = []
    for name, overrides in ALL_MODES:
        if name not in names:
            continue
        if time.time() - t_start > budget:
            skipped.append(name)
            continue
        env = dict(os.environ)
        env.update(overrides)
        env.pop("BENCH_MODES", None)
        try:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, capture_output=True, text=True,
                timeout=float(os.environ.get("BENCH_MODE_TIMEOUT", "1500")),
            )
            line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
            if out.returncode == 0 and line:
                try:
                    modes[name] = json.loads(line)
                except json.JSONDecodeError:
                    # a stray non-JSON last line (library print at exit)
                    # must cost only this mode, not the whole scoreboard
                    modes[name] = {"error": f"non-JSON output: {line[-300:]}"}
            else:
                modes[name] = {"error": (out.stderr or "no output")[-800:]}
        except subprocess.TimeoutExpired:
            modes[name] = {"error": "timeout"}
        print(f"[bench:all] {name}: "
              f"{modes[name].get('value', modes[name].get('error'))}",
              file=sys.stderr, flush=True)
        # let the previous subprocess's tunnel claim fully release before
        # the next mode opens a session: back-to-back transitions measured
        # a one-off 2.2x slowdown (upstream 4,037x in an all-run vs
        # 8,889/8,917x solo immediately after)
        time.sleep(float(os.environ.get("BENCH_MODE_SETTLE", "10")))

    # headline = enhance if it SUCCEEDED (an {'error': ...} entry is
    # truthy but has no 'value'), else the first succeeded mode
    head = modes.get("enhance", {})
    if "value" not in head:
        head = next((v for v in modes.values() if "value" in v), None)
    payload = {
        "metric": (head or {}).get("metric", "enhance_rtf_per_chip"),
        "value": (head or {}).get("value", 0.0),
        "unit": (head or {}).get("unit", "x_realtime"),
        "vs_baseline": (head or {}).get("vs_baseline", 0.0),
        "modes": modes,
    }
    if skipped:
        payload["skipped"] = skipped
    print(json.dumps(payload))


def main():
    if os.environ.get("BENCH_MODE", "all") == "all":
        # dispatch before any jax import: the parent must not claim the
        # (single-client) TPU that its mode subprocesses need
        run_all()
        return
    if os.environ.get("BENCH_MODE") == "loader":
        # host-only: must run before any jax/device setup below
        bench_loader()
        return
    if os.environ.get("BENCH_CPU") == "1":
        # CI/smoke: the ambient JAX_PLATFORMS=axon pin wins over env vars
        # (sitecustomize imports jax at interpreter start — CLAUDE.md),
        # so CPU must be forced through the config API
        import jax

        jax.config.update("jax_platforms", "cpu")
    # bf16 STORAGE of the LSTM input projections halves the dominant HBM
    # stream (+25% RTF at B=512; output fidelity vs f32 measured at
    # >100 dB SI-SDR — docs/PERF.md). Inference-bench default; the
    # framework's training default stays f32. MUST be set before ANY
    # package import (models/lstm.py reads it at import time).
    os.environ.setdefault("SE_LSTM_XW_BF16", "1")
    # the scan-unroll sweet spot is per-PROGRAM: 4 wins for enhance/train,
    # but the sampler's vmap(grad) scoring program measures best at 8
    # (docs/PERF.md score section). Must be set before package import too.
    # (Irrelevant under the capture+kernel scoreboard default — kept for
    # the SE_SCORE_IMPL=vmap scan fallback.)
    if os.environ.get("BENCH_MODE") == "score":
        os.environ.setdefault("SE_LSTM_UNROLL", "8")

    if os.environ.get("BENCH_MODE") == "pipeline":
        bench_pipeline()
        return

    import jax

    # SE_PRNG=rbg swaps jax's key impl for dropout-mask generation: the
    # default threefry2x32 is a crypto-strength generator whose VPU cost
    # scales with mask size — material for attention-dropout training
    # where masks are (B, N, T, T). rbg uses the hardware RNG op.
    if os.environ.get("SE_PRNG"):
        jax.config.update("jax_default_prng_impl", os.environ["SE_PRNG"])

    # persistent compile cache: remote compiles through the axon tunnel are
    # expensive (tens of seconds each); cache them across runs (TPU only —
    # CPU AOT cache entries can abort on machine-feature mismatch)
    from speech_enhancement_by_s3prl_tpu.utils.config import (
        setup_compile_cache,
    )

    setup_compile_cache("/root/.jax_cache")
    import jax.numpy as jnp

    # SE_PALLAS_LSTM=1 selects the Pallas recurrence kernel, but mosaic
    # custom-calls bypass the persistent compile cache (~12 min recompile
    # per process through the remote-compile tunnel) — opt-in only.
    import __graft_entry__ as graft

    enhance, (params, _, _) = graft.entry()

    def scan_twin_enhance():
        """The cost-analysis subject: the same enhance math with the scan
        recurrence — Pallas custom calls are opaque to any flop counter."""
        if os.environ.get("SE_PALLAS_LSTM", "0") != "1":
            return enhance, "jaxpr"
        return graft.make_enhance(graft._build(use_pallas=False)), "jaxpr_scan_twin"

    sr = 16000
    utt_sec = int(os.environ.get("BENCH_UTT_SEC", "10"))
    T = sr * utt_sec
    mode = os.environ.get("BENCH_MODE", "enhance")
    # per-mode HBM sweet spots measured on v5e (docs/PERF.md): enhance
    # peaks at 768; eval reaches 768 too now that wav_out='first' +
    # chunked metric kernels freed the buffers that used to OOM it;
    # train peaks at 128 (144/160/256-remat all lose); upstream at 512
    default_batch = {
        "enhance": "768", "eval": "768", "train": "128", "upstream": "512",
        "mockingjay": "32", "score": "256",
    }.get(mode, "768")
    batch = int(os.environ.get("BENCH_BATCH", default_batch))
    # generate inputs ON DEVICE: the axon dev tunnel's host<->device path is
    # slow and must not pollute the compute measurement
    wavs = jax.jit(
        lambda k: jax.random.normal(k, (batch, 3, T), jnp.float32) * 0.05
    )(jax.random.PRNGKey(0))
    lengths = jnp.full((batch,), T, jnp.int32)

    iters = int(os.environ.get("BENCH_ITERS", "10"))

    if os.environ.get("BENCH_MODE", "enhance") == "latency":
        # single-request serving latency: the device completion time of ONE
        # B=1 enhance call (the serve.py fast path for an uncontended
        # request). TPU cores execute one program at a time, so dispatching
        # the loop back-to-back and syncing once measures per-call wall
        # time RTT-free (the one end-of-run fetch amortizes to <1 ms).
        iters = int(os.environ.get("BENCH_ITERS", "50"))
        from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
            compile_cached,
        )

        def enhance_sum1(params, wavs, lengths):
            return enhance(params, wavs, lengths).sum()

        lat_ms = {}
        for sec in (10, 1):
            Tl = sr * sec
            w1 = jax.jit(
                lambda k, tl=Tl: jax.random.normal(k, (1, 3, tl), jnp.float32)
                * 0.05
            )(jax.random.PRNGKey(0))
            l1 = jnp.full((1,), Tl, jnp.int32)
            f = None
            if (
                os.environ.get("SE_EXEC_CACHE", "1") == "1"
                and jax.default_backend() != "cpu"
            ):
                f = compile_cached(
                    enhance_sum1, params, w1, l1,
                    fn_key=f"bench_latency_{sec}s|"
                    + ",".join(
                        f"{k}={os.environ.get(k, '')}"
                        for k in ("SE_PALLAS_LSTM", "SE_PALLAS_HS_BF16",
                                  "SE_LSTM_XW_BF16", "SE_PALLAS_TM")
                    ),
                    verbose=True,
                )
            if f is None:
                f = jax.jit(enhance_sum1)
            float(f(params, w1, l1))  # compile + warmup
            t0 = time.perf_counter()
            out = None
            for _ in range(iters):
                out = f(params, w1, l1)
            float(out)
            lat_ms[sec] = (time.perf_counter() - t0) / iters * 1000.0
        twin, src = scan_twin_enhance()
        w10 = jnp.zeros((1, 3, sr * 10), jnp.float32)
        l10 = jnp.full((1,), sr * 10, jnp.int32)
        print(json.dumps({
            "metric": "serve_latency_b1_10s_ms",
            "value": round(lat_ms[10], 3),
            "unit": "ms",
            # single-stream realtime factor vs the 10x-RT north star
            "vs_baseline": round((10.0 / (lat_ms[10] / 1000.0)) / 10.0, 3),
            "latency_b1_1s_ms": round(lat_ms[1], 3),
            **roofline_fields(
                lat_ms[10] / 1000.0,
                lambda p, w, l: twin(p, w, l).sum(), params, w10, l10, src=src,
            ),
        }))
        return

    if os.environ.get("BENCH_MODE", "enhance") == "train":
        # full train-step throughput (forward+backward+BertAdam update).
        # Batches are generated on device — CLI training through the axon
        # dev tunnel is bottlenecked by the relay's host->device transfer
        # path, which real TPU VMs don't have.
        builder = graft._build()
        rng = jax.random.PRNGKey(0)
        state = builder.init_state(rng, wavs[:2], lengths[:2])
        up = builder.upstream_params()
        # AOT exec cache for the train step too: with SE_PALLAS_LSTM=1 the
        # differentiable time-major kernel is a Mosaic custom call that the
        # persistent HLO cache skips — without this every process pays the
        # full tunnel recompile (~1-3 min)
        step = None
        if (
            os.environ.get("SE_EXEC_CACHE", "1") == "1"
            and jax.default_backend() != "cpu"
        ):
            from speech_enhancement_by_s3prl_tpu.models.lstm import (
                DEFAULT_UNROLL,
            )
            from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
                compile_cached,
            )

            env_key = ",".join(
                f"{k}={os.environ.get(k, '')}"
                for k in (
                    "BENCH_HEAD", "BENCH_DTYPE", "SE_PALLAS_LSTM",
                    "SE_PALLAS_FUSED", "SE_LSTM_XW_BF16", "SE_LSTM_XW_INT8",
                    "SE_PALLAS_TM", "SE_PALLAS_HS_BF16", "SE_LSTM_REMAT",
                    "SE_PALLAS_VJP_BF16", "SE_PALLAS_MXU_BF16",
                    "SE_PALLAS_GATES_BF16",
                )
            ) + f",unroll={DEFAULT_UNROLL}"
            raw = compile_cached(
                builder.train_step_raw(),
                state, wavs, lengths, rng, up,
                fn_key=f"bench_train|{env_key}", donate_argnums=(0,),
                verbose=True,
            )
            if raw is not None:
                step = lambda s, w, l, r: raw(s, w, l, r, up)  # noqa: E731
        if step is None:
            step = builder.train_step_fn()
        state, stats = step(state, wavs, lengths, rng)  # compile + warmup
        float(stats["loss"])
        # dispatch the whole run, sync ONCE at the end: each per-iteration
        # device->host scalar fetch through the axon tunnel costs ~35 ms
        # of pure RTT while the chip idles (measured: tiny-program
        # roundtrip 34.7 ms — docs/PERF.md round-3 methodology note).
        # The state dependency chains the steps on device.
        t0 = time.perf_counter()
        for _ in range(iters):
            state, stats = step(state, wavs, lengths, rng)
        float(stats["loss"])  # scalar fetch = sync point for the chain
        dt = time.perf_counter() - t0
        audio_seconds = batch * utt_sec * iters
        twin_src = "jaxpr"
        twin_builder = builder
        if os.environ.get("SE_PALLAS_LSTM", "0") == "1":
            twin_builder = graft._build(use_pallas=False)
            twin_src = "jaxpr_scan_twin"
        print(json.dumps({
            "metric": "train_audio_rtf_per_chip",
            "value": round(audio_seconds / dt, 2),
            "unit": "x_realtime",
            "vs_baseline": round((audio_seconds / dt) / 10.0, 3),
            **roofline_fields(
                dt / iters, twin_builder.train_step_raw(),
                state, wavs, lengths, rng, up, src=twin_src,
            ),
        }))
        return

    if os.environ.get("BENCH_MODE", "enhance") == "upstream":
        # TERA/Mockingjay SSL encoder forward (6 x 768 x 12, the MXU-heavy
        # path): (B, T', 80) log-mel+delta frames -> hidden states
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
                if os.environ.get("BENCH_DTYPE", "bf16") in ("bf16", "bfloat16")
                else jnp.float32
            ),
        )
        frames = utt_sec * 100 + 1
        feats = jax.jit(
            lambda k: jax.random.normal(k, (batch, frames, 80), jnp.float32)
        )(jax.random.PRNGKey(0))

        fwd = jax.jit(lambda p, f: up(f, params=p).sum())
        float(fwd(up.params, feats))  # compile + warmup
        # single end-of-run sync (see train mode: ~35 ms RTT per fetch);
        # programs execute in submission order, so syncing the last
        # output syncs the whole run
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fwd(up.params, feats)
        float(out)
        dt = time.perf_counter() - t0
        audio_seconds = batch * utt_sec * iters
        print(json.dumps({
            "metric": "upstream_audio_rtf_per_chip",
            "value": round(audio_seconds / dt, 2),
            "unit": "x_realtime",
            "vs_baseline": round((audio_seconds / dt) / 10.0, 3),
            **roofline_fields(
                dt / iters, lambda p, f: up(f, params=p).sum(),
                up.params, feats,
            ),
        }))
        return

    if os.environ.get("BENCH_MODE", "enhance") == "mockingjay":
        # joint upstream finetuning (BASELINE config 4 workload): the full
        # TERA encoder (6 x 768 x 12) + SpecPredictionHead trained
        # end-to-end as ONE downstream model (--downstream Mockingjay),
        # dropout live — forward + backward + BertAdam per step
        import dataclasses

        from speech_enhancement_by_s3prl_tpu.models.spec_head import (
            Mockingjay,
        )
        from speech_enhancement_by_s3prl_tpu.models.transformer import (
            TransformerConfig,
        )

        base = graft._build(delta=1)
        # BENCH_MJ_DROPOUT overrides both dropout rates (diagnostic: rate
        # 0 routes attention through the fused no-probs path, isolating
        # what the explicit dropout-live path costs — docs/PERF.md)
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
            # SE_TF_REMAT=1: rematerialized encoder layers — trades one
            # extra forward for the FFN residuals, raising the batch cap
            remat=os.environ.get("SE_TF_REMAT", "0") == "1",
        )
        builder = dataclasses.replace(
            base, model=model, from_waveform=True, from_rawfeature=False
        )
        rng = jax.random.PRNGKey(0)
        state = builder.init_state(rng, wavs[:2], lengths[:2])
        # AOT exec cache: SE_ATTN_IMPL=flash makes the step a Mosaic
        # custom-call program the persistent HLO cache skips (~6 min
        # recompile per process through the tunnel otherwise)
        step = None
        if (
            os.environ.get("SE_EXEC_CACHE", "1") == "1"
            and jax.default_backend() != "cpu"
        ):
            from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
                compile_cached,
            )

            up0 = builder.upstream_params()
            env_key = ",".join(
                f"{k}={os.environ.get(k, '')}"
                for k in (
                    "BENCH_DTYPE", "BENCH_MJ_DROPOUT", "SE_ATTN_IMPL",
                    "SE_ATTN_FLASH_BLOCK", "SE_ATTN_DROPOUT_CHUNK",
                    "SE_HIDDEN_DROPOUT_IMPL", "SE_DROPOUT_IMPL", "SE_PRNG",
                    "SE_TF_REMAT",
                )
            )
            raw = compile_cached(
                builder.train_step_raw(),
                state, wavs, lengths, rng, up0,
                fn_key=f"bench_mockingjay|{env_key}", donate_argnums=(0,),
                verbose=True,
            )
            if raw is not None:
                step = lambda s, w, l, r: raw(s, w, l, r, up0)  # noqa: E731
        if step is None:
            step = builder.train_step_fn()
        state, stats = step(state, wavs, lengths, rng)  # compile + warmup
        float(stats["loss"])
        # single end-of-run sync (see train mode: ~35 ms RTT per fetch)
        t0 = time.perf_counter()
        for _ in range(iters):
            state, stats = step(state, wavs, lengths, rng)
        float(stats["loss"])
        dt = time.perf_counter() - t0
        audio_seconds = batch * utt_sec * iters
        print(json.dumps({
            "metric": "mockingjay_train_audio_rtf_per_chip",
            "value": round(audio_seconds / dt, 2),
            "unit": "x_realtime",
            "vs_baseline": round((audio_seconds / dt) / 10.0, 3),
            **roofline_fields(
                dt / iters, builder.train_step_raw(),
                state, wavs, lengths, rng, builder.upstream_params(),
            ),
        }))
        return

    if os.environ.get("BENCH_MODE", "enhance") == "score":
        # active-learning per-sample gradient embeddings vs the
        # reference's per-utterance backward loop
        # (/root/reference/sampler.py:89-106). Engine from SE_SCORE_IMPL:
        # the scoreboard default is 'capture' (one batched backward +
        # outer-product einsums, composes with the Pallas kernel);
        # 'vmap' is the vmap(grad) reference path.
        from speech_enhancement_by_s3prl_tpu.active.sampler import (
            make_scoring_fn,
        )

        builder = graft._build()
        rng = jax.random.PRNGKey(0)
        state = builder.init_state(rng, wavs[:2], lengths[:2])
        # BENCH_SCORE_LAYERID: LSTM layer to embed (default 0, the
        # reference's usual pressure valve); 'none' scores the whole tree
        lid_env = os.environ.get("BENCH_SCORE_LAYERID", "0")
        layerid = None if lid_env.lower() in ("none", "") else int(lid_env)
        scoring = make_scoring_fn(builder, active_layerid=layerid)
        # route the per-sample program through the AOT executable cache:
        # under SE_PALLAS_LSTM=1 it contains Mosaic custom-calls the
        # persistent HLO cache skips (same treatment as train/enhance)
        from speech_enhancement_by_s3prl_tpu.models.lstm import (
            DEFAULT_UNROLL,
        )
        from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
            compile_cached,
        )

        env_key = ",".join(
            f"{k}={os.environ.get(k, '')}"
            for k in (
                "BENCH_DTYPE", "SE_PALLAS_LSTM", "SE_LSTM_XW_BF16",
                "SE_PALLAS_TM", "SE_PALLAS_HS_BF16", "SE_PALLAS_VJP_BF16",
                "SE_SCORE_IMPL",
            )
        ) + f",unroll={DEFAULT_UNROLL},layerid={layerid}"
        key0 = jax.random.PRNGKey(0)
        fn = compile_cached(
            scoring.raw_per_sample, state.params, wavs, lengths, key0,
            fn_key=f"score_{scoring.impl}_{env_key}",
        )
        if fn is None:  # AOT unsupported on this runtime
            fn = lambda p, w, l, k: scoring(p, w, l, rng=k)  # noqa: E731
        g = fn(state.params, wavs, lengths, key0)
        float(jnp.asarray(g).sum())  # warmup
        # single end-of-run sync (see train mode: ~35 ms RTT per fetch)
        t0 = time.perf_counter()
        for _ in range(iters):
            g = fn(state.params, wavs, lengths, key0)
        float(jnp.asarray(g).sum())
        dt = time.perf_counter() - t0
        utts = batch * iters
        twin_src = "jaxpr"
        twin_scoring = scoring
        if os.environ.get("SE_PALLAS_LSTM", "0") == "1":
            twin_scoring = make_scoring_fn(
                graft._build(use_pallas=False), active_layerid=layerid
            )
            twin_src = "jaxpr_scan_twin"
        print(json.dumps({
            "metric": "sampler_scoring_utts_per_sec_per_chip",
            "value": round(utts / dt, 2),
            "unit": "utts_per_sec",
            "vs_baseline": round((utts / dt) / 1.0, 3),
            **roofline_fields(
                dt / iters, twin_scoring.raw_per_sample,
                state.params, wavs, lengths, key0, src=twin_src,
            ),
        }))
        return

    if os.environ.get("BENCH_MODE", "enhance") == "eval":
        # full eval-step throughput: enhance + loss + ON-DEVICE metrics
        # (sisdr + full STOI with silent-frame removal) — the reference
        # scores metrics per utterance on a 12-process CPU pool instead
        import dataclasses

        from speech_enhancement_by_s3prl_tpu.metrics import (
            DEVICE_BATCH_METRICS,
        )

        metrics = tuple(
            m.strip()
            for m in os.environ.get("BENCH_EVAL_METRICS", "sisdr,stoi").split(",")
            if m.strip()
        )
        unknown = [m for m in metrics if m not in DEVICE_BATCH_METRICS]
        assert not unknown, (
            f"BENCH_EVAL_METRICS has no device kernel for {unknown}; "
            f"choose from {DEVICE_BATCH_METRICS}"
        )
        builder = dataclasses.replace(graft._build(), eval_metrics=metrics)
        rng = jax.random.PRNGKey(0)
        state = builder.init_state(rng, wavs[:2], lengths[:2])
        up = builder.upstream_params()
        # wav_out='first' is what the runner uses when all metrics score
        # on device: frees three full-batch output buffers (trainer.py).
        # Chunked metric kernels (lax.map over sub-batches of 128) cut the
        # metric intermediates' peak HBM; together these raise the eval
        # ceiling from B=640 to the faster B=768 (docs/PERF.md eval table).
        os.environ.setdefault("SE_METRIC_CHUNK", "128")
        # AOT exec cache for the eval step too: with the (default) Pallas
        # recurrence the persistent HLO cache skips the Mosaic custom-call
        # program, so later processes would otherwise recompile (~30s-3min
        # through the tunnel).
        step = None
        if (
            os.environ.get("SE_EXEC_CACHE", "1") == "1"
            and jax.default_backend() != "cpu"
        ):
            from speech_enhancement_by_s3prl_tpu.models.lstm import (
                DEFAULT_UNROLL,
            )
            from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
                compile_cached,
            )

            env_key = ",".join(
                f"{k}={os.environ.get(k, '')}"
                for k in (
                    "BENCH_HEAD", "BENCH_DTYPE", "SE_PALLAS_LSTM",
                    "SE_PALLAS_FUSED", "SE_LSTM_XW_BF16", "SE_LSTM_XW_INT8",
                    "SE_PALLAS_BB", "SE_PALLAS_CHUNK", "SE_PALLAS_TM",
                    "SE_PALLAS_HS_BF16", "SE_PALLAS_MXU_BF16",
                    "SE_PALLAS_GATES_BF16", "SE_METRIC_CHUNK",
                    "BENCH_EVAL_METRICS", "SE_METRIC_PRECISION",
                )
            ) + f",unroll={DEFAULT_UNROLL}"
            raw = compile_cached(
                builder.eval_step_raw(wav_out="first"),
                state.params, wavs, lengths, up,
                fn_key=f"bench_eval|{env_key}", verbose=True,
            )
            if raw is not None:
                step = lambda p, w, l: raw(p, w, l, up)  # noqa: E731
        if step is None:
            step = builder.eval_step_fn(wav_out="first")
        out = step(state.params, wavs, lengths)  # compile + warmup
        float(out["loss"])
        # single end-of-run sync (see train mode: ~35 ms RTT per fetch);
        # the final fetch still touches every metric output, not a
        # hardcoded name
        t0 = time.perf_counter()
        for _ in range(iters):
            out = step(state.params, wavs, lengths)
        float(out["loss"]) + sum(
            float(v.sum()) for v in out["scores"].values()
        )
        dt = time.perf_counter() - t0
        audio_seconds = batch * utt_sec * iters
        twin_src = "jaxpr"
        twin_builder = builder
        if os.environ.get("SE_PALLAS_LSTM", "0") == "1":
            twin_builder = dataclasses.replace(
                graft._build(use_pallas=False), eval_metrics=metrics
            )
            twin_src = "jaxpr_scan_twin"
        print(json.dumps({
            "metric": "eval_audio_rtf_per_chip",
            "value": round(audio_seconds / dt, 2),
            "unit": "x_realtime",
            "vs_baseline": round((audio_seconds / dt) / 10.0, 3),
            **roofline_fields(
                dt / iters, twin_builder.eval_step_raw(wav_out="first"),
                state.params, wavs, lengths, up, src=twin_src,
            ),
        }))
        return

    # scalar-reduced output: the sum depends on every enhanced sample, so
    # the whole pipeline executes, while the end-of-run device->host
    # fetch (which is the only reliable sync point through the axon tunnel
    # — block_until_ready returns early there) moves 4 bytes, not 20 MB.
    def enhance_sum(params, wavs, lengths):
        return enhance(params, wavs, lengths).sum()

    # AOT executable cache: Mosaic custom-calls (SE_PALLAS_LSTM=1) bypass
    # the persistent compile cache (~12 min recompile per process through
    # the tunnel); serialize the compiled executable instead so later
    # processes skip compilation entirely. TPU-only (CPU AOT is unsafe).
    fn = None
    if (
        os.environ.get("SE_EXEC_CACHE", "1") == "1"
        and jax.default_backend() != "cpu"
    ):
        from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
            compile_cached,
        )

        from speech_enhancement_by_s3prl_tpu.models.lstm import (
            DEFAULT_UNROLL,
        )

        env_key = ",".join(
            f"{k}={os.environ.get(k, '')}"
            for k in (
                "BENCH_HEAD", "BENCH_DTYPE", "SE_PALLAS_LSTM",
                "SE_PALLAS_FUSED", "SE_LSTM_XW_BF16", "SE_LSTM_XW_INT8",
                "SE_PALLAS_BB", "SE_PALLAS_CHUNK", "SE_PALLAS_TM",
                "SE_PALLAS_HS_BF16", "SE_PALLAS_MXU_BF16",
                "SE_PALLAS_GATES_BF16",
            )
        ) + f",unroll={DEFAULT_UNROLL}"
        fn = compile_cached(
            enhance_sum, params, wavs, lengths,
            fn_key=f"bench_enhance|{env_key}", verbose=True,
        )
    if fn is None:
        fn = jax.jit(enhance_sum)
    float(fn(params, wavs, lengths))  # compile + warmup

    # dispatch every iteration, sync once: per-iteration scalar fetches
    # each cost ~35 ms of pure tunnel RTT while the chip idles (measured
    # round 3, docs/PERF.md methodology); programs run in submission
    # order so the last fetch syncs the whole run
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(params, wavs, lengths)
    float(out)
    dt = time.perf_counter() - t0

    audio_seconds = batch * utt_sec * iters
    rtf = audio_seconds / dt
    twin, twin_src = scan_twin_enhance()
    print(
        json.dumps(
            {
                "metric": "enhance_rtf_per_chip",
                "value": round(rtf, 2),
                "unit": "x_realtime",
                "vs_baseline": round(rtf / 10.0, 3),
                **roofline_fields(
                    dt / iters, lambda p, w, l: twin(p, w, l).sum(),
                    params, wavs, lengths, src=twin_src,
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
