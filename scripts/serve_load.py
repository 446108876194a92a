#!/usr/bin/env python
"""Serving load test: concurrent clients against the live HTTP server.

BENCH_MODE=latency measures the uncontended B=1 device time;
this script measures what serving actually delivers under load — the
MicroBatcher's coalescing behavior (serve.py:32-105) across concurrency
levels, with mixed request durations spanning multiple buckets:

- p50/p99 request latency and aggregate RTF at each --levels entry;
- the bucket-confinement invariant asserted under load: responses for
  fixed probe inputs vs their solo responses. Default serving compiles
  one program per pow2 batch shape, and XLA reassociates across shapes
  (~1 float32 ulp, measured 4.5e-8), so the default-mode assertion is
  max |PCM delta| <= 1 16-bit step (with the exact-match fraction
  reported); `--fixed_batch` pads every group to max_batch rows — ONE
  program per bucket — and there the assertion is BYTE-identity.

The server runs in-process (one TPU client per host — CLAUDE.md) with
the threading HTTP server + micro-batcher, exactly the production
`python serve.py --workers N` wiring; clients are threads POSTing
/enhance over localhost HTTP.

Two-step usage (the ckpt build must not claim the TPU the serving
process needs, so it runs on CPU in its own process):

  python scripts/serve_load.py --make_ckpt --workdir /tmp/serveload
  python scripts/serve_load.py --workdir /tmp/serveload \
      [--levels 1,4,16] [--requests 8] [--cpu]

Prints one JSON line with per-level results + identity_ok.
"""
from __future__ import annotations

import argparse
import http.client
import io
import json
import os
import sys
import threading
import time
import wave as wavelib

import numpy as np

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

SR = 16000


def _wav_bytes(wav: np.ndarray) -> bytes:
    buf = io.BytesIO()
    pcm = np.rint(np.clip(wav * 32767.0, -32768, 32767)).astype("<i2")
    with wavelib.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SR)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def make_ckpt(workdir: str) -> None:
    """One-step flagship-geometry training (LSTM 256x3 bidir, vcb.yaml
    schema) on a tiny synthetic corpus -> a natural checkpoint the
    serving loader consumes. CPU-only by design."""
    import yaml

    import jax

    jax.config.update("jax_platforms", "cpu")

    from speech_enhancement_by_s3prl_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    corpus = os.path.join(workdir, "corpus")
    for sub in ("speech", "noise"):
        os.makedirs(os.path.join(corpus, sub), exist_ok=True)
    for i in range(8):
        n = int(SR * rng.uniform(1.0, 2.0))
        t = np.arange(n) / SR
        sp = 0.3 * np.sin(2 * np.pi * rng.uniform(120, 260) * t)
        write_wav(f"{corpus}/speech/s{i}.wav", sp.astype(np.float32), SR)
        write_wav(f"{corpus}/noise/n{i}.wav",
                  (0.1 * rng.standard_normal(n)).astype(np.float32), SR)

    cfg = yaml.safe_load(open(os.path.join(REPO_ROOT, "config/vcb.yaml")))
    for split in ("train", "test"):
        sec = cfg[f"OnlineDataset_{split}"]
        sec["speech"]["filestrs"] = f"{corpus}/speech"
        sec["speech"]["sample_num"] = 2
        sec["speech"]["select_sampled"] = split == "test"
        sec["noise"]["filestrs"] = f"{corpus}/noise"
        sec["max_time"] = 2000
    cfg["runner"].update(total_step=1, log_step=1, eval_step=10,
                         save_step=1, eval_metrics=["sisdr"])
    cfg["model"]["LSTM"] = {"hidden_size": 256, "num_layers": 3,
                            "bidirectional": True}
    cfg_path = os.path.join(workdir, "flagship.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))

    import run_downstream

    old = sys.argv
    sys.argv = [
        os.path.join(REPO_ROOT, "run_downstream.py"),
        "--name", "ckpt", "--config", cfg_path,
        "--upstream", "baseline", "--upstream2", "baseline",
        "--from_rawfeature", "--downstream", "LSTM", "--objective", "L1",
        "--expdir", os.path.join(workdir, "exp"),
        "--dev_num", "1", "--n_jobs", "1", "--cpu",
    ]
    try:
        run_downstream.main()
    finally:
        sys.argv = old
    print(f"[serve_load] ckpt under {workdir}/exp/ckpt")


def start_server(ckpt: str, cpu: bool, workers: int, max_batch: int,
                 window_ms: float, fixed_batch: bool = False):
    """serve.main in a daemon thread (the tests' wiring,
    tests/test_serve.py): stub parse_args, capture the HTTPServer."""
    import serve
    from http.server import HTTPServer

    class Args(argparse.Namespace):
        pass

    a = Args()
    a.ckpt = ckpt
    a.upstream_ckpt = ""
    a.dckpt = ""
    a.artifact = ""
    a.host = "127.0.0.1"
    a.port = 0
    a.sample_rate = SR
    a.target_level = None
    a.cpu = cpu
    a.workers = workers
    a.mesh = 0
    a.max_batch = max_batch
    a.batch_window_ms = window_ms
    a.fixed_batch = fixed_batch

    holder: dict = {}
    real_parse = argparse.ArgumentParser.parse_args
    real_serve = HTTPServer.serve_forever

    def fake_parse(self, *aa, **kk):
        return a

    def capture_serve(self):
        holder["server"] = self
        real_serve(self)

    argparse.ArgumentParser.parse_args = fake_parse
    HTTPServer.serve_forever = capture_serve
    try:
        th = threading.Thread(target=serve.main, daemon=True)
        th.start()
        for _ in range(1800):  # first compile through the tunnel is slow
            if "server" in holder:
                break
            time.sleep(1.0)
    finally:
        argparse.ArgumentParser.parse_args = real_parse
        HTTPServer.serve_forever = real_serve
    assert "server" in holder, "server did not come up"
    return holder["server"].server_address[1]


def post(port: int, body: bytes, timeout: float = 600.0) -> bytes:
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    try:
        conn.request("POST", "/enhance", body,
                     {"Content-Type": "application/octet-stream"})
        r = conn.getresponse()
        data = r.read()
        assert r.status == 200, (r.status, data[:200])
        return data
    finally:
        conn.close()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/serveload")
    ap.add_argument("--make_ckpt", action="store_true")
    ap.add_argument("--levels", default="1,4,16")
    ap.add_argument("--requests", type=int, default=8,
                    help="requests per client per level")
    ap.add_argument("--durations", default="1,4,10",
                    help="request durations (s), cycled per client")
    ap.add_argument("--workers", type=int, default=32)
    ap.add_argument("--max_batch", type=int, default=16)
    ap.add_argument("--window_ms", type=float, default=3.0)
    ap.add_argument("--fixed_batch", action="store_true",
                    help="serve with --fixed_batch (bit-deterministic) "
                         "and assert BYTE-identical probe responses")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    os.makedirs(args.workdir, exist_ok=True)
    if args.make_ckpt:
        make_ckpt(args.workdir)
        return

    ckpt = os.path.join(args.workdir, "exp", "ckpt")
    assert os.path.isdir(ckpt), f"run --make_ckpt first (no {ckpt})"
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    port = start_server(ckpt, args.cpu, args.workers, args.max_batch,
                        args.window_ms, fixed_batch=args.fixed_batch)
    print(f"[serve_load] server on :{port}", flush=True)

    rng = np.random.default_rng(0)
    durations = [float(d) for d in args.durations.split(",")]
    levels = [int(x) for x in args.levels.split(",")]

    # fixed probes, one per duration: solo responses are the identity
    # reference the same bytes must come back under load
    probes = {}
    for d in durations:
        t = np.arange(int(SR * d)) / SR
        wav = (0.3 * np.sin(2 * np.pi * (200 + 37 * d) * t)
               + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        probes[d] = _wav_bytes(wav)
    # warmup: compile every bucket shape once (B=1), then the solo refs
    for d in durations:
        post(port, probes[d])
    solo = {d: post(port, probes[d]) for d in durations}

    def _pcm(body: bytes) -> np.ndarray:
        with wavelib.open(io.BytesIO(body), "rb") as w:
            return np.frombuffer(
                w.readframes(w.getnframes()), dtype="<i2"
            ).astype(np.int32)

    results = {}
    identity_ok = True
    worst_delta = [0]
    probe_stats = {"total": 0, "exact": 0}
    for level in levels:
        lat: list = []
        lat_lock = threading.Lock()
        audio_s = [0.0]
        ident = [True]

        def client(cid, n_req):
            r = np.random.default_rng(1000 + cid)
            for k in range(n_req):
                d = durations[(cid + k) % len(durations)]
                if cid == 0:
                    # client 0 sends the fixed probes: identity check
                    # under whatever coalescing this level produces
                    body, is_probe = probes[d], True
                else:
                    t = np.arange(int(SR * d)) / SR
                    wav = (0.3 * np.sin(
                        2 * np.pi * r.uniform(150, 400) * t)
                        + 0.02 * r.standard_normal(len(t))
                    ).astype(np.float32)
                    body, is_probe = _wav_bytes(wav), False
                t0 = time.perf_counter()
                out = post(port, body)
                dt = time.perf_counter() - t0
                with lat_lock:
                    lat.append((dt, d))
                    audio_s[0] += d
                if is_probe:
                    exact = out == solo[d]
                    delta = (
                        0 if exact
                        else int(np.abs(_pcm(out) - _pcm(solo[d])).max())
                    )
                    with lat_lock:
                        probe_stats["total"] += 1
                        probe_stats["exact"] += int(exact)
                        worst_delta[0] = max(worst_delta[0], delta)
                    # --fixed_batch: ONE program per bucket -> byte
                    # identity; default pow2 shapes: <=1 PCM step of
                    # cross-program float reassociation
                    if (exact if args.fixed_batch else delta <= 1) is False:
                        ident[0] = False

        threads = [
            threading.Thread(target=client, args=(c, args.requests))
            for c in range(level)
        ]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0
        ms = sorted(x[0] * 1000.0 for x in lat)
        results[str(level)] = {
            "requests": len(ms),
            "p50_ms": round(float(np.percentile(ms, 50)), 2),
            "p99_ms": round(float(np.percentile(ms, 99)), 2),
            "max_ms": round(ms[-1], 2),
            "aggregate_rtf": round(audio_s[0] / wall, 2),
            "identity_ok": ident[0],
        }
        identity_ok = identity_ok and ident[0]
        print(f"[serve_load] level {level}: {results[str(level)]}",
              flush=True)

    print(json.dumps({
        "metric": "serve_load_p99_ms_at_max_level",
        "value": results[str(levels[-1])]["p99_ms"],
        "unit": "ms",
        "vs_baseline": 0.0,
        "levels": results,
        "identity_ok": identity_ok,
        "identity_mode": "byte" if args.fixed_batch else "pcm<=1",
        "probe_exact_frac": round(
            probe_stats["exact"] / max(probe_stats["total"], 1), 4
        ),
        "probe_max_pcm_delta": worst_delta[0],
        "workers": args.workers,
        "max_batch": args.max_batch,
        "window_ms": args.window_ms,
        "fixed_batch": args.fixed_batch,
    }))
    assert identity_ok, "bucket-confinement invariant violated under load"


if __name__ == "__main__":
    main()
