#!/usr/bin/env python
"""Enhancement HTTP server — stdlib-only serving endpoint.

POST a WAV (or FLAC) body to ``/enhance`` and receive the enhanced WAV.
POST raw float32 PCM to ``/stream`` (chunked) and receive enhanced PCM
back incrementally at constant latency — live streaming via the
StatefulStreamer, available when the served head is unidirectional,
raw-feature, and CMVN-free (other configurations answer /stream with
the reason). ``GET /healthz`` reports model/device status. Requests are
padded to static duration buckets so every request after warmup hits a
cached XLA executable. Default is single-threaded (one TPU program at a
time);
``--workers N`` enables concurrent request handling with a micro-batching
queue — concurrent requests are coalesced into ONE device batch (batching
is the dominant throughput lever on TPU, docs/PERF.md), optionally sharded
over a ``--mesh N`` device mesh so serving throughput scales over ICI.

  python serve.py --ckpt result/exp1 --port 8080
  python serve.py --ckpt result/exp1 --workers 16 --mesh 4   # batched+dp
  curl --data-binary @noisy.wav http://localhost:8080/enhance > out.wav
"""
import argparse
import io
import json
import os
import queue
import sys
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


class MicroBatcher:
    """Coalesce concurrent single-utterance requests into one device batch.

    Handler threads call ``submit(wav)`` and block; a single dispatcher
    thread drains the queue (waiting at most ``window_ms`` after the first
    arrival), pads the group to a common bucket length — rounded up to a
    multiple of ``batch_round`` for mesh-sharded serving — runs ONE jitted
    enhance program, and fans results back out. One TPU program in flight
    at a time by construction.
    """

    def __init__(self, run_batch, max_batch=16, window_ms=3.0, batch_round=1,
                 bucket_of=None):
        self._run = run_batch  # list[np.ndarray] -> list[np.ndarray]
        self.max_batch = max_batch
        self.window = window_ms / 1000.0
        self.round = batch_round
        # requests are only coalesced within one duration bucket: CMVN is
        # computed over padded frames, so a short request padded to a long
        # co-rider's bucket would return different audio than it would
        # alone — responses must be independent of concurrent traffic.
        # bucket_of maps a sample COUNT to its bucket; default: every
        # length is its own bucket (no cross-length coalescing)
        self._bucket_of = bucket_of if bucket_of is not None else (lambda n: n)
        self._q: "queue.Queue" = queue.Queue()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def submit(self, wav: np.ndarray) -> np.ndarray:
        ev = threading.Event()
        slot: dict = {}
        self._q.put((wav, ev, slot))
        ev.wait()
        if "err" in slot:
            raise slot["err"]
        return slot["out"]

    def _loop(self):
        while True:
            group = [self._q.get()]
            # monotonic: a wall-clock (NTP) step must not stretch or
            # collapse the coalescing window
            deadline = time.monotonic() + self.window
            while len(group) < self.max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    group.append(self._q.get(timeout=left))
                except queue.Empty:
                    break
            by_bucket: dict = {}
            for g in group:
                try:
                    key = self._bucket_of(len(g[0]))
                except Exception as e:
                    # a bad bucket_of must fail the request, not kill the
                    # dispatcher thread (which would hang every later
                    # submit() forever)
                    g[2]["err"] = e
                    g[1].set()
                    continue
                by_bucket.setdefault(key, []).append(g)
            for sub in by_bucket.values():
                wavs = [g[0] for g in sub]
                try:
                    outs = self._run(wavs)
                    for (_, ev, slot), out in zip(sub, outs):
                        slot["out"] = out
                        ev.set()
                except Exception as e:  # pragma: no cover - surfaced to callers
                    for _, ev, slot in sub:
                        slot["err"] = e
                        ev.set()


def _load_ckpt_settings(path: str):
    """Settings of a checkpoint in either this framework's or the torch
    format -> (config, paras_dict) (run_downstream.py:165-178 parity)."""
    from speech_enhancement_by_s3prl_tpu.runner.checkpoint import (
        load_checkpoint,
    )

    try:
        p = load_checkpoint(path)
        return p["Settings"]["Config"], dict(p["Settings"]["Paras"])
    except Exception:
        import torch

        t = torch.load(path, map_location="cpu", weights_only=False)
        par = t["Settings"]["Paras"]
        return t["Settings"]["Config"], (
            par if isinstance(par, dict) else vars(par)
        )


def build_raw_enhancer(ckpt: str, sample_rate: int, target_level: float,
                       max_bucket_ms: int = 60000, upstream_ckpt: str = "",
                       dckpt: str = ""):
    """Checkpoint -> (params, enhance_raw(params, wavs (B,T), lengths),
    buckets). Shared by the live server and the artifact exporter
    (scripts/export_model.py).

    Raw-feature heads run STFT -> head -> iSTFT in one program.
    Upstream-backed checkpoints (from_rawfeature/from_waveform unset —
    the reference's default path, /root/reference/runner.py:447-453)
    additionally rebuild the frozen upstream encoder recorded in
    Settings.Paras and run upstream -> head inside the same jitted
    program; ``upstream_ckpt`` relocates the S3PRL pretraining checkpoint
    when the recorded path is stale."""
    import jax

    from speech_enhancement_by_s3prl_tpu.utils.config import (
        setup_compile_cache,
    )

    setup_compile_cache()
    import jax.numpy as jnp

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

    payload = load_checkpoint(ckpt)
    paras = payload["Settings"]["Paras"]
    config = payload["Settings"]["Config"]
    down_params = jax.tree.map(jnp.asarray, payload["Downstream"])
    if paras.get("from_waveform"):
        mode = "waveform"
    elif paras.get("from_rawfeature"):
        mode = "rawfeature"
    else:
        mode = "upstream"

    downstream = paras.get("downstream", "LSTM")
    # recorded pretraining checkpoints shape serving construction exactly
    # as they shaped training (run_downstream.py:144-235): paras['ckpt']
    # defines the STFT geometry (+ SpecHead's head config + the upstream
    # encoder), paras['dckpt'] the downstream feature and model config.
    # Allow relocation; fail with a hint when a required file is missing.
    paras = dict(paras)
    if upstream_ckpt:
        paras["ckpt"] = upstream_ckpt
    if dckpt:
        paras["dckpt"] = dckpt
    up_name = paras.get("upstream", "transformer")
    up_ckpt = paras.get("ckpt", "") or ""
    d_path = paras.get("dckpt", "") or ""
    if up_ckpt and not os.path.exists(up_ckpt):
        what = (
            f"{downstream}'s head config" if downstream == "SpecHead"
            else "upstream hidden states" if mode == "upstream"
            else "the preprocessor geometry"
        )
        raise SystemExit(
            f"the checkpoint took {what} from the S3PRL pretraining "
            f"checkpoint recorded as '{up_ckpt}', which is not readable "
            "here — pass --upstream_ckpt with the relocated file"
        )
    if d_path and not os.path.exists(d_path):
        what = (
            "Mockingjay's head config" if downstream == "Mockingjay"
            else "the downstream feature/model config"
        )
        raise SystemExit(
            f"the checkpoint took {what} from the checkpoint recorded as "
            f"'{d_path}', which is not readable here — pass --dckpt with "
            "the relocated file"
        )
    baseline_feat = dict(config["preprocessor"]["baseline"])
    baseline_feat["channel"] = 0

    # pretraining config: STFT geometry + upstream input feature
    # (run_downstream._pretrain_config; the yaml fallback's geometry
    # equals the OnlinePreprocessor defaults, so {} is equivalent)
    upstream = None
    up_payload = None
    online: dict = {}
    if up_ckpt:
        import torch

        up_payload = torch.load(up_ckpt, map_location="cpu",
                                weights_only=False)
        online = dict(up_payload["Settings"]["Config"]["online"])
    upstream_feat = dict(baseline_feat)
    if mode == "upstream" and up_name == "transformer":
        if not up_ckpt:
            raise SystemExit(
                "checkpoint was trained on upstream hidden states but "
                "records no S3PRL pretraining checkpoint — pass "
                "--upstream_ckpt"
            )
        upstream_feat = dict(online.get("input", baseline_feat))
        upstream_feat["channel"] = 0

    # downstream feature + model config from the recorded dckpt
    # (run_downstream.get_preprocessor:165-178 / get_downstream_model)
    downstream_feat = dict(baseline_feat)
    model_cfg = config.get("model", {}).get(downstream, {}) or {}
    if d_path:
        dconfig, dparas = _load_ckpt_settings(d_path)
        downstream_feat = (
            dict(dconfig["online"]["input"]) if "online" in dconfig
            else dict(dconfig["preprocessor"]["baseline"])
        )
        downstream_feat["channel"] = 0
        model_cfg = {}
        if downstream != "Mockingjay":
            if "small_model" in dconfig:
                model_cfg = dconfig["small_model"]["model"]
            else:
                model_cfg = dconfig["model"][
                    dparas.get("downstream", downstream)
                ]

    # 'uphase' phase carriers: see run_downstream.get_preprocessor
    feat_list = [
        upstream_feat, downstream_feat,
        get_feat_config("linear", 0), get_feat_config("uphase", 0),
        get_feat_config("linear", 0), get_feat_config("uphase", 0),
    ]
    pre = OnlinePreprocessor(**online, feat_list=feat_list)
    dims = pre.feat_dims()

    params = down_params
    if mode == "upstream":
        from speech_enhancement_by_s3prl_tpu.models.upstream import (
            build_upstream,
        )

        upstream = build_upstream(
            up_name, dims[0], up_ckpt, payload=up_payload,
            compute_dtype=paras.get("compute_dtype", "f32"),
        )
        in_size = getattr(upstream, "out_dim", dims[0])
        if upstream.params:
            params = {
                "downstream": down_params,
                "upstream": jax.tree.map(jnp.asarray, upstream.params),
            }
    elif mode == "waveform":
        in_size = dims[0]
    else:
        in_size = dims[1]
    model = build_head(downstream, input_size=in_size, output_size=dims[2],
                       **{**paras, **model_cfg})
    buckets = default_buckets(sample_rate, max_bucket_ms)

    def _enhance_raw(params, wavs, lengths):
        feats = pre(wavs[:, None, :])
        up_feat, down_feat, linear_inp, phase_inp, *_ = feats
        if upstream is not None:
            up_params = params.get("upstream") if isinstance(params, dict) \
                and "upstream" in params else None
            features = upstream(up_feat, params=up_params, train=False)
            dparams = params["downstream"] if isinstance(params, dict) \
                and "downstream" in params else params
        else:
            features = up_feat if mode == "waveform" else down_feat
            dparams = params
        predicted, _ = model.apply(dparams, features=features,
                                   linears=linear_inp)
        wav = pre.istft(predicted, phase_inp)
        pad = wavs.shape[-1] - wav.shape[-1]
        wav = jnp.pad(wav, ((0, 0), (0, max(pad, 0))))[:, : wavs.shape[-1]]
        masks = length_masks(lengths, wavs.shape[-1])
        return masked_normalize_decibel(wav, target_level, masks)

    # live-streaming wiring (POST /stream): the StatefulStreamer needs the
    # model/preprocessor objects, not just the jitted batch program
    _enhance_raw.stream_ctx = {
        "params": params, "model": model, "preprocessor": pre, "mode": mode,
    }
    return params, _enhance_raw, buckets


def _pad_group(wavs, buckets, batch_round: int = 1, round_pow2: bool = True):
    """Pad a request group to ONE static device shape: common duration
    bucket, row count rounded up to a power of two (bounds compiled
    shapes under variable-size online micro-batching; offline CLIs with
    one fixed chunk size pass round_pow2=False to skip the padding) and
    to a multiple of batch_round (sharded batches must divide evenly).
    Extra rows repeat row 0 and are discarded by the caller. Returns
    (batch (n, T) f32, lens (n,) i32) — i32 matches the
    exported-artifact signature regardless of JAX_ENABLE_X64."""
    from speech_enhancement_by_s3prl_tpu.data.loader import bucket_length

    T = bucket_length(max(len(w) for w in wavs), buckets)
    n = max(1, 1 << (len(wavs) - 1).bit_length()) if round_pow2 else len(wavs)
    n = -(-n // batch_round) * batch_round
    batch = np.zeros((n, T), np.float32)
    lens = np.empty((n,), np.int32)
    for k, w in enumerate(wavs):
        batch[k, : len(w)] = w
        lens[k] = len(w)
    batch[len(wavs):] = batch[0]
    lens[len(wavs):] = lens[0]
    return batch, lens


def _finish_enhancer(run_batch, buckets, sample_rate: int, batch_round: int = 1):
    """Wrap a padded-group runner into the serving interface: single-
    utterance entry + crossfaded streaming for unbounded-length inputs."""
    from speech_enhancement_by_s3prl_tpu.ops.streaming import (
        enhance_streaming,
    )

    from speech_enhancement_by_s3prl_tpu.data.loader import bucket_length

    def _single(wav: np.ndarray) -> np.ndarray:
        return run_batch([wav])[0]

    def enhance(wav: np.ndarray) -> np.ndarray:
        if len(wav) <= buckets[-1]:
            return _single(wav)
        # unbounded-length requests: fixed windows + cosine crossfade keep
        # shapes static (no recompiles) and memory constant
        return enhance_streaming(
            _single, wav, sample_rate=sample_rate,
            window_sec=buckets[-1] / sample_rate, overlap_sec=1.0,
        )

    enhance.run_batch = run_batch
    enhance.batch_round = batch_round
    enhance.max_len = buckets[-1]
    enhance.bucket_of = lambda n: bucket_length(n, buckets)
    return enhance


def build_enhancer(ckpt: str, sample_rate: int, target_level: float,
                   mesh_n: int = 0, max_bucket_ms: int = 60000,
                   round_pow2: bool = True, upstream_ckpt: str = "",
                   dckpt: str = "", fixed_rows: int = 0):
    """``fixed_rows`` > 0 pads EVERY request group (solo ones included)
    to exactly that row count: one compiled program per bucket regardless
    of traffic, so responses are BIT-deterministic under load. XLA
    compiles a different program per batch shape and reassociates
    reductions, so across the default pow2 shapes {1,2,4,8,16} the same
    request can differ by ~1 float32 ulp (measured 4.5e-8; at most 1
    16-bit PCM step after quantization). The fixed-rows trade: every
    request pays the full fixed_rows compute even uncontended — use it
    where bit-reproducibility matters (response caching, audit replay)."""
    import jax
    import jax.numpy as jnp

    params, _enhance_raw, buckets = build_raw_enhancer(
        ckpt, sample_rate, target_level, max_bucket_ms,
        upstream_ckpt=upstream_ckpt, dckpt=dckpt,
    )

    batch_round = 1
    if mesh_n:
        # data-parallel serving: batches sharded over the device mesh,
        # params replicated; each chip enhances its shard independently
        # (no collectives in the program), so request throughput scales
        # linearly over ICI
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        devices = jax.devices()[:mesh_n]
        assert len(devices) == mesh_n, (
            f"--mesh {mesh_n} but only {len(devices)} devices visible"
        )
        mesh = Mesh(np.array(devices), ("data",))
        rep = NamedSharding(mesh, P())
        params = jax.device_put(params, jax.tree.map(lambda _: rep, params))
        _enhance = jax.jit(
            _enhance_raw,
            in_shardings=(
                jax.tree.map(lambda _: rep, params),
                NamedSharding(mesh, P("data", None)),
                NamedSharding(mesh, P("data")),
            ),
            out_shardings=NamedSharding(mesh, P("data", None)),
        )
        batch_round = mesh_n
    else:
        _enhance = jax.jit(_enhance_raw)
    if fixed_rows:
        # every group rounds up to a multiple of fixed_rows; groups are
        # capped at the micro-batcher's max_batch == fixed_rows, so all
        # traffic lands on exactly one row count (multiple-of keeps the
        # mesh divisibility requirement composable)
        assert fixed_rows % batch_round == 0, (
            f"fixed_rows {fixed_rows} must divide evenly over the "
            f"{batch_round}-way mesh"
        )
        batch_round = fixed_rows

    # AOT executable cache (TPU only): serving processes skip cold-start
    # compilation per bucket by loading serialized executables. Single-
    # request shapes only — batched/mesh shapes go through the jit (their
    # HLO is covered by the persistent compile cache).
    _aot: dict = {}
    use_aot = mesh_n == 0 and jax.default_backend() != "cpu" and os.environ.get(
        "SE_EXEC_CACHE", "1"
    ) == "1"

    def _enhance_fn(T: int):
        if not use_aot:
            return _enhance
        if T not in _aot:
            from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
                compile_cached,
            )

            ex = jnp.zeros((1, T), jnp.float32)
            _aot[T] = compile_cached(
                _enhance_raw, params, ex, jnp.asarray([T]),
                fn_key=f"serve_enhance_{ckpt}",
            ) or _enhance
        return _aot[T]

    def _run_batch(wavs) -> list:
        batch, lens = _pad_group(wavs, buckets, batch_round, round_pow2)
        if batch.shape[0] == 1 and use_aot:
            fn = _enhance_fn(batch.shape[1])
        else:
            fn = _enhance
        out = np.asarray(fn(params, jnp.asarray(batch), jnp.asarray(lens)))
        return [out[k, : len(w)] for k, w in enumerate(wavs)]

    enhance = _finish_enhancer(_run_batch, buckets, sample_rate, batch_round)
    enhance.stream_ctx = _enhance_raw.stream_ctx
    return enhance


def build_artifact_enhancer(artifact_dir: str, sample_rate: int,
                            round_pow2: bool = True):
    """Serve from a `jax.export` deployment artifact
    (scripts/export_model.py): weights + program baked into portable
    StableHLO — no checkpoint and no framework model code on the serving
    host. Same callable interface as build_enhancer (single-device). The
    artifact's batch dimension is symbolic, so the power-of-two group
    rounding in _pad_group needs no per-size re-serialization — but XLA
    still compiles one executable per concrete shape, so the rounding
    matters just as much here to bound compile churn under micro-batching."""
    import jax.numpy as jnp

    from speech_enhancement_by_s3prl_tpu.utils.config import (
        setup_compile_cache,
    )
    from speech_enhancement_by_s3prl_tpu.utils.export_artifact import (
        load_enhance,
    )

    # deserialized programs still compile per concrete shape — let the
    # persistent cache absorb that across serving processes (TPU only)
    setup_compile_cache()
    import json as _json

    with open(os.path.join(artifact_dir, "manifest.json")) as f:
        manifest = _json.load(f)
    art_sr = int(manifest.get("sample_rate", sample_rate))
    if art_sr != sample_rate:
        raise SystemExit(
            f"artifact was exported at {art_sr} Hz but serving requested "
            f"{sample_rate} Hz — the compiled programs' STFT geometry and "
            "bucket durations are rate-specific"
        )
    fns = load_enhance(artifact_dir)
    buckets = sorted(fns)

    def _run_batch(wavs) -> list:
        batch, lens = _pad_group(wavs, buckets, round_pow2=round_pow2)
        out = np.asarray(
            fns[batch.shape[1]](jnp.asarray(batch), jnp.asarray(lens))
        )
        return [out[k, : len(w)] for k, w in enumerate(wavs)]

    return _finish_enhancer(_run_batch, buckets, sample_rate)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="",
                    help="training checkpoint to serve (or use --artifact)")
    ap.add_argument("--upstream_ckpt", default="",
                    help="relocated S3PRL pretraining checkpoint for "
                         "upstream-backed downstream checkpoints (defaults "
                         "to the path recorded in the checkpoint's args)")
    ap.add_argument("--dckpt", default="",
                    help="relocated S3PRL pretraining checkpoint holding a "
                         "Mockingjay head's config (defaults to the path "
                         "recorded in the checkpoint's args)")
    ap.add_argument("--artifact", default="",
                    help="serve a jax.export deployment artifact directory "
                         "(scripts/export_model.py) instead of a checkpoint")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--target_level", type=float, default=None,
                    help="output level in dB (default -25; artifacts bake "
                         "the export-time level in — the flag is rejected "
                         "with --artifact)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--workers", type=int, default=1,
                    help=">1 serves requests concurrently and coalesces "
                         "them into micro-batched device programs")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard each serving batch over N devices "
                         "(data-parallel; pairs with --workers)")
    ap.add_argument("--max_batch", type=int, default=16,
                    help="micro-batch size cap (workers mode)")
    ap.add_argument("--batch_window_ms", type=float, default=3.0,
                    help="how long the batcher waits for co-riders after "
                         "the first request arrives")
    ap.add_argument("--stream_frames", type=int, default=48,
                    help="frames per model step on the /stream endpoint "
                         "(latency = (2*delta) frames + one chunk; 48 "
                         "frames = 0.48 s at the default 10 ms hop)")
    ap.add_argument("--fixed_batch", action="store_true",
                    help="pad every request group to exactly --max_batch "
                         "rows: one compiled program per bucket, so "
                         "responses are bit-deterministic under any load "
                         "(default pow2 grouping can differ by ~1 float32 "
                         "ulp across batch shapes); costs the full "
                         "--max_batch compute per group even uncontended")
    args = ap.parse_args()

    workers = getattr(args, "workers", 1)
    mesh_n = getattr(args, "mesh", 0)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
        if mesh_n:
            try:
                jax.config.update("jax_num_cpu_devices", mesh_n)
            except RuntimeError:
                # backend already initialized (in-process tests): fine as
                # long as enough devices exist — build_enhancer asserts
                pass

    from speech_enhancement_by_s3prl_tpu.data.audio_io import (
        read_audio,
        resample_poly,
        write_wav,
    )

    artifact = getattr(args, "artifact", "")
    if bool(getattr(args, "ckpt", "")) == bool(artifact):
        # not an assert: must hold under python -O too
        ap.error("pass exactly one of --ckpt / --artifact")
    target_level = getattr(args, "target_level", None)
    if artifact:
        if mesh_n:
            ap.error("--artifact serving is single-device (no --mesh)")
        if target_level is not None:
            ap.error("--target_level is baked into the artifact at export "
                     "time (re-export with scripts/export_model.py to "
                     "change it)")
        if getattr(args, "upstream_ckpt", "") or getattr(args, "dckpt", ""):
            ap.error("--upstream_ckpt/--dckpt are resolved at export time "
                     "(pass them to scripts/export_model.py instead)")
        enhance = build_artifact_enhancer(artifact, args.sample_rate)
    else:
        if getattr(args, "fixed_batch", False) and artifact:
            ap.error("--fixed_batch needs --ckpt serving (artifacts bake "
                     "their export-time shapes)")
        enhance = build_enhancer(
            args.ckpt, args.sample_rate,
            -25.0 if target_level is None else target_level, mesh_n=mesh_n,
            upstream_ckpt=getattr(args, "upstream_ckpt", ""),
            dckpt=getattr(args, "dckpt", ""),
            fixed_rows=(
                getattr(args, "max_batch", 16)
                if getattr(args, "fixed_batch", False) else 0
            ),
        )
    # warmup so the first request doesn't pay the compile
    enhance(np.zeros(args.sample_rate, np.float32))

    # live streaming (POST /stream): constant-latency StatefulStreamer for
    # unidirectional raw-feature heads; unavailable configurations keep
    # serving /enhance and report WHY on /stream
    stream_proto = None
    stream_err = "artifact serving bakes full-utterance programs (serve a --ckpt)"
    if not artifact:
        from speech_enhancement_by_s3prl_tpu.ops.streaming import (
            StatefulStreamer,
        )

        ctx = getattr(enhance, "stream_ctx", {})
        try:
            if ctx.get("mode") != "rawfeature":
                raise ValueError(
                    "stateful streaming serves from_rawfeature heads; this "
                    f"checkpoint runs in '{ctx.get('mode')}' mode (upstream/"
                    "waveform features need the whole utterance)"
                )
            stream_proto = StatefulStreamer(
                ctx["params"], ctx["model"], ctx["preprocessor"],
                frames_per_chunk=getattr(args, "stream_frames", 48),
            )
            # compile the per-chunk programs before the first connection
            warm = stream_proto.clone()
            warm.push(np.zeros(args.sample_rate, np.float32))
            warm.flush()
        except Exception as e:
            stream_proto, stream_err = None, str(e)
    batcher = (
        MicroBatcher(
            enhance.run_batch,
            max_batch=getattr(args, "max_batch", 16),
            window_ms=getattr(args, "batch_window_ms", 3.0),
            batch_round=enhance.batch_round,
            bucket_of=getattr(enhance, "bucket_of", None),
        )
        if workers > 1
        else None
    )
    stats = {"requests": 0, "audio_seconds": 0.0, "wall_seconds": 0.0}
    stats_lock = threading.Lock()

    class Handler(BaseHTTPRequestHandler):
        # chunked transfer (the /stream endpoint, both directions) is an
        # HTTP/1.1 feature; every response sends Connection: close so the
        # single-threaded default server never blocks on a kept-alive
        # socket (send_header('Connection', 'close') also flips
        # self.close_connection in the stdlib handler)
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *a):
            pass

        def _reply(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.send_header("Connection", "close")
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                import jax

                body = json.dumps(
                    {"status": "ok", "devices": [str(d) for d in jax.devices()],
                     **stats}
                ).encode()
                self._reply(200, body, "application/json")
            else:
                self._reply(404, b"not found", "text/plain")

        def _body_pieces(self, chunked, length):
            """Yield request-body byte pieces as they arrive: decodes
            Transfer-Encoding: chunked (the stdlib handler does not), or
            blocks of a Content-Length body."""
            if chunked:
                while True:
                    line = self.rfile.readline(66)
                    size = int(line.split(b";")[0].strip() or b"0", 16)
                    if size == 0:
                        while True:  # trailer section, up to the blank line
                            t = self.rfile.readline(1026)
                            if t in (b"\r\n", b"\n", b""):
                                return
                    data = self.rfile.read(size)
                    self.rfile.read(2)  # chunk-terminating CRLF
                    yield data
            else:
                left = length
                while left > 0:
                    piece = self.rfile.read(min(65536, left))
                    if not piece:
                        return
                    left -= len(piece)
                    yield piece

        def _do_stream(self):
            """POST /stream: raw float32-LE mono PCM at --sample_rate in,
            the enhanced PCM out — both chunked, output emitted with the
            streamer's fixed latency as input arrives. Output level is NOT
            renormalized (the offline per-utterance dB renorm needs the
            whole utterance)."""
            if stream_proto is None:
                self._reply(400, f"streaming unavailable: {stream_err}"
                            .encode(), "text/plain")
                return
            te = (self.headers.get("Transfer-Encoding") or "").lower()
            chunked = "chunked" in te
            n = int(self.headers.get("Content-Length") or 0)
            if not chunked and n == 0:
                self._reply(400, b"empty stream body (send chunked or "
                            b"Content-Length float32 PCM)", "text/plain")
                return
            streamer = stream_proto.clone()
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Transfer-Encoding", "chunked")
            self.send_header("Connection", "close")
            self.end_headers()

            t0 = time.time()
            emitted = 0

            def emit(samples):
                nonlocal emitted
                b = np.asarray(samples, "<f4").tobytes()
                if b:
                    self.wfile.write(
                        f"{len(b):x}\r\n".encode() + b + b"\r\n"
                    )
                    emitted += len(b) // 4

            rem = b""
            for piece in self._body_pieces(chunked, n):
                data = rem + piece
                cut = len(data) & ~3  # float32-aligned prefix
                rem = data[cut:]
                if cut:
                    emit(streamer.push(np.frombuffer(data[:cut], "<f4")))
            emit(streamer.flush())
            self.wfile.write(b"0\r\n\r\n")
            with stats_lock:
                stats["requests"] += 1
                stats["audio_seconds"] += emitted / args.sample_rate
                stats["wall_seconds"] += time.time() - t0

        def do_POST(self):
            if self.path == "/stream":
                self._do_stream()
                return
            if self.path != "/enhance":
                self._reply(404, b"not found", "text/plain")
                return
            n = int(self.headers.get("Content-Length", 0))
            if n == 0 or n > 200 * 1024 * 1024:
                self._reply(400, b"bad content length", "text/plain")
                return
            raw = self.rfile.read(n)
            import tempfile

            try:
                with tempfile.NamedTemporaryFile(
                    suffix=".flac" if raw[:4] == b"fLaC" else ".wav"
                ) as f:
                    f.write(raw)
                    f.flush()
                    wav, sr = read_audio(f.name)
                wav = wav.mean(0) if wav.shape[0] > 1 else wav[0]
                if sr != args.sample_rate:
                    wav = resample_poly(wav, sr, args.sample_rate)
            except Exception as e:
                self._reply(400, f"decode error: {e}".encode(), "text/plain")
                return

            t0 = time.time()
            wav = np.asarray(wav, np.float32)
            if batcher is not None and len(wav) <= enhance.max_len:
                out = batcher.submit(wav)
            else:
                out = enhance(wav)
            dt = time.time() - t0
            with stats_lock:
                stats["requests"] += 1
                stats["audio_seconds"] += len(out) / args.sample_rate
                stats["wall_seconds"] += dt

            buf = io.BytesIO()
            import wave as wavelib

            pcm = np.rint(np.clip(out * 32767.0, -32768, 32767)).astype("<i2")
            with wavelib.open(buf, "wb") as w:
                w.setnchannels(1)
                w.setsampwidth(2)
                w.setframerate(args.sample_rate)
                w.writeframes(pcm.tobytes())
            self._reply(200, buf.getvalue(), "audio/wav")

    server_cls = ThreadingHTTPServer if workers > 1 else HTTPServer
    server = server_cls((args.host, args.port), Handler)
    print(f"[serve] listening on http://{args.host}:{args.port} "
          f"(workers={workers}, mesh={mesh_n or 1})", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
