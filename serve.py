#!/usr/bin/env python
"""Enhancement HTTP server — stdlib-only serving endpoint.

POST a WAV (or FLAC) body to ``/enhance`` and receive the enhanced WAV.
``GET /healthz`` reports model/device status. Requests are padded to
static duration buckets so every request after warmup hits a cached XLA
executable; single-threaded by design (one TPU program at a time).

  python serve.py --ckpt result/exp1 --port 8080
  curl --data-binary @noisy.wav http://localhost:8080/enhance > out.wav
"""
import argparse
import io
import json
import os
import sys
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_enhancer(ckpt: str, sample_rate: int, target_level: float):
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
    params = jax.tree.map(jnp.asarray, payload["Downstream"])
    if not (paras.get("from_rawfeature") or paras.get("from_waveform")):
        raise SystemExit(
            "checkpoint expects upstream hidden states; the serving endpoint "
            "supports raw-feature heads — evaluate via run_downstream.py --test"
        )

    downstream = paras.get("downstream", "LSTM")
    model_cfg = config.get("model", {}).get(downstream, {}) or {}
    baseline_feat = dict(config["preprocessor"]["baseline"])
    baseline_feat["channel"] = 0
    feat_list = [
        baseline_feat, baseline_feat,
        get_feat_config("linear", 0), get_feat_config("phase", 0),
        get_feat_config("linear", 0), get_feat_config("phase", 0),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    dims = pre.feat_dims()
    model = build_head(downstream, input_size=dims[1], output_size=dims[2],
                       **{**paras, **model_cfg})
    buckets = default_buckets(sample_rate, 60000)

    def _enhance_raw(params, wavs, lengths):
        feats = pre(wavs[:, None, :])
        _, down_feat, linear_inp, phase_inp, *_ = feats
        predicted, _ = model.apply(params, features=down_feat, linears=linear_inp)
        wav = pre.istft(predicted, phase_inp)
        pad = wavs.shape[-1] - wav.shape[-1]
        wav = jnp.pad(wav, ((0, 0), (0, max(pad, 0))))[:, : wavs.shape[-1]]
        masks = length_masks(lengths, wavs.shape[-1])
        return masked_normalize_decibel(wav, target_level, masks)

    _enhance = jax.jit(_enhance_raw)

    # AOT executable cache (TPU only): serving processes skip cold-start
    # compilation per bucket by loading serialized executables
    _aot: dict = {}
    use_aot = jax.default_backend() != "cpu" and os.environ.get(
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

    def _single(wav: np.ndarray) -> np.ndarray:
        T = bucket_length(len(wav), buckets)
        batch = np.zeros((1, T), np.float32)
        batch[0, : len(wav)] = wav
        out = np.asarray(
            _enhance_fn(T)(params, jnp.asarray(batch), jnp.asarray([len(wav)]))
        )
        return out[0, : len(wav)]

    def enhance(wav: np.ndarray) -> np.ndarray:
        if len(wav) <= buckets[-1]:
            return _single(wav)
        # unbounded-length requests: fixed windows + cosine crossfade keep
        # shapes static (no recompiles) and memory constant
        from speech_enhancement_by_s3prl_tpu.ops.streaming import (
            enhance_streaming,
        )

        return enhance_streaming(
            _single, wav, sample_rate=sample_rate,
            window_sec=buckets[-1] / sample_rate, overlap_sec=1.0,
        )

    return enhance


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--sample_rate", type=int, default=16000)
    ap.add_argument("--target_level", type=float, default=-25.0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from speech_enhancement_by_s3prl_tpu.data.audio_io import (
        read_audio,
        resample_poly,
        write_wav,
    )

    enhance = build_enhancer(args.ckpt, args.sample_rate, args.target_level)
    # warmup so the first request doesn't pay the compile
    enhance(np.zeros(args.sample_rate, np.float32))
    stats = {"requests": 0, "audio_seconds": 0.0, "wall_seconds": 0.0}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):
            pass

        def _reply(self, code, body, ctype="application/octet-stream"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
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

        def do_POST(self):
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
            out = enhance(np.asarray(wav, np.float32))
            dt = time.time() - t0
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

    server = HTTPServer((args.host, args.port), Handler)
    print(f"[serve] listening on http://{args.host}:{args.port}", flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
