"""jax.export deployment artifacts: checkpoint -> portable StableHLO
(weights baked in, symbolic batch) -> artifact-only serving path matches
the live checkpoint path."""
import os
import sys

import numpy as np
import pytest

from tests.test_e2e import corpus, make_runner  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def exported(corpus, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("export")
    runner, config, args = make_runner(corpus, tmp)
    runner.save_model()

    sys.path.insert(0, REPO)
    from serve import build_enhancer, build_raw_enhancer

    from speech_enhancement_by_s3prl_tpu.utils.export_artifact import (
        export_enhance,
    )

    params, enhance_raw, buckets = build_raw_enhancer(str(tmp), 16000, -25.0)
    art_dir = str(tmp / "artifact")
    export_enhance(enhance_raw, params, buckets[:2], art_dir)
    live = build_enhancer(str(tmp), 16000, -25.0)
    return art_dir, live, buckets


def test_manifest_and_files(exported):
    import json

    art_dir, _, buckets = exported
    with open(os.path.join(art_dir, "manifest.json")) as f:
        manifest = json.load(f)
    assert manifest["buckets"] == sorted(buckets[:2])
    for t in manifest["buckets"]:
        assert os.path.getsize(os.path.join(art_dir, f"enhance_T{t}.jaxexp")) > 0


def test_artifact_enhancer_matches_live(exported):
    from serve import build_artifact_enhancer

    art_dir, live, _ = exported
    enhance = build_artifact_enhancer(art_dir, 16000)

    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(12000)).astype(np.float32)
    out_art = enhance(wav)
    out_live = live(wav)
    assert out_art.shape == wav.shape
    np.testing.assert_allclose(out_art, out_live, atol=1e-5)


def test_artifact_symbolic_batch(exported):
    """One artifact serves any micro-batch size (symbolic batch dim)."""
    from serve import build_artifact_enhancer

    art_dir, live, _ = exported
    enhance = build_artifact_enhancer(art_dir, 16000)
    rng = np.random.default_rng(1)
    wavs = [
        (0.1 * rng.standard_normal(n)).astype(np.float32)
        for n in (8000, 11000, 9000)
    ]
    outs = enhance.run_batch(wavs)
    for w, o in zip(wavs, outs):
        assert o.shape == w.shape
        np.testing.assert_allclose(o, live(w), atol=1e-5)


def test_artifact_http_serving(exported, tmp_path):
    """serve.py --artifact end to end over HTTP: export dir -> server
    thread -> POST wav -> enhanced wav (no checkpoint on the serving
    path)."""
    import argparse
    import io
    import threading
    import time
    import urllib.request
    import wave as wavelib
    from http.server import HTTPServer

    import serve

    art_dir, live, _ = exported

    class Args(argparse.Namespace):
        ckpt = ""
        artifact = art_dir
        host = "127.0.0.1"
        port = 0
        sample_rate = 16000
        # artifacts bake the level in; the CLI now rejects an explicit flag
        target_level = None
        cpu = True
        workers = 1
        mesh = 0
        max_batch = 16
        batch_window_ms = 3.0

    holder = {}
    real_parse = argparse.ArgumentParser.parse_args
    real_serve = HTTPServer.serve_forever

    def capture_serve(self):
        holder["server"] = self
        real_serve(self)

    argparse.ArgumentParser.parse_args = lambda self, *a, **k: Args()
    HTTPServer.serve_forever = capture_serve
    try:
        t = threading.Thread(target=serve.main, daemon=True)
        t.start()
        for _ in range(600):
            if "server" in holder:
                break
            time.sleep(0.5)
        assert "server" in holder, "artifact server did not start"
        host, port = holder["server"].server_address

        rng = np.random.default_rng(2)
        n = 10000
        wav = (0.1 * rng.standard_normal(n)).astype(np.float32)
        pcm = np.rint(np.clip(wav * 32767.0, -32768, 32767)).astype("<i2")
        buf = io.BytesIO()
        with wavelib.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        req = urllib.request.Request(
            f"http://{host}:{port}/enhance", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = r.read()
        with wavelib.open(io.BytesIO(out)) as w:
            frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        assert len(frames) == n and np.abs(frames).max() > 0
    finally:
        argparse.ArgumentParser.parse_args = real_parse
        HTTPServer.serve_forever = real_serve
        if "server" in holder:
            holder["server"].shutdown()


def test_enhance_cli_with_artifact(exported, tmp_path, monkeypatch):
    """enhance.py --artifact: batch file CLI over a deployment artifact."""
    import subprocess
    import sys as _sys

    from speech_enhancement_by_s3prl_tpu.data.audio_io import (
        read_audio,
        write_wav,
    )

    art_dir, live, _ = exported
    indir = tmp_path / "noisy"
    indir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        write_wav(str(indir / f"n{i}.wav"),
                  (0.1 * rng.standard_normal(9000)).astype(np.float32), 16000)
    outdir = tmp_path / "out"
    r = subprocess.run(
        [_sys.executable, os.path.join(REPO, "enhance.py"),
         "--artifact", art_dir, "--inputs", str(indir),
         "--outdir", str(outdir), "--cpu"],
        capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    for i in range(3):
        wav, sr = read_audio(str(outdir / f"n{i}.wav"))
        assert sr == 16000 and wav.shape[-1] == 9000
        assert np.isfinite(wav).all() and np.abs(wav).max() > 0
