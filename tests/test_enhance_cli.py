"""enhance.py CLI end to end: checkpoint -> batch enhancement -> WAVs,
including the unbounded-length streaming path (inputs longer than the
largest compiled bucket go through ops/streaming.py crossfaded windows)."""
import os
import sys

import numpy as np
import pytest

from speech_enhancement_by_s3prl_tpu.data.audio_io import load_audio, write_wav
from tests.test_e2e import corpus, make_runner  # noqa: F401

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_enhance_cli_short_and_long_inputs(corpus, tmp_path, monkeypatch):
    # a trained checkpoint (tiny head) via the Runner
    runner, config, args = make_runner(corpus, tmp_path / "exp")
    runner.save_model()
    ckpt_dir = str(tmp_path / "exp")

    # inputs: two short files and one longer than the 30 s top bucket
    indir = tmp_path / "noisy"
    indir.mkdir()
    rng = np.random.default_rng(0)
    lengths = {"a": 16000, "b": 24000, "long": 16000 * 31}
    for name, n in lengths.items():
        t = np.arange(n) / 16000.0
        wav = (0.2 * np.sin(2 * np.pi * 440 * t)
               + 0.05 * rng.standard_normal(n)).astype(np.float32)
        write_wav(str(indir / f"{name}.wav"), wav, 16000)

    outdir = tmp_path / "out"
    monkeypatch.setattr(sys, "argv", [
        "enhance.py", "--ckpt", ckpt_dir, "--inputs", str(indir),
        "--outdir", str(outdir), "--cpu",
    ])
    sys.path.insert(0, REPO)
    import enhance

    enhance.main()

    for name, n in lengths.items():
        out, sr = load_audio(str(outdir / f"{name}.wav"), sr=None)
        assert sr == 16000
        assert out.shape[-1] == n, f"{name}: {out.shape[-1]} != {n}"
        assert np.isfinite(out).all()
        assert np.abs(out).max() > 0, "silent output"


def test_enhance_cli_mesh_matches_single_device(corpus, tmp_path):
    """--mesh N shards serving batches over N devices (subprocess so the
    CLI provisions its own virtual CPU devices); outputs must match the
    single-device run — sharding only partitions the same program. Also
    covers the non-divisible batch (3 files over 4 devices => padded)."""
    import subprocess
    import sys as _sys

    runner, config, args = make_runner(corpus, tmp_path / "exp")
    runner.save_model()
    ckpt_dir = str(tmp_path / "exp")

    indir = tmp_path / "noisy"
    indir.mkdir()
    rng = np.random.default_rng(1)
    names = {"a": 9000, "b": 16000, "c": 12000}
    for name, n in names.items():
        t = np.arange(n) / 16000.0
        wav = (0.2 * np.sin(2 * np.pi * 330 * t)
               + 0.05 * rng.standard_normal(n)).astype(np.float32)
        write_wav(str(indir / f"{name}.wav"), wav, 16000)

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    outs = {}
    for tag, extra in (("single", []), ("mesh", ["--mesh", "4"])):
        outdir = tmp_path / f"out_{tag}"
        proc = subprocess.run(
            [_sys.executable, os.path.join(REPO, "enhance.py"),
             "--ckpt", ckpt_dir, "--inputs", str(indir),
             "--outdir", str(outdir), "--cpu"] + extra,
            capture_output=True, text=True, timeout=1200, env=env, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]
        outs[tag] = {
            name: load_audio(str(outdir / f"{name}.wav"), sr=None)[0]
            for name in names
        }
    for name in names:
        np.testing.assert_allclose(
            outs["mesh"][name], outs["single"][name], atol=1e-5,
            err_msg=name,
        )
