"""Driver-artifact guards: bench.py emits the required JSON line and
__graft_entry__.entry() stays jittable (tiny shapes, CPU)."""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_driver_json():
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_MODE="enhance",
        BENCH_BATCH="2",
        BENCH_ITERS="1",
        BENCH_UTT_SEC="1",
        SE_LSTM_XW_BF16="0",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3000, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["metric"] == "enhance_rtf_per_chip"
    assert payload["value"] > 0
    # roofline columns ride along on every mode (utils/costs.py); the
    # accounting must either produce real numbers or say why not
    assert "mfu" in payload or "roofline_error" in payload
    if "mfu" in payload:
        assert payload["flops_per_step"] > 0
        assert payload["hbm_gbytes_per_step_model"] > 0


def test_bench_all_mode_scoreboard():
    """Default BENCH_MODE=all: one JSON line with the enhance headline
    plus a modes object (the one-run driver scoreboard). Restricted to
    the enhance mode here — each mode is a fresh subprocess compile."""
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        BENCH_MODES="enhance",
        BENCH_BATCH="2",
        BENCH_ITERS="1",
        BENCH_UTT_SEC="1",
        SE_LSTM_XW_BF16="0",
        # generous bounds: CPU compiles crawl when the suite shares the
        # single core with concurrent benches (load-flake otherwise)
        BENCH_MODE_TIMEOUT="2700",
    )
    env.pop("BENCH_MODE", None)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3000, check=True,
    )
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline", "modes"} <= set(payload)
    assert payload["metric"] == "enhance_rtf_per_chip"
    assert payload["value"] > 0
    assert payload["modes"]["enhance"]["value"] == payload["value"]


def test_bench_all_headline_falls_back_and_survives_bad_json(monkeypatch, capsys):
    """run_all robustness (regression): (1) when the enhance mode FAILS,
    the headline must fall back to the first succeeded mode — the error
    dict is truthy, so `modes.get('enhance') or ...` used to short-circuit
    and report value 0.0; (2) a mode whose last stdout line is not JSON
    must cost only that mode, not abort the whole scoreboard."""
    sys.path.insert(0, REPO)
    import types

    import bench

    fake = {
        "enhance": types.SimpleNamespace(returncode=1, stdout="", stderr="compile boom"),
        "train": types.SimpleNamespace(
            returncode=0, stderr="",
            stdout='{"metric": "train_rtf_per_chip", "value": 7100.0, '
                   '"unit": "x_realtime", "vs_baseline": 710.0}',
        ),
        "eval": types.SimpleNamespace(
            returncode=0, stdout="Exception ignored in atexit", stderr=""
        ),
    }

    def fake_run(cmd, env=None, **kw):
        return fake[env["BENCH_MODE"]]

    monkeypatch.setenv("BENCH_MODES", "enhance,train,eval")
    monkeypatch.setattr(bench.subprocess, "run", fake_run)
    bench.run_all()
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["value"] == 7100.0, payload
    assert payload["metric"] == "train_rtf_per_chip"
    assert "error" in payload["modes"]["enhance"]
    assert "non-JSON" in payload["modes"]["eval"]["error"]


def test_graft_entry_jittable():
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0], args[1].shape[-1])


def test_bench_loader_mode():
    """Host-only input-pipeline bench: no device, tiny corpus, both
    formats produce the JSON contract."""
    for fmt in ("wav", "flac"):
        env = dict(
            os.environ,
            JAX_PLATFORMS="cpu",
            BENCH_MODE="loader",
            BENCH_ITERS="1",
            BENCH_LOADER_FILES="6",
            BENCH_LOADER_FORMAT=fmt,
            BENCH_BATCH="4",
        )
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=600, check=True,
        )
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        assert payload["metric"] == "loader_audio_rtf_per_host"
        assert payload["value"] > 0
        assert payload["format"] == fmt


def test_device_i16_quantizer_matches_host_wav_writer(tmp_path):
    """The pipeline bench's on-device int16 PCM quantization
    (BENCH_PIPE_D2H=i16) must produce byte-identical WAV files to the
    host writer's float path — jnp.rint and np.rint both round
    half-to-even, so shipping i16 over d2h loses nothing."""
    import jax.numpy as jnp
    import numpy as np

    from speech_enhancement_by_s3prl_tpu.data.audio_io import (
        write_wav,
        write_wav_pcm16,
    )

    rng = np.random.default_rng(3)
    wav = np.clip(rng.normal(scale=0.4, size=16000), -1.2, 1.2).astype(
        np.float32
    )
    # exercise half-integer rounding explicitly
    wav[:8] = np.array([0.5, -0.5, 1.5, -1.5, 2.5, 0.0, 1.0, -1.0],
                       np.float32) / 32767.0

    dev_pcm = np.asarray(
        jnp.clip(
            jnp.rint(jnp.asarray(wav) * 32767.0), -32768.0, 32767.0
        ).astype(jnp.int16)
    )
    a, b = str(tmp_path / "f32.wav"), str(tmp_path / "i16.wav")
    write_wav(a, wav, 16000)
    write_wav_pcm16(b, dev_pcm, 16000)
    assert open(a, "rb").read() == open(b, "rb").read()
