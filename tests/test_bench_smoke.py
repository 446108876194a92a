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
    assert set(payload) == {"metric", "value", "unit", "vs_baseline"}
    assert payload["metric"] == "enhance_rtf_per_chip"
    assert payload["value"] > 0


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


def test_graft_entry_jittable():
    import jax

    sys.path.insert(0, REPO)
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[1].shape[0], args[1].shape[-1])
