#!/usr/bin/env python3
"""Re-warm the persistent JAX compile caches after a home-dir wipe.

The image wipes ``~`` between sessions (observed repeatedly, see
CLAUDE.md gotchas), which empties both persistent caches:

- ``~/.jax_cache``       — XLA HLO compile cache (TPU-only entries)
- ``~/.jax_exec_cache``  — AOT executable cache covering Pallas/mosaic
  custom-call programs that the HLO cache does NOT cover

A fully cold driver round-end ``bench.py`` run risks per-mode timeouts
(first cold mode measured 5.5-19 min through the tunnel), so the FIRST
action of every session should be to run this script: it checks both
cache dirs and, when empty (or ``--force``), runs the full bench
scoreboard with a generous budget to repopulate them, then reports any
modes the budget still skipped so they can be re-warmed with
``BENCH_MODES=<skipped>``.

Usage:
    python scripts/warm_caches.py            # warm only if cold
    python scripts/warm_caches.py --force    # warm regardless
    python scripts/warm_caches.py --check    # report state, do nothing

Keep the package sources FROZEN between warming and the driver's
round-end run: the exec cache salts its keys with a hash of every
package ``.py`` file, so any package edit invalidates the executables
this script just warmed.
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HLO_CACHE = os.path.expanduser("~/.jax_cache")
EXEC_CACHE = os.path.expanduser("~/.jax_exec_cache")


def _count(path: str) -> int:
    try:
        return len(os.listdir(path))
    except OSError:
        return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--force", action="store_true",
                    help="run the warming bench even if caches are non-empty")
    ap.add_argument("--check", action="store_true",
                    help="only report cache state")
    ap.add_argument("--budget", type=int, default=7200,
                    help="BENCH_TOTAL_BUDGET seconds for the warming run")
    ap.add_argument("--mode_timeout", type=int, default=3000,
                    help="BENCH_MODE_TIMEOUT seconds per mode")
    args = ap.parse_args()

    hlo, execs = _count(HLO_CACHE), _count(EXEC_CACHE)
    cold = hlo == 0 or execs == 0
    print(f"[warm] ~/.jax_cache: {hlo} entries; "
          f"~/.jax_exec_cache: {execs} entries; cold={cold}")
    if args.check:
        return 0
    if not cold and not args.force:
        print("[warm] caches already warm — nothing to do (use --force)")
        return 0

    env = dict(os.environ)
    env["BENCH_TOTAL_BUDGET"] = str(args.budget)
    env["BENCH_MODE_TIMEOUT"] = str(args.mode_timeout)
    print(f"[warm] running full bench scoreboard "
          f"(budget {args.budget}s, per-mode {args.mode_timeout}s)...")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, cwd=REPO, capture_output=True, text=True)
    sys.stderr.write(proc.stderr)
    print(proc.stdout)
    skipped = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            payload = json.loads(line)
        except json.JSONDecodeError:
            continue
        for mode in payload.get("skipped", []) or []:
            skipped.append(mode)
    hlo, execs = _count(HLO_CACHE), _count(EXEC_CACHE)
    print(f"[warm] done: ~/.jax_cache {hlo} entries, "
          f"~/.jax_exec_cache {execs} entries")
    if skipped:
        print(f"[warm] budget skipped modes: {','.join(skipped)} — re-warm "
              f"with: BENCH_MODES={','.join(skipped)} "
              f"BENCH_MODE_TIMEOUT={args.mode_timeout} "
              f"BENCH_TOTAL_BUDGET={args.budget} python bench.py")
        return 1
    return proc.returncode


if __name__ == "__main__":
    sys.exit(main())
