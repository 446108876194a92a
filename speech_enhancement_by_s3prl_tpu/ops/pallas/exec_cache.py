"""Persistent AOT executable cache for Pallas/Mosaic programs.

The standard persistent compile cache skips Mosaic custom-call programs,
so any process using the Pallas LSTM kernel pays the full TPU compile
(~12 min through the remote-compile tunnel) again (CLAUDE.md, PERF.md).
This module serializes the COMPILED executable itself
(jax.experimental.serialize_executable) keyed by (jax version, backend,
function key, abstract input signature), so later processes deserialize
and run without compiling at all.

Scope: inference-path programs with static shapes (the bench/enhance
flagship). Falls back transparently to plain jit when serialization or
deserialization is unsupported by the runtime (e.g. some remote backends).
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional

import jax


def _cache_dir() -> str:
    return os.path.expanduser(
        os.environ.get("SE_EXEC_CACHE_DIR", "~/.jax_exec_cache")
    )


def _signature(args, kwargs) -> str:
    leaves, treedef = jax.tree_util.tree_flatten((args, kwargs))
    parts = [str(treedef)]
    for leaf in leaves:
        parts.append(f"{jax.numpy.shape(leaf)}:{jax.numpy.result_type(leaf)}")
    return "|".join(parts)


_SRC_HASH: Optional[str] = None


def _source_hash() -> str:
    """Content hash of every package source file. Without it a cached
    executable silently keeps serving the OLD compiled program after a
    source change (observed: a metrics rewrite that the eval bench then
    didn't measure). Costs one ~1 MB hash per process, cached."""
    global _SRC_HASH
    if _SRC_HASH is None:
        h = hashlib.sha256()
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        for root, dirs, files in sorted(os.walk(pkg_root)):
            dirs.sort()
            for name in sorted(files):
                if name.endswith(".py"):
                    p = os.path.join(root, name)
                    h.update(p.encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _SRC_HASH = h.hexdigest()[:16]
    return _SRC_HASH


def _env_key() -> str:
    """Every ``SE_*`` env knob that can shape a traced program (kernel
    selection, stream dtypes, chunk sizes are all read from the
    environment at trace time). Folding them ALL into the key centrally
    means no call site can forget one — a serving process started under
    different knobs must not load an executable compiled under the old
    ones. Cache-plumbing variables that cannot affect the program are
    excluded so toggling them stays warm."""
    skip = {"SE_EXEC_CACHE", "SE_EXEC_CACHE_DIR"}
    return ",".join(
        f"{k}={v}" for k, v in sorted(os.environ.items())
        if k.startswith("SE_") and k not in skip
    )


def _key(fn_key: str, args, kwargs) -> str:
    backend = jax.default_backend()
    try:
        platform_version = jax.devices()[0].device_kind
    except Exception:
        platform_version = "unknown"
    raw = "|".join(
        [jax.__version__, backend, str(platform_version), _source_hash(),
         _env_key(), fn_key, _signature(args, kwargs)]
    )
    return hashlib.sha256(raw.encode()).hexdigest()[:32]


def compile_cached(
    fn: Callable,
    *example_args,
    fn_key: str,
    donate_argnums=(),
    verbose: bool = False,
    **example_kwargs,
) -> Optional[Callable]:
    """Return a compiled executable for ``fn`` at the example signature,
    loading it from the AOT cache when possible and saving it after a cold
    compile. Returns None when AOT serialization is unavailable — caller
    should fall back to plain ``jax.jit(fn)``."""
    try:
        from jax.experimental.serialize_executable import (
            deserialize_and_load,
            serialize,
        )
    except ImportError:
        return None

    path = os.path.join(
        _cache_dir(), _key(fn_key, example_args, example_kwargs) + ".aot"
    )
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload, in_tree, out_tree, device_ids = pickle.load(f)
            # deserialize_and_load defaults execution_devices to EVERY
            # backend device: on a multi-device host a single-device
            # program then loads bound to all of them and raises
            # ("expected N shards") on its first call. Re-bind to the
            # devices the executable was compiled for (a missing id is a
            # stale entry -> recompile below).
            by_id = {d.id: d for d in jax.devices()}
            compiled = deserialize_and_load(
                payload, in_tree, out_tree,
                execution_devices=[by_id[i] for i in device_ids],
            )
            if verbose:
                print(f"[exec_cache] loaded {fn_key} from {path}", flush=True)
            return compiled
        except Exception as e:  # stale/incompatible entry: recompile
            if verbose:
                print(f"[exec_cache] load failed ({e}); recompiling", flush=True)

    jitted = jax.jit(fn, donate_argnums=donate_argnums)
    compiled = jitted.lower(*example_args, **example_kwargs).compile()
    try:
        payload, in_tree, out_tree = serialize(compiled)
        device_ids = [
            d.id for d in compiled._executable.xla_executable.local_devices()
        ]
        os.makedirs(_cache_dir(), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((payload, in_tree, out_tree, device_ids), f)
        os.replace(tmp, path)
        if verbose:
            print(f"[exec_cache] saved {fn_key} to {path}", flush=True)
    except Exception as e:
        if verbose:
            print(f"[exec_cache] serialize failed ({e}); uncached", flush=True)
    return compiled
