"""Portable serving artifacts via ``jax.export`` (StableHLO).

The AOT executable cache (ops/pallas/exec_cache.py) eliminates cold-start
compiles for the SAME machine/jax build; this module is the *portable*
deployment story: the jitted enhance function — with the checkpoint's
weights baked in as constants — is serialized to versioned StableHLO that
any later jax build can deserialize, recompile for its local topology,
and call without the framework's model code or the original checkpoint.

The batch dimension is exported SYMBOLICALLY (one artifact serves any
batch size); the time axis stays static per artifact, matching the
serving path's static duration buckets (serve.py pads into buckets, so
one artifact per bucket length).

Layout: a directory of ``enhance_T<samples>.jaxexp`` files plus a
``manifest.json`` ({sample_rate, buckets, created_by}).
"""
from __future__ import annotations

import json
import os
from typing import Callable, Dict, Sequence

import numpy as np


def export_enhance(
    enhance_fn: Callable,
    params,
    bucket_samples: Sequence[int],
    out_dir: str,
    sample_rate: int = 16000,
    platforms: Sequence[str] = ("cpu", "tpu"),
) -> Dict[int, str]:
    """Serialize ``enhance_fn(params, wavs (B, T), lengths (B,))`` for
    each bucket length with symbolic batch. Returns {T: path}.

    ``platforms`` makes the StableHLO multi-platform: without it the
    artifact would be locked to the EXPORTING machine's backend (jax
    refuses to run a cpu-exported program on tpu) — defaulting to both is
    what makes "export on a CPU box, deploy to a TPU host" work."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    assert bucket_samples, "no duration buckets to export"
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for T in bucket_samples:
        # weights baked in: the artifact is self-contained
        def fn(wavs, lengths, _T=T):
            return enhance_fn(params, wavs, lengths)

        (b,) = jexport.symbolic_shape("b")
        args = (
            jax.ShapeDtypeStruct((b, T), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        )
        exp = jexport.export(jax.jit(fn), platforms=list(platforms))(*args)
        path = os.path.join(out_dir, f"enhance_T{T}.jaxexp")
        with open(path, "wb") as f:
            f.write(exp.serialize())
        paths[T] = path
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(
            {
                "sample_rate": sample_rate,
                "buckets": sorted(int(t) for t in bucket_samples),
                "platforms": list(platforms),
                "format": "jax.export StableHLO, symbolic batch",
            },
            f,
            indent=1,
        )
    return paths


def load_enhance(artifact_dir: str) -> Dict[int, Callable]:
    """Deserialize every bucket artifact; returns {T: fn(wavs, lengths)}.

    The returned callables recompile on first use for the local backend —
    no framework model code or checkpoint required."""
    from jax import export as jexport

    with open(os.path.join(artifact_dir, "manifest.json")) as f:
        manifest = json.load(f)
    fns = {}
    for T in manifest["buckets"]:
        path = os.path.join(artifact_dir, f"enhance_T{T}.jaxexp")
        with open(path, "rb") as f:
            exp = jexport.deserialize(f.read())
        fns[int(T)] = exp.call
    return fns
