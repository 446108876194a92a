"""PESQ host API.

Thin per-utterance wrapper over the batched JAX P.862 model
(metrics/pesq_jax.py) with the reference's calling convention
(/root/reference/evaluation.py:12-26): ``pesq_mos_lqo(ref, deg, sr, mode)``
-> MOS-LQO float, plus the near-silence warning the reference emits.
"""
from __future__ import annotations

import warnings

import numpy as np


def pesq_mos_lqo(ref: np.ndarray, deg: np.ndarray, sr: int = 16000,
                 mode: str = "nb") -> float:
    import jax.numpy as jnp

    from .pesq_jax import pesq_batch

    ref = np.asarray(ref, dtype=np.float32).reshape(-1)
    deg = np.asarray(deg, dtype=np.float32).reshape(-1)
    if np.allclose(deg.sum(), 0.0, atol=1e-10) or np.allclose(
        ref.sum(), 0.0, atol=1e-10
    ):
        warnings.warn(
            f"[pesq] wav values too small: deg {deg.sum()}, ref {ref.sum()}"
        )
    return float(
        pesq_batch(jnp.asarray(ref)[None], jnp.asarray(deg)[None], sr, mode)[0]
    )
