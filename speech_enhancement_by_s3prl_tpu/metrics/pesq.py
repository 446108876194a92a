"""PESQ host API.

Per-utterance wrapper with the reference's calling convention
(/root/reference/evaluation.py:12-26): ``pesq_mos_lqo(ref, deg, sr, mode)``
-> MOS-LQO float, plus the near-silence warning the reference emits.

Scoring backend: the ITU-conformant ``pesq`` wheel when importable (what
the reference scores with), else the batched JAX P.862 model
(metrics/pesq_jax.py) with a one-time notice — it runs the published
P.862 tables (metrics/p862_tables.py) and the full time-alignment chain
(envelope coarse pass + sample-exact raw-signal fine correlation,
pesq_jax.py), but is not certified against ITU conformance points; the
remaining deliberate approximations are listed in docs/PARITY_NOTES.md.
"""
from __future__ import annotations

import functools
import warnings

import numpy as np


@functools.lru_cache(maxsize=1)
def itu_pesq_fn():
    """The ITU-conformant scorer, or None when the wheel is absent."""
    try:
        from pesq import pesq as _pesq  # type: ignore

        return _pesq
    except ImportError:
        return None


@functools.lru_cache(maxsize=1)
def _warn_approximate() -> bool:
    warnings.warn(
        "[pesq] scoring with the JAX P.862 model (published tables, "
        "coarse+fine time alignment, no ITU conformance certification); "
        "install the `pesq` package for ITU-conformant MOS-LQO"
    )
    return True


def pesq_mos_lqo(ref: np.ndarray, deg: np.ndarray, sr: int = 16000,
                 mode: str = "nb") -> float:
    ref = np.asarray(ref, dtype=np.float32).reshape(-1)
    deg = np.asarray(deg, dtype=np.float32).reshape(-1)
    if np.allclose(deg.sum(), 0.0, atol=1e-10) or np.allclose(
        ref.sum(), 0.0, atol=1e-10
    ):
        warnings.warn(
            f"[pesq] wav values too small: deg {deg.sum()}, ref {ref.sum()}"
        )

    itu = itu_pesq_fn()
    if itu is not None:
        # exact reference call shape: pesq(sr, reference, degraded, mode)
        # (/root/reference/evaluation.py:17,25)
        return float(itu(sr, ref, deg, mode))

    _warn_approximate()
    import jax.numpy as jnp

    from .pesq_jax import pesq_batch

    # External pairs may carry mid-utterance delay changes, so the host
    # API runs the P.862 bad-interval realignment; the batched eval
    # kernel leaves it off by default (this framework's own enhancement
    # outputs are sample-aligned by construction — SE_PESQ_REALIGN=1
    # forces it there).
    return float(
        pesq_batch(
            jnp.asarray(ref)[None], jnp.asarray(deg)[None], sr, mode,
            realign=True,
        )[0]
    )
