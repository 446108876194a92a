"""PESQ (ITU-T P.862) — host-side metric.

The reference scores PESQ through the `pesq` C extension
(/root/reference/evaluation.py:12-26), which is not in this image. A native
implementation of the full P.862 pipeline (level alignment, time alignment,
bark-domain loudness, asymmetric disturbance aggregation, MOS-LQO mapping)
is planned under native/; until it lands, PESQ scores are reported as NaN
with a one-time warning instead of crashing evaluation.
"""
from __future__ import annotations

import warnings

import numpy as np

_warned = False


def pesq_mos_lqo(ref: np.ndarray, deg: np.ndarray, sr: int = 16000,
                 mode: str = "nb") -> float:
    global _warned
    if np.allclose(deg.sum(), 0.0, atol=1e-10) or np.allclose(
        ref.sum(), 0.0, atol=1e-10
    ):
        warnings.warn(f"[pesq] wav values too small: deg {deg.sum()}, ref {ref.sum()}")
    if not _warned:
        warnings.warn(
            "PESQ native implementation pending; reporting NaN. "
            "Use stoi/estoi/sisdr for on-device quality metrics."
        )
        _warned = True
    return float("nan")
