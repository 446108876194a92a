"""Checkpointing.

Keeps the reference's logical payload and lifecycle
(/root/reference/runner.py:129-151, run_downstream.py:94-106):

- files named ``states-{step}.ckpt`` under expdir (or ``expdir/<split>/``
  for per-split best models);
- payload: {'Downstream', 'Optimizer', 'Global_step', 'Settings':
  {'Config', 'Paras'}} — here Downstream/Optimizer are numpy pytrees of the
  flax params / optax state;
- rotation keeping the ``max_keep`` newest by step;
- dir-or-file resume discovery picking the highest step.

Format: a single pickle file of host numpy arrays (torch-free). Arrays are
pulled from device with one ``jax.device_get``.
"""
from __future__ import annotations

import glob
import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), jax.device_get(tree))


def save_checkpoint(
    directory: str,
    step: int,
    params: Any,
    opt_state: Any,
    config: Dict[str, Any],
    args: Dict[str, Any],
    max_keep: int = 2,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
    os.makedirs(directory, exist_ok=True)
    rotate(directory, max_keep)
    payload = {
        "Downstream": _to_host(params),
        "Optimizer": _to_host(opt_state),
        "Global_step": int(step),
        "Settings": {"Config": config, "Paras": dict(args)},
    }
    if extra:
        payload.update(_to_host(extra))
    path = os.path.join(directory, f"states-{int(step)}.ckpt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    return path


def _step_of(path: str) -> int:
    m = re.search(r"states-(\d+)\.ckpt$", path)
    return int(m.group(1)) if m else -1


def rotate(directory: str, max_keep: int):
    """Delete oldest checkpoints so at most max_keep - 1 remain before a new
    save (the reference deletes down to max_keep then writes one more;
    we keep its observable invariant of never exceeding max_keep on disk
    after save by pruning to max_keep - 1 first)."""
    ckpts = sorted(glob.glob(os.path.join(directory, "states-*.ckpt")), key=_step_of)
    excess = len(ckpts) - max(max_keep - 1, 0)
    for p in ckpts[: max(excess, 0)]:
        os.remove(p)


def find_resume_ckpt(path: str) -> str:
    """Dir → newest states-*.ckpt; file → itself
    (/root/reference/run_downstream.py:95-101)."""
    if os.path.isdir(path):
        ckpts = glob.glob(os.path.join(path, "states-*.ckpt"))
        assert ckpts, f"no checkpoints under {path}"
        return max(ckpts, key=_step_of)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(find_resume_ckpt(path), "rb") as f:
        return pickle.load(f)
