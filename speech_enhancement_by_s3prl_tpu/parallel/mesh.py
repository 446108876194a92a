"""Device-mesh parallelism.

The reference is single-GPU with no distributed backend (SURVEY.md
parallelism inventory: no DP/TP/PP/SP/EP anywhere). This module adds the
TPU-native scale-out story as an *additive* capability:

- a ('data', 'model') mesh over any device count;
- data parallelism: the batch dimension sharded over 'data' so each step's
  gradient all-reduce rides ICI (inserted automatically by GSPMD from the
  sharding annotations — no hand-written collectives);
- tensor parallelism for the wide parameters: LSTM gate blocks (4H) and
  dense/FFN output dims sharded over 'model';
- replicated everything else.

Single-device numerics are reproduced by construction: sharding only
partitions the same computation.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'model') mesh; model_parallel divides the device count."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_spec(ndim: int) -> P:
    """Shard axis 0 (batch) over 'data', replicate the rest."""
    return P("data", *([None] * (ndim - 1)))


def _param_spec(path: Tuple, leaf) -> P:
    """Tensor-parallel layout for wide parameters.

    - LSTM input/hidden kernels (4H, D) and their biases: shard the gate
      dim over 'model' (each shard holds a contiguous slice of all gates).
    - Dense kernels (D_in, D_out): shard D_out over 'model'; final output
      projections stay replicated (they're small: 201 wide).
    """
    names = [str(getattr(k, "key", k)) for k in path]
    flat = "/".join(names)
    shape = getattr(leaf, "shape", ())
    if "w_ih" in flat or "w_hh" in flat:
        return P("model", None)
    if "b_ih" in flat or "b_hh" in flat:
        return P("model")
    if flat.endswith("kernel") and len(shape) == 2:
        # shard wide intermediate projections only (divisibility guard at
        # mesh-application time)
        if "intermediate" in flat or "qkv" in flat:
            return P(None, "model")
    return P(*([None] * len(shape)))


def param_shardings(mesh: Mesh, params) -> Any:
    """NamedSharding pytree for the parameter tree (divisibility-checked:
    falls back to replication when a dim doesn't divide)."""
    m = mesh.shape["model"]

    def one(path, leaf):
        spec = _param_spec(path, leaf)
        # verify divisibility; replicate otherwise
        for dim, axis in zip(leaf.shape, spec):
            if axis == "model" and dim % m != 0:
                spec = P(*([None] * len(leaf.shape)))
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def replicated(mesh: Mesh, tree) -> Any:
    return jax.tree.map(
        lambda l: NamedSharding(mesh, P(*([None] * np.ndim(l)))), tree
    )


def shard_train_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: params (and the optimizer moments,
    which mirror the params) tensor-parallel, step replicated."""
    from ..runner.trainer import TrainState

    p_sh = param_shardings(mesh, state.params)

    def opt_sharding(leaf):
        # optimizer state leaves mirroring a param shape get its sharding;
        # scalars replicate. Match by shape against the flat param list.
        for param, sh in zip(flat_params, flat_shardings):
            if getattr(leaf, "shape", None) == param.shape:
                return sh
        return NamedSharding(mesh, P(*([None] * np.ndim(leaf))))

    flat_params = jax.tree.leaves(state.params)
    flat_shardings = jax.tree.leaves(p_sh)
    o_sh = jax.tree.map(opt_sharding, state.opt_state)

    params = jax.device_put(state.params, p_sh)
    opt_state = jax.device_put(state.opt_state, o_sh)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(params, opt_state, step), (p_sh, o_sh)


def make_parallel_train_step(builder, mesh: Mesh, state):
    """jit the builder's train step with mesh shardings: batch over 'data',
    params/moments per tensor-parallel rules. GSPMD inserts the psum for
    gradients and any all-gathers for the model-sharded matmuls."""
    state, (p_sh, o_sh) = shard_train_state(mesh, state)
    step_sh = NamedSharding(mesh, P())
    state_sh = type(state)(p_sh, o_sh, step_sh)

    base = builder.train_step_fn()

    def step(st, wavs, lengths, rng):
        return base(st, wavs, lengths, rng)

    wav_sh = NamedSharding(mesh, P("data", None, None))
    len_sh = NamedSharding(mesh, P("data"))
    rng_sh = NamedSharding(mesh, P())
    out_stats_sh = {
        "loss": step_sh, "grad_norm": step_sh, "skipped": step_sh,
    }
    jitted = jax.jit(
        step,
        in_shardings=(state_sh, wav_sh, len_sh, rng_sh),
        out_shardings=(state_sh, out_stats_sh),
        donate_argnums=(0,),
    )
    return jitted, state
