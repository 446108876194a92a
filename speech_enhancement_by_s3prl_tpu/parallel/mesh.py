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
    - Transformer layers, the Megatron pairing: qkv and FFN-intermediate
      kernels column-parallel (out dim + bias over 'model'); the
      projections that consume them — attention/output and the FFN down
      projection — row-parallel (in dim over 'model'), so each pair needs
      ONE reduce instead of an all-gather between the matmuls (GSPMD
      inserts it from these hints).
    - Final output projections stay replicated (they're small: 201 wide).
    """
    names = [str(getattr(k, "key", k)) for k in path]
    flat = "/".join(names)
    shape = getattr(leaf, "shape", ())
    if "w_ih" in flat or "w_hh" in flat:
        return P("model", None)
    if "b_ih" in flat or "b_hh" in flat:
        return P("model")
    if flat.endswith("kernel") and len(shape) == 2:
        # divisibility guard at mesh-application time
        if "intermediate" in flat or "qkv" in flat:
            return P(None, "model")
        if "layer_" in flat and flat.endswith("output/kernel"):
            return P("model", None)
    if flat.endswith("bias") and ("qkv" in flat or "intermediate" in flat):
        return P("model")
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


def _path_names(path) -> Tuple[str, ...]:
    return tuple(
        str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
        for k in path
    )


def shard_train_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: params (and the optimizer moments,
    which mirror the params) tensor-parallel, step replicated.

    Optimizer-state leaves are matched to params BY PATH: optax state trees
    (e.g. ScaleByAdamState.mu/nu) embed the full param tree, so a param's
    path is a suffix of its moment's path. Shape matching alone (round 1)
    mis-shards on shape collisions."""
    from ..runner.trainer import TrainState

    p_sh = param_shardings(mesh, state.params)
    by_path = {
        _path_names(path): (np.shape(leaf), sh)
        for (path, leaf), (_, sh) in zip(
            jax.tree_util.tree_flatten_with_path(state.params)[0],
            jax.tree_util.tree_flatten_with_path(p_sh)[0],
        )
    }

    def opt_sharding(path, leaf):
        names = _path_names(path)
        shape = np.shape(leaf)
        for i in range(len(names)):
            hit = by_path.get(names[i:])
            if hit is not None:
                p_shape, sh = hit
                if p_shape == shape:
                    return sh
                break  # path matches but shape doesn't: replicate
        return NamedSharding(mesh, P(*([None] * np.ndim(leaf))))

    o_sh = jax.tree_util.tree_map_with_path(opt_sharding, state.opt_state)

    params = jax.device_put(state.params, p_sh)
    opt_state = jax.device_put(state.opt_state, o_sh)
    step = jax.device_put(state.step, NamedSharding(mesh, P()))
    return TrainState(params, opt_state, step), (p_sh, o_sh)


def _mesh_safe_builder(builder, mesh=None, batch_axes=("data",)):
    """Route the Pallas LSTM recurrence under the mesh.

    GSPMD cannot partition a Mosaic custom call (it treats it as opaque
    and replicates it, defeating the sharding — and on the CPU dryrun
    interpret mode silently hides that). Since round 5 the mesh path
    instead calls the kernel PER DEVICE inside an explicit ``shard_map``
    (ops/pallas/lstm_kernel.py::lstm_bidir_tm_sharded): batch sharded
    over ``batch_axes``, recurrent weights replicated, per-device dW_hh
    partials reduced in the custom VJP. Returns ``(builder, ctx)`` where
    ``ctx`` is the ``(mesh, axes)`` shard context to install around the
    jitted step's trace, or ``None`` when the scan recurrence runs.

    The scan fallback (same parameter tree and math; kernel-vs-scan loss
    trajectories match to ~1e-6, docs/PERF.md) remains for:

    - tensor parallelism (mesh 'model' > 1): the gate dimension of W_hh
      is 'model'-sharded (``_param_spec``), and feeding a single-device
      kernel would mean gathering it into every instance — the scan
      lets GSPMD partition the gate matmuls instead;
    - the batch-blocked ablation kernels (``SE_PALLAS_TM=0``) — only the
      time-major kernel has the sharded VJP;
    - ``SE_PALLAS_MESH=0`` (explicit opt-out, default on).
    """
    import os
    import warnings

    model = getattr(builder, "model", None)
    # the context is installed for EVERY mesh step: the flash-attention
    # routing (models/transformer.py) consults it too, and decides its
    # own mesh suitability (it needs a single pure-batch axis). For
    # non-Pallas-LSTM models that is all it does.
    ctx = (mesh, tuple(batch_axes)) if mesh is not None else None
    if not getattr(model, "use_pallas", False):
        return builder, ctx
    tm = os.environ.get("SE_PALLAS_TM", "1") == "1"
    opted_out = os.environ.get("SE_PALLAS_MESH", "1") == "0"
    tp = mesh is not None and mesh.shape.get("model", 1) > 1
    if mesh is not None and tm and not (opted_out or tp):
        return builder, ctx
    import dataclasses

    why = (
        "mesh 'model' axis > 1 — W_hh gates are tensor-parallel and the "
        "per-device kernel would need them gathered" if tp
        else "SE_PALLAS_MESH=0" if opted_out
        else "SE_PALLAS_TM=0 — only the time-major kernel is mesh-capable"
    )
    warnings.warn(
        f"[parallel] mesh steps use the scan LSTM recurrence ({why}); "
        "same params and math as the kernel"
    )
    return dataclasses.replace(
        builder, model=model.clone(use_pallas=False)), ctx


def make_parallel_train_step(builder, mesh: Mesh, state):
    """jit the builder's RAW train step once with mesh shardings: batch over
    'data', params/moments per tensor-parallel rules, frozen upstream
    replicated. GSPMD inserts the psum for gradients and any all-gathers
    for the model-sharded matmuls."""
    builder, shard_ctx = _mesh_safe_builder(builder, mesh, ("data",))
    state, (p_sh, o_sh) = shard_train_state(mesh, state)
    step_sh = NamedSharding(mesh, P())
    state_sh = type(state)(p_sh, o_sh, step_sh)

    up = builder.upstream_params()
    up_sh = replicated(mesh, up)

    wav_sh = NamedSharding(mesh, P("data", None, None))
    len_sh = NamedSharding(mesh, P("data"))
    rng_sh = NamedSharding(mesh, P())
    out_stats_sh = {
        "loss": step_sh, "grad_norm": step_sh, "skipped": step_sh,
    }
    jitted = jax.jit(
        builder.train_step_raw(),
        in_shardings=(state_sh, wav_sh, len_sh, rng_sh, up_sh),
        out_shardings=(state_sh, out_stats_sh),
        donate_argnums=(0,),
    )

    def step(st, wavs, lengths, rng):
        if shard_ctx is None:
            return jitted(st, wavs, lengths, rng, up)
        # tracing (first call per shape) must see the shard context so
        # LSTMStack routes the Pallas kernel through shard_map; entering
        # it on cached-executable calls is a no-op global push/pop
        from ..ops.pallas.lstm_kernel import shard_context as _sc

        with _sc(*shard_ctx):
            return jitted(st, wavs, lengths, rng, up)

    return step, state


def make_parallel_eval_step(builder, mesh: Mesh):
    """jit the builder's RAW eval step with the batch sharded over EVERY
    mesh device (eval/serving has no gradient sync — both axes act as
    data parallelism); params/upstream replicated, per-utterance outputs
    sharded like the batch. The reference's eval is single-GPU with a
    host-side joblib metric pool (/root/reference/runner.py:586-603); here
    each chip scores its batch shard on device and only (B,) score vectors
    leave. Caller must feed batches divisible by the device count (the
    Runner falls back to the single-device step otherwise)."""
    builder, shard_ctx = _mesh_safe_builder(
        builder, mesh, tuple(mesh.axis_names))
    every = P(tuple(mesh.axis_names))
    batch_sh = NamedSharding(mesh, every)
    rep = NamedSharding(mesh, P())

    up = builder.upstream_params()
    wav_sh = NamedSharding(mesh, P(tuple(mesh.axis_names), None, None))

    def out_shardings(names):
        return {
            "loss": rep,
            "scores": {n: batch_sh for n in names},
            "wav_predicted": NamedSharding(
                mesh, P(tuple(mesh.axis_names), None)
            ),
            "wav_inp": NamedSharding(mesh, P(tuple(mesh.axis_names), None)),
            "wav_tar": NamedSharding(mesh, P(tuple(mesh.axis_names), None)),
        }

    # params/upstream keep whatever shardings they already carry (the
    # train-step's tensor-parallel layout) — None = use the arg's sharding
    jitted = jax.jit(
        builder.eval_step_raw(),
        in_shardings=(None, wav_sh, batch_sh, None),
        out_shardings=out_shardings(builder.eval_metrics),
    )

    def step(params, wavs, lengths):
        if shard_ctx is None:
            return jitted(params, wavs, lengths, up)
        from ..ops.pallas.lstm_kernel import shard_context as _sc

        with _sc(*shard_ctx):
            return jitted(params, wavs, lengths, up)

    return step
