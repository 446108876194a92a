"""Sequence parallelism for the SSL upstream encoder.

The reference bounds sequence length instead of scaling it (SURVEY.md §5
long-context: 10 s crops, MAX_POSITIONS_LEN ceiling) — sequence sharding
is an *additive* TPU-native capability, the stretch goal SURVEY names.

Layout: a ('data', 'seq') mesh. The (B, T, D) feature tensor is sharded
batch-over-'data' and time-over-'seq'; every per-position op (input
projection, LayerNorm, FFN, residuals) runs on the local time chunk with
zero communication, and self-attention keeps Q local while all-gathering
K/V over 'seq' (models/transformer.py SelfAttention.seq_axis) so each
position still attends to the full sequence. Position encodings are
offset by the device's axis index inside the chunk. One K/V all-gather
per layer rides ICI; at this model's <=1001 frames that is O(T*H) bytes
per layer — negligible next to the FFN matmuls, which is exactly why
sequence sharding scales long inputs at near-linear efficiency.

Numerics match the single-device encoder to float tolerance
(tests/test_sequence_parallel.py): sharding only partitions the same
computation; the gathers reconstruct axis order.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_seq_mesh(
    n_devices: Optional[int] = None,
    seq_parallel: int = 2,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """('data', 'seq') mesh; seq_parallel divides the device count."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % seq_parallel == 0, (n, seq_parallel)
    arr = np.array(devices).reshape(n // seq_parallel, seq_parallel)
    return Mesh(arr, axis_names=("data", "seq"))


def sequence_parallel_encoder(encoder, mesh: Mesh):
    """Build a jitted sequence-parallel forward for a TransformerEncoder.

    Returns ``fn(params, spec (B, T, D)) -> (B, T', H)`` where the 'data'
    axis divides B and ``seq * downsample_rate`` divides T. The module is
    re-instantiated with ``seq_axis='seq'`` (same param tree — the axis
    changes collectives, not parameters).
    """
    import dataclasses

    from jax import shard_map

    sp_encoder = (
        dataclasses.replace(encoder, seq_axis="seq")
        if dataclasses.is_dataclass(encoder)
        else encoder.clone(seq_axis="seq")
    )

    def local_fwd(p, spec_local):
        return sp_encoder.apply({"params": p}, spec_local, deterministic=True)

    sharded = shard_map(
        local_fwd,
        mesh=mesh,
        in_specs=(P(), P("data", "seq", None)),
        out_specs=P("data", "seq", None),
    )

    @jax.jit
    def fn(p, spec):
        seq = mesh.shape["seq"]
        dr = max(1, getattr(encoder.config, "downsample_rate", 1))
        assert spec.shape[0] % mesh.shape["data"] == 0, (
            f"data axis {mesh.shape['data']} must divide batch {spec.shape[0]}"
        )
        assert spec.shape[1] % (seq * dr) == 0, (
            f"seq*downsample {seq * dr} must divide time {spec.shape[1]} "
            "(pad frames to a multiple first)"
        )
        # the per-shard PE slice (offset by axis index) would silently
        # CLAMP past the table where the unsharded path fails loudly —
        # check the global length here at trace time instead
        assert spec.shape[1] // dr <= encoder.max_positions, (
            f"{spec.shape[1] // dr} encoder positions exceed the "
            f"position-encoding table ({encoder.max_positions})"
        )
        return sharded(p, spec)

    return fn


def pad_frames_for_seq(spec: jnp.ndarray, seq: int, dr: int = 1):
    """Zero-pad the time axis to a multiple of seq*dr; returns (padded,
    original_T) so callers can trim the encoder output back."""
    t = spec.shape[1]
    m = seq * dr
    pad = (-t) % m
    if pad:
        spec = jnp.pad(spec, ((0, 0), (0, pad), (0, 0)))
    return spec, t
