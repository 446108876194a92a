"""Wavefront pipeline parallelism for stacked unidirectional LSTMs.

An L-layer LSTM has a natural wavefront: layer l at time t depends on
layer l at t-1 and layer l-1 at t. Placing one layer per device on a
'pipe' mesh axis and chunking time lets all L devices compute
simultaneously once the pipeline fills — chunk c of layer l runs while
chunk c+1 of layer l-1 runs — with a single `ppermute` hop per step
carrying chunk outputs down the pipe over ICI.

Applies to unidirectional stacks only (a bidirectional layer's backward
direction needs the *complete* sequence of the layer below, which breaks
the wavefront). The reference has no distributed execution at all
(SURVEY.md parallelism inventory); this is additive TPU-native capability
for deep recurrent stacks.

Parity: same math as models/lstm.py's scan path (gate order i,f,g,o),
tested equal on a CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cell_chunk(xw_chunk, w_hh_t, carry, hidden):
    """Run one time chunk: xw_chunk (B, CT, 4H) precomputed projections."""
    H = hidden

    def step(c, xw_t):
        h, cc = c
        gates = xw_t + jnp.dot(h, w_hh_t, preferred_element_type=jnp.float32)
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        cc = f * cc + i * g
        h = o * jnp.tanh(cc)
        return (h, cc), h

    carry, hs = jax.lax.scan(step, carry, jnp.swapaxes(xw_chunk, 0, 1))
    return carry, jnp.swapaxes(hs, 0, 1)  # (B, CT, H)


def pipeline_lstm(
    x: jnp.ndarray,
    stacked_params: Dict[str, jnp.ndarray],
    mesh: Mesh,
    axis: str = "pipe",
    n_chunks: int = 8,
) -> jnp.ndarray:
    """Run an L-layer uni-LSTM with layers sharded over `axis`.

    x: (B, T, D) replicated input (D == H required for layers > 0, i.e.
    all layers share width — the standard stacked-LSTM case with
    input_size == hidden_size; layer 0's W_ih has shape (4H, D)).
    stacked_params: {'w_ih': (L, 4H, D), 'w_hh': (L, 4H, H),
                     'b': (L, 4H)} with L == mesh.shape[axis].
    Returns (B, T, H) — the last layer's hidden states, replicated.
    """
    L = mesh.shape[axis]
    B, T, D = x.shape
    h4 = stacked_params["w_hh"].shape[1]
    H = h4 // 4
    assert D == H or stacked_params["w_ih"].shape[-1] == D
    assert T % n_chunks == 0, (T, n_chunks)
    CT = T // n_chunks

    def local_fn(x_local, w_ih, w_hh, b):
        # shapes inside shard_map: x_local (B, T, D) replicated;
        # w_ih (1, 4H, D), w_hh (1, 4H, H), b (1, 4H) — this device's layer
        p = jax.lax.axis_index(axis)
        w_ih = w_ih[0]
        w_hh_t = w_hh[0].T
        b_ = b[0]

        carry = (jnp.zeros((B, H), jnp.float32), jnp.zeros((B, H), jnp.float32))
        prev_out = jnp.zeros((B, CT, H), jnp.float32)
        outputs = jnp.zeros((n_chunks, B, CT, H), jnp.float32)

        x_chunks = x_local.reshape(B, n_chunks, CT, D)

        def body(s, state):
            carry, prev_out, outputs = state
            # chunk output of the previous device, from its previous step
            incoming = jax.lax.ppermute(
                prev_out, axis, [(i, i + 1) for i in range(L - 1)]
            )
            c_idx = s - p
            active = jnp.logical_and(c_idx >= 0, c_idx < n_chunks)
            safe_idx = jnp.clip(c_idx, 0, n_chunks - 1)

            my_in = jnp.where(
                p == 0,
                jax.lax.dynamic_index_in_dim(
                    jnp.swapaxes(x_chunks, 0, 1), safe_idx, keepdims=False
                ),
                # layers > 0 consume the layer below's chunk (D == H)
                incoming[..., :D],
            )
            xw = (
                jnp.einsum("btd,hd->bth", my_in, w_ih,
                           preferred_element_type=jnp.float32)
                + b_
            )
            new_carry, out = _cell_chunk(xw, w_hh_t, carry, H)
            carry = jax.tree.map(
                lambda new, old: jnp.where(active, new, old), new_carry, carry
            )
            out = jnp.where(active, out, prev_out * 0)
            outputs = outputs.at[safe_idx].set(
                jnp.where(active, out, outputs[safe_idx])
            )
            return carry, out, outputs

        state = (carry, prev_out, outputs)
        state = jax.lax.fori_loop(0, n_chunks + L - 1, body, state)
        outputs = state[2]  # (n_chunks, B, CT, H) — valid on device L-1

        # broadcast the last device's result to all (replicated output):
        # mask every other device's buffer and sum over the axis
        outputs = jax.lax.psum(
            jnp.where(p == L - 1, outputs, jnp.zeros_like(outputs)), axis
        )
        out = jnp.swapaxes(outputs, 0, 1).reshape(B, T, H)
        return out

    shard = functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False,
    )
    return shard(local_fn)(
        x.astype(jnp.float32),
        stacked_params["w_ih"],
        stacked_params["w_hh"],
        stacked_params["b"],
    )


def stack_lstm_params(params: Dict, num_layers: int) -> Dict[str, jnp.ndarray]:
    """Collect LSTMStack fwd-direction params (models/lstm.py layout:
    l{k}_fwd/{w_ih,w_hh,b_ih,b_hh}) into stacked (L, ...) arrays for the
    pipeline. Requires equal widths across layers (input_size == hidden)."""
    p = params["params"] if "params" in params else params
    if "lstm" in p:
        p = p["lstm"]
    w_ih = jnp.stack([p[f"l{k}_fwd"]["w_ih"] for k in range(num_layers)])
    w_hh = jnp.stack([p[f"l{k}_fwd"]["w_hh"] for k in range(num_layers)])
    b = jnp.stack(
        [p[f"l{k}_fwd"]["b_ih"] + p[f"l{k}_fwd"]["b_hh"] for k in range(num_layers)]
    )
    return {"w_ih": w_ih, "w_hh": w_hh, "b": b}
