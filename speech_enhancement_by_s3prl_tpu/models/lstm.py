"""Multi-layer (bi)LSTM for TPU.

Replaces the reference's cuDNN ``nn.LSTM`` (/root/reference/model.py:41-42,
67-68) with a scan-based design shaped for XLA/TPU:

- the input projection for ALL timesteps of a layer is one large matmul
  (B*T, D) @ (D, 4H) that tiles onto the MXU;
- only the hidden recurrence h @ W_hh runs inside ``lax.scan`` (unrolled by
  a small factor to amortize loop overhead);
- the parameter layout and gate order (i, f, g, o) match torch exactly so
  PyTorch checkpoints import losslessly;
- sequences are processed fully padded — the reference feeds padded batches
  without packing (/root/reference/runner.py:453), so the backward direction
  of a BLSTM sees padding there too; we reproduce that semantics.

Weight init reproduces /root/reference/model.py:48-55: xavier-uniform for
W_ih, orthogonal for W_hh, zeros for biases.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class LstmCellScan(nn.Module):
    """Single-direction LSTM layer over (B, T, D) with precomputed inputs."""

    hidden_size: int
    reverse: bool = False
    unroll: int = 8
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_in = x.shape[-1]
        h4 = 4 * self.hidden_size
        w_ih = self.param("w_ih", nn.initializers.xavier_uniform(), (h4, d_in))
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (h4, self.hidden_size))
        b_ih = self.param("b_ih", nn.initializers.zeros, (h4,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (h4,))

        dt = self.compute_dtype
        if self.reverse:
            x = jnp.flip(x, axis=1)

        # big MXU matmul: all timesteps at once
        xw = (
            jnp.einsum(
                "btd,hd->bth", x.astype(dt), w_ih.astype(dt),
                preferred_element_type=jnp.float32,
            )
            + b_ih + b_hh
        )

        w_hh_t = w_hh.astype(dt).T  # (H, 4H)
        H = self.hidden_size

        def step(carry, xw_t):
            h, c = carry
            gates = xw_t + jnp.dot(
                h.astype(dt), w_hh_t, preferred_element_type=jnp.float32
            )
            i = jax.nn.sigmoid(gates[..., :H])
            f = jax.nn.sigmoid(gates[..., H : 2 * H])
            g = jnp.tanh(gates[..., 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[..., 3 * H :])
            c = f * c + i * g
            h = o * jnp.tanh(c)
            return (h, c), h

        B = x.shape[0]
        init = (
            jnp.zeros((B, H), jnp.float32),
            jnp.zeros((B, H), jnp.float32),
        )
        _, hs = jax.lax.scan(
            step, init, jnp.swapaxes(xw, 0, 1), unroll=self.unroll
        )
        hs = jnp.swapaxes(hs, 0, 1)  # (B, T, H)
        if self.reverse:
            hs = jnp.flip(hs, axis=1)
        return hs


class LSTMStack(nn.Module):
    """torch ``nn.LSTM(num_layers, bidirectional, batch_first=True)``
    equivalent. Output dim = hidden_size * (2 if bidirectional else 1)."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    unroll: int = 8
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for layer in range(self.num_layers):
            fwd = LstmCellScan(
                self.hidden_size, reverse=False, unroll=self.unroll,
                compute_dtype=self.compute_dtype, name=f"l{layer}_fwd",
            )(x)
            if self.bidirectional:
                bwd = LstmCellScan(
                    self.hidden_size, reverse=True, unroll=self.unroll,
                    compute_dtype=self.compute_dtype, name=f"l{layer}_bwd",
                )(x)
                x = jnp.concatenate([fwd, bwd], axis=-1)
            else:
                x = fwd
        return x
