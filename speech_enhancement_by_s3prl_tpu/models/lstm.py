"""Multi-layer (bi)LSTM for TPU.

Replaces the reference's cuDNN ``nn.LSTM`` (/root/reference/model.py:41-42,
67-68) with a scan-based design shaped for XLA/TPU:

- the input projection for ALL timesteps of a layer is one large matmul
  (B*T, D) @ (D, 4H) that tiles onto the MXU;
- only the hidden recurrence h @ W_hh runs inside ``lax.scan`` (unrolled by
  a small factor to amortize loop overhead);
- for bidirectional layers BOTH directions run in a SINGLE scan: the
  backward direction's time-flipped stream rides a leading direction axis
  and the recurrence is one batched matmul (2, B, H) @ (2, H, 4H) — the
  sequential loop count (which dominates LSTM latency on TPU; the per-step
  matmuls are tiny) is halved versus two separate scans;
- the parameter layout and gate order (i, f, g, o) match torch exactly so
  PyTorch checkpoints import losslessly (params under ``l{k}_fwd`` /
  ``l{k}_bwd``);
- sequences are processed fully padded — the reference feeds padded batches
  without packing (/root/reference/runner.py:453), so the backward direction
  of a BLSTM sees padding there too; we reproduce that semantics.

Weight init reproduces /root/reference/model.py:48-55: xavier-uniform for
W_ih, orthogonal for W_hh, zeros for biases.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# scan unroll factor (amortizes while-loop trip overhead); env-tunable for
# benchmarking without touching model signatures. 4 measured best at the
# champion batch on v5e: 28,958x vs 27,181x at 8 (docs/PERF.md round-2)
DEFAULT_UNROLL = int(os.environ.get("SE_LSTM_UNROLL", "4"))


def _xw_mode() -> str:
    """Storage dtype of the precomputed input projections, read at TRACE
    time (not import time, so callers may set the env after importing):
    - bf16 halves the dominant HBM stream through the recurrence at a
      small numerics cost (gate inputs only; h-recurrence/cell stay f32);
    - int8 (per-(direction,batch,timestep) scale) quarters it, ~0.8%
      relative gate-input quantization error — measured slower than bf16
      on v5e (docs/PERF.md), kept for ablation."""
    if os.environ.get("SE_LSTM_XW_INT8", "0") == "1":
        return "int8"
    if os.environ.get("SE_LSTM_XW_BF16", "0") == "1":
        return "bf16"
    return "f32"


class LstmDirParams(nn.Module):
    """Parameter holder for one direction of one layer (torch layout)."""

    hidden_size: int
    input_size: int

    @nn.compact
    def __call__(self) -> Dict[str, jnp.ndarray]:
        h4 = 4 * self.hidden_size
        return dict(
            w_ih=self.param("w_ih", nn.initializers.xavier_uniform(),
                            (h4, self.input_size)),
            w_hh=self.param("w_hh", nn.initializers.orthogonal(),
                            (h4, self.hidden_size)),
            b_ih=self.param("b_ih", nn.initializers.zeros, (h4,)),
            b_hh=self.param("b_hh", nn.initializers.zeros, (h4,)),
        )


def _lstm_scan(xw, w_hh_t, hidden_size, unroll, compute_dtype,
               init_state=None, return_final=False):
    """Run the gate recurrence over time.

    xw: (..., B, T, 4H) precomputed input projections (+biases), possibly
    with a leading direction axis; w_hh_t matching (..., H, 4H).
    Returns hidden states shaped like xw[..., :H].

    ``init_state``: optional (h, c) carry to start from (streaming
    continuation — ops/streaming.py); ``return_final`` additionally
    returns the final (h, c).
    """
    H = hidden_size
    dt = compute_dtype
    lead = xw.shape[:-2][:-1]  # axes before (B, T)
    B = xw.shape[-3]

    mode = _xw_mode()

    def step(carry, scanned):
        h, c = carry
        if mode == "int8":
            xw_t, scale_t = scanned
            xw_f = xw_t.astype(jnp.float32) * scale_t
        else:
            xw_f = scanned.astype(jnp.float32)
        gates = xw_f + jnp.einsum(
            "...bh,...hg->...bg", h.astype(dt), w_hh_t,
            preferred_element_type=jnp.float32,
        )
        i = jax.nn.sigmoid(gates[..., :H])
        f = jax.nn.sigmoid(gates[..., H : 2 * H])
        g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o = jax.nn.sigmoid(gates[..., 3 * H :])
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    init = (
        jnp.zeros(lead + (B, H), jnp.float32),
        jnp.zeros(lead + (B, H), jnp.float32),
    ) if init_state is None else (
        init_state[0].astype(jnp.float32), init_state[1].astype(jnp.float32)
    )
    if mode == "int8":
        scale = jnp.abs(xw).max(axis=-1, keepdims=True) / 127.0 + 1e-12
        xw_q = jnp.clip(jnp.round(xw / scale), -127, 127).astype(jnp.int8)
        scanned = (jnp.moveaxis(xw_q, -2, 0), jnp.moveaxis(scale, -2, 0))
    elif mode == "bf16":
        scanned = jnp.moveaxis(xw.astype(jnp.bfloat16), -2, 0)
    else:
        scanned = jnp.moveaxis(xw, -2, 0)
    final, hs = jax.lax.scan(step, init, scanned, unroll=unroll)
    hs = jnp.moveaxis(hs, 0, -2)
    return (hs, final) if return_final else hs


class LstmCellScan(nn.Module):
    """Single-direction LSTM layer over (B, T, D)."""

    hidden_size: int
    reverse: bool = False
    unroll: int = DEFAULT_UNROLL
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, initial_state=None,
                 return_state: bool = False):
        h4 = 4 * self.hidden_size
        p = dict(
            w_ih=self.param("w_ih", nn.initializers.xavier_uniform(),
                            (h4, x.shape[-1])),
            w_hh=self.param("w_hh", nn.initializers.orthogonal(),
                            (h4, self.hidden_size)),
            b_ih=self.param("b_ih", nn.initializers.zeros, (h4,)),
            b_hh=self.param("b_hh", nn.initializers.zeros, (h4,)),
        )
        dt = self.compute_dtype
        if self.reverse:
            assert initial_state is None and not return_state, (
                "state carrying is a forward-direction (streaming) feature"
            )
            x = jnp.flip(x, axis=1)
        xw = (
            jnp.einsum("btd,hd->bth", x.astype(dt), p["w_ih"].astype(dt),
                       preferred_element_type=jnp.float32)
            + p["b_ih"] + p["b_hh"]
        )
        out = _lstm_scan(
            xw, p["w_hh"].astype(dt).T, self.hidden_size, self.unroll, dt,
            init_state=initial_state, return_final=return_state,
        )
        if return_state:
            return out
        hs = out
        if self.reverse:
            hs = jnp.flip(hs, axis=1)
        return hs


class LSTMStack(nn.Module):
    """torch ``nn.LSTM(num_layers, bidirectional, batch_first=True)``
    equivalent. Output dim = hidden_size * (2 if bidirectional else 1).

    ``use_pallas`` routes the bidirectional recurrence through the Pallas
    TPU kernel (ops/pallas/lstm_kernel.py). The default time-major
    variant is differentiable (custom VJP with a reverse-time backward
    kernel) so it serves both inference and training; the batch-blocked
    ablation (``SE_PALLAS_TM=0``) stays forward-only."""

    hidden_size: int
    num_layers: int = 1
    bidirectional: bool = False
    unroll: int = DEFAULT_UNROLL
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    pallas_interpret: bool = False
    # rematerialize each layer under autodiff: drops the (2, B, T, 4H)
    # projection activations from the residual set (recomputed in the
    # backward pass), roughly halving training memory per layer
    remat: bool = os.environ.get("SE_LSTM_REMAT", "0") == "1"
    # instrument layer k (or every layer, 'all') for the active-learning
    # capture scorer (active/sampler.py): sows the direction-stacked layer
    # input and hidden streams into 'intermediates' and routes the input
    # projection through a zero perturbation in 'perturbations', whose
    # cotangent under one batched backward is the per-sample, per-step
    # gate cotangent. None (default) leaves every path untouched —
    # perturb/sow are not even called, so normal init never creates the
    # collections.
    capture_layer: Any = None  # None | int | 'all'

    def _captured(self, layer: int) -> bool:
        return self.capture_layer == layer or self.capture_layer == "all"

    def _interpret(self) -> bool:
        # Mosaic kernels only lower for TPU; on CPU (tests, --cpu CLI
        # runs with SE_PALLAS_LSTM=1 in the env) fall back to Pallas
        # interpret mode instead of failing to compile
        return self.pallas_interpret or jax.default_backend() == "cpu"

    @nn.compact
    def __call__(self, x: jnp.ndarray, initial_state=None,
                 return_state: bool = False):
        dt = self.compute_dtype
        H = self.hidden_size
        if self.capture_layer is not None and not self.bidirectional:
            raise ValueError(
                "capture_layer instrumentation is implemented for the fused "
                "bidirectional layers only (the reference's active configs "
                "score a bidirectional downstream)"
            )
        if (initial_state is not None or return_state) and self.bidirectional:
            raise ValueError(
                "recurrent-state carrying (streaming) needs a "
                "unidirectional stack — the backward direction would need "
                "future audio"
            )
        final_states = []
        for layer in range(self.num_layers):
            if not self.bidirectional:
                cell = LstmCellScan(
                    H, reverse=False, unroll=self.unroll, compute_dtype=dt,
                    name=f"l{layer}_fwd",
                )
                if initial_state is not None or return_state:
                    st = (None if initial_state is None
                          else initial_state[layer])
                    x, fin = cell(x, initial_state=st, return_state=True)
                    final_states.append(fin)
                else:
                    x = cell(x)
                continue

            # fused bidirectional layer: one scan/kernel for both directions
            pf = LstmDirParams(H, x.shape[-1], name=f"l{layer}_fwd")()
            pb = LstmDirParams(H, x.shape[-1], name=f"l{layer}_bwd")()

            if (self.use_pallas
                    and os.environ.get("SE_PALLAS_FUSED", "0") == "1"
                    and not self._captured(layer)):
                from ..ops.pallas.lstm_kernel import lstm_bidir_pallas_fused

                xs = jnp.stack([x, jnp.flip(x, axis=1)], axis=0)
                hs = lstm_bidir_pallas_fused(
                    xs,
                    jnp.stack([pf["w_ih"].T, pb["w_ih"].T], axis=0),
                    jnp.stack(
                        [pf["b_ih"] + pf["b_hh"], pb["b_ih"] + pb["b_hh"]],
                        axis=0,
                    ),
                    jnp.stack([pf["w_hh"].T, pb["w_hh"].T], axis=0),
                    interpret=self._interpret(),
                )
                x = jnp.concatenate([hs[0], jnp.flip(hs[1], axis=1)], axis=-1)
                continue

            capture = self._captured(layer)

            def bidir_layer(x_in, pf=pf, pb=pb, capture=capture, layer=layer):
                xs = jnp.stack([x_in, jnp.flip(x_in, axis=1)], axis=0)
                w_ih = jnp.stack([pf["w_ih"], pb["w_ih"]], axis=0)
                bias = jnp.stack(
                    [pf["b_ih"] + pf["b_hh"], pb["b_ih"] + pb["b_hh"]], axis=0
                )[:, None, None, :]
                xw = (
                    jnp.einsum("dbtn,dhn->dbth", xs.astype(dt),
                               w_ih.astype(dt),
                               preferred_element_type=jnp.float32)
                    + bias
                )
                if capture:
                    # per-sample gradient capture (active/sampler.py): the
                    # cotangent of this zero perturbation is the per-step
                    # gate cotangent d_t; with the sowed xs/hs streams the
                    # per-sample layer grads are outer-product einsums —
                    # one batched backward replaces vmap(grad)
                    self.sow("intermediates", f"l{layer}_xs", xs)
                    xw = self.perturb(f"l{layer}_xw", xw)
                w_hh_t = jnp.stack(
                    [pf["w_hh"].T, pb["w_hh"].T], axis=0
                ).astype(dt)  # (2, H, 4H)
                if self.use_pallas:
                    from ..ops.pallas.lstm_kernel import (
                        current_shard_context,
                        lstm_bidir_pallas,
                        lstm_bidir_tm,
                        lstm_bidir_tm_sharded,
                    )

                    # honor the xw storage mode: bf16 halves the kernel's
                    # dominant HBM stream exactly like the scan path
                    xw_k = (
                        xw.astype(jnp.bfloat16) if _xw_mode() == "bf16"
                        else xw.astype(jnp.float32)
                    )
                    if os.environ.get("SE_PALLAS_TM", "1") == "1":
                        # time-major grid (default): full batch per step,
                        # scan-equal sequential step count, xw double-
                        # buffered across steps — measured +33% over the
                        # scan champion on v5e (docs/PERF.md); set
                        # SE_PALLAS_TM=0 for the batch-blocked variant.
                        # Differentiable (custom VJP with a reverse-time
                        # backward kernel), so this path also serves
                        # training under SE_PALLAS_LSTM=1. When tracing
                        # happens inside a mesh step (parallel/mesh.py
                        # installs the shard context around its jitted
                        # calls), the kernel runs per device on its batch
                        # shard via shard_map instead of falling back to
                        # the scan.
                        ctx = current_shard_context()
                        if ctx is not None:
                            hs = lstm_bidir_tm_sharded(
                                xw_k, w_hh_t.astype(jnp.float32),
                                ctx[0], ctx[1], self._interpret(),
                            )
                        else:
                            hs = lstm_bidir_tm(
                                xw_k, w_hh_t.astype(jnp.float32),
                                self._interpret(),
                            )
                    else:
                        hs = lstm_bidir_pallas(
                            xw_k, w_hh_t.astype(jnp.float32),
                            interpret=self._interpret(),
                        )
                else:
                    hs = _lstm_scan(xw, w_hh_t, H, self.unroll, dt)
                if capture:
                    # internal orientation (direction 1 time-flipped),
                    # consistent with the perturbation's cotangent
                    self.sow("intermediates", f"l{layer}_hs", hs)
                return jnp.concatenate([hs[0], jnp.flip(hs[1], axis=1)], axis=-1)

            # flax state effects (sow/perturb) cannot live inside a plain
            # jax.checkpoint closure — the captured layer skips remat
            if self.remat and not capture:
                bidir_layer = jax.checkpoint(bidir_layer)
            x = bidir_layer(x)
        if return_state:
            return x, tuple(final_states)
        return x
