"""Pallas TPU kernel for the fused bidirectional LSTM recurrence.

The scan-based layer (models/lstm.py) pays XLA while-loop overhead per
timestep and cannot keep the recurrent weights pinned on-chip explicitly.
This kernel runs the whole recurrence as one ``pallas_call``:

- grid over time chunks; Pallas's block pipeline double-buffers the
  precomputed input projections (2, B, CT, 4H) HBM->VMEM while the MXU
  chews on the previous chunk;
- W_hh^T (2, H, 4H) and the h/c state live in VMEM for the entire
  sequence (scratch persists across sequential grid steps on TPU);
- both directions are one batched matmul per step, identical math to the
  scan path (gate order i, f, g, o) — parity-tested against it.

The time-major variant (`lstm_bidir_tm`) is differentiable via a custom
VJP whose backward pass is itself a reverse-time Pallas kernel
(`_kernel_tm_bwd`, gate recomputation — no gate tensor in HBM), so
`SE_PALLAS_LSTM=1` serves training as well as inference. The older
batch-blocked kernels (`lstm_bidir_pallas`, `lstm_bidir_pallas_fused`)
remain forward-only ablations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xw_ref, whh_ref, hs_ref, h_scr, c_scr, *, chunk, hidden):
    """One grid step: `chunk` timesteps of one batch block, both directions.
    Grid is (batch_blocks, time_chunks) — time iterates minor (consecutive
    for a given batch block), so the recurrent scratch carries across time
    chunks and resets at each batch block's first chunk."""
    H = hidden

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    for i in range(chunk):
        # xw may be stored bf16 (halves the dominant HBM stream, same
        # numerics budget as the bf16 scan path); gates accumulate in f32
        xw_t = xw_ref[:, :, i, :].astype(jnp.float32)  # (2, B, 4H)
        g0 = jnp.dot(h_scr[0], whh_ref[0], preferred_element_type=jnp.float32)
        g1 = jnp.dot(h_scr[1], whh_ref[1], preferred_element_type=jnp.float32)
        gates = xw_t + jnp.stack([g0, g1], axis=0)
        i_g = jax.nn.sigmoid(gates[..., :H])
        f_g = jax.nn.sigmoid(gates[..., H : 2 * H])
        g_g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o_g = jax.nn.sigmoid(gates[..., 3 * H :])
        c = f_g * c_scr[...] + i_g * g_g
        h = o_g * jnp.tanh(c)
        c_scr[...] = c
        h_scr[...] = h
        hs_ref[:, :, i, :] = h


def _fused_kernel(xs_ref, wih_ref, bias_ref, whh_ref, hs_ref, h_scr, c_scr,
                  *, chunk, hidden):
    """Fused variant: computes the input projection on the fly inside the
    kernel, so the (2, B, T, 4H) xw tensor never exists in HBM — the
    kernel streams the raw (2, B, T, D) features instead (4H/D times less
    traffic). One grid step = `chunk` timesteps of one batch block."""
    H = hidden

    @pl.when(pl.program_id(1) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    # project the whole chunk at once: (2, BB*chunk, D) @ (2, D, 4H)
    x0 = xs_ref[0].reshape(-1, xs_ref.shape[-1])
    x1 = xs_ref[1].reshape(-1, xs_ref.shape[-1])
    xw0 = jnp.dot(x0, wih_ref[0], preferred_element_type=jnp.float32)
    xw1 = jnp.dot(x1, wih_ref[1], preferred_element_type=jnp.float32)
    bb = xs_ref.shape[1]
    bias = bias_ref[...]
    xw = jnp.stack(
        [xw0.reshape(bb, chunk, 4 * H), xw1.reshape(bb, chunk, 4 * H)], axis=0
    ) + bias[:, None, None, :]

    for i in range(chunk):
        g0 = jnp.dot(h_scr[0], whh_ref[0], preferred_element_type=jnp.float32)
        g1 = jnp.dot(h_scr[1], whh_ref[1], preferred_element_type=jnp.float32)
        gates = xw[:, :, i, :] + jnp.stack([g0, g1], axis=0)
        i_g = jax.nn.sigmoid(gates[..., :H])
        f_g = jax.nn.sigmoid(gates[..., H : 2 * H])
        g_g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o_g = jax.nn.sigmoid(gates[..., 3 * H :])
        c = f_g * c_scr[...] + i_g * g_g
        h = o_g * jnp.tanh(c)
        c_scr[...] = c
        h_scr[...] = h
        hs_ref[:, :, i, :] = h


def lstm_bidir_pallas_fused(
    xs: jnp.ndarray,      # (2, B, T, D) direction-stacked inputs, f32
    w_ih_t: jnp.ndarray,  # (2, D, 4H)
    bias: jnp.ndarray,    # (2, 4H) combined b_ih + b_hh
    w_hh_t: jnp.ndarray,  # (2, H, 4H)
    chunk: int = 8,
    batch_block: int = 32,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fully fused projection+recurrence; returns (2, B, T, H)."""
    d2, B, T, D = xs.shape
    h4 = w_hh_t.shape[-1]
    H = h4 // 4
    bb = min(batch_block, B)
    pad_b = (-B) % bb
    pad_t = (-T) % chunk
    if pad_b or pad_t:
        xs = jnp.pad(xs, ((0, 0), (0, pad_b), (0, pad_t), (0, 0)))
    Bp, Tp = B + pad_b, T + pad_t

    out = pl.pallas_call(
        functools.partial(_fused_kernel, chunk=chunk, hidden=H),
        grid=(Bp // bb, Tp // chunk),
        in_specs=[
            pl.BlockSpec((2, bb, chunk, D), lambda b, t: (0, b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, D, h4), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, h4), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, h4), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, bb, chunk, H), lambda b, t: (0, b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, Bp, Tp, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, bb, H), jnp.float32),
            pltpu.VMEM((2, bb, H), jnp.float32),
        ],
        interpret=interpret,
    )(
        xs.astype(jnp.float32),
        w_ih_t.astype(jnp.float32),
        bias.astype(jnp.float32),
        w_hh_t.astype(jnp.float32),
    )
    return out[:, :B, :T, :]


def _kernel_tm(xw_ref, whh_ref, hs_ref, h_scr, c_scr, *, hidden,
               mxu_bf16=False, gates_bf16=False):
    """Time-major grid step: ONE timestep, FULL batch, both directions.

    Grid is (T,) — the sequential step count matches the scan exactly
    (no batch blocking), while Pallas double-buffers the per-step
    (2, B, 4H) xw slice HBM->VMEM across grid steps. This is the
    cross-step xw double-buffering design docs/PERF.md's speed-of-light
    analysis calls for: weights + h/c state stay VMEM-resident for the
    whole sequence, and the only HBM traffic per step is the xw stream
    in (+ the h stream out)."""
    H = hidden

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    # directions sequential (not stacked) so the (B, 4H) gates temporary
    # exists once, not twice — keeps the scoped-VMEM footprint under the
    # 16 MB limit at full batch
    for d in range(2):
        # mxu_bf16: recurrent matmul at the MXU's bf16 rate (4x f32);
        # h is quantized to bf16 ONLY as the matmul input — the f32
        # h/c recurrence state in scratch is untouched, so quantization
        # error enters per-step through the gate pre-activations (same
        # channel as the bf16 xw stream) and does not compound in c
        h_in = h_scr[d].astype(jnp.bfloat16) if mxu_bf16 else h_scr[d]
        gates = xw_ref[0, d].astype(jnp.float32) + jnp.dot(
            h_in, whh_ref[d], preferred_element_type=jnp.float32
        )
        if gates_bf16:
            # SE_PALLAS_GATES_BF16: run the 4 sigmoid/tanh passes (the
            # kernel's VPU share) on bf16 values; the c recurrence stays
            # f32 — same quantization channel as the bf16 xw stream.
            # sigmoid spelled via tanh: Mosaic's bf16 `logistic` lowering
            # is broken in this jax (f32->bf16 vector.broadcast verify
            # error); bf16 tanh lowers fine.
            gates = gates.astype(jnp.bfloat16)
            half = jnp.bfloat16(0.5)
            sig = lambda t: jnp.tanh(t * half) * half + half  # noqa: E731
        else:
            sig = jax.nn.sigmoid
        i_g = sig(gates[..., :H])
        f_g = sig(gates[..., H : 2 * H])
        g_g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o_g = sig(gates[..., 3 * H :])
        c = (
            f_g.astype(jnp.float32) * c_scr[d]
            + (i_g * g_g).astype(jnp.float32)
        )
        h = o_g.astype(jnp.float32) * jnp.tanh(c)
        c_scr[d] = c
        h_scr[d] = h
        hs_ref[0, d] = h.astype(hs_ref.dtype)


def lstm_bidir_pallas_tm(
    xw: jnp.ndarray,      # (2, B, T, 4H) input projections (+biases)
    w_hh_t: jnp.ndarray,  # (2, H, 4H)
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Time-major full-batch variant; returns (2, B, T, H) as f32.

    Unlike :func:`lstm_bidir_pallas` (grid over batch blocks x time
    chunks), the grid here is purely over time with the WHOLE batch per
    step, so the sequential step count equals the scan's. ``xw`` streams
    in its own dtype (pass bf16 to halve the dominant HBM stream).
    ``SE_PALLAS_HS_BF16=1`` stores the hidden-state OUTPUT stream in bf16
    too (the recurrence itself stays f32 in VMEM) — same numerics budget
    as the bf16 xw stream, and shaves the output block's VMEM share.
    ``SE_PALLAS_MXU_BF16=1`` additionally runs the recurrent matmul at
    the MXU's bf16 rate (bf16 W_hh + bf16-cast h input, f32 accumulate;
    the h/c recurrence state stays f32)."""
    import os

    if out_dtype is None:
        out_dtype = (
            jnp.bfloat16
            if os.environ.get("SE_PALLAS_HS_BF16", "0") == "1"
            else jnp.float32
        )
    mxu_bf16 = os.environ.get("SE_PALLAS_MXU_BF16", "0") == "1"
    gates_bf16 = os.environ.get("SE_PALLAS_GATES_BF16", "0") == "1"
    d2, B, T, h4 = xw.shape
    H = h4 // 4
    assert d2 == 2 and w_hh_t.shape == (2, H, h4)

    whh_dt = jnp.bfloat16 if mxu_bf16 else jnp.float32
    xw_tm = jnp.moveaxis(xw, 2, 0)  # (T, 2, B, 4H)
    out = pl.pallas_call(
        functools.partial(_kernel_tm, hidden=H, mxu_bf16=mxu_bf16,
                          gates_bf16=gates_bf16),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 2, B, h4), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, h4), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, B, H), lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 2, B, H), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_tm, w_hh_t.astype(whh_dt))
    return jnp.moveaxis(out, 0, 2).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Differentiable time-major kernel (custom VJP): forward additionally
# records the cell-state sequence; backward is a REVERSE-time-major grid
# that recomputes the gates from (xw_t, h_{t-1}) — one extra MXU matmul
# per step instead of storing the (T, 2, B, 4H) gate tensor — and keeps
# the recurrent cotangents (dh, dc) plus the dW_hh accumulator
# VMEM-resident for the whole sequence. This makes SE_PALLAS_LSTM=1
# usable under jax.grad (training), not just for inference.
# ---------------------------------------------------------------------------


def _kernel_tm_fc(xw_ref, whh_ref, hs_ref, cs_ref, h_scr, c_scr, *, hidden):
    """Forward step that also streams out the cell states (residuals for
    the backward kernel). The recurrence state in scratch is always f32;
    the residual STREAMS follow the refs' dtype (bf16 under
    ``SE_PALLAS_VJP_BF16=1``, f32 otherwise)."""
    H = hidden

    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    for d in range(2):
        gates = xw_ref[0, d].astype(jnp.float32) + jnp.dot(
            h_scr[d], whh_ref[d], preferred_element_type=jnp.float32
        )
        i_g = jax.nn.sigmoid(gates[..., :H])
        f_g = jax.nn.sigmoid(gates[..., H : 2 * H])
        g_g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o_g = jax.nn.sigmoid(gates[..., 3 * H :])
        c = f_g * c_scr[d] + i_g * g_g
        h = o_g * jnp.tanh(c)
        c_scr[d] = c
        h_scr[d] = h
        hs_ref[0, d] = h.astype(hs_ref.dtype)
        cs_ref[0, d] = c.astype(cs_ref.dtype)


def _kernel_tm_bwd(xw_ref, whh_ref, hsp_ref, csp_ref, cs_ref, dhs_ref,
                   dxw_ref, dwhh_ref, dh_scr, dc_scr, *, hidden, seq_len):
    """One REVERSE-time step: grid index t visits time tt = T-1-t.

    Inputs at tt: xw_t, c_t, dh_out_t, plus the PREVIOUS timestep's
    h_{tt-1} / c_{tt-1} (same hs/cs arrays passed again under an
    index map clamped at 0; masked to the zero initial state at tt=0).
    The gate pre-activations are recomputed from (xw_t, h_{t-1}) so no
    gate tensor is ever materialized in HBM. dW_hh accumulates directly
    in its VMEM-resident output block (constant index map)."""
    H = hidden
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)
        dwhh_ref[...] = jnp.zeros_like(dwhh_ref)

    # tt == 0 <=> last grid step: the "previous" blocks alias index 0 —
    # mask them to the true zero initial state
    first_t = (t == seq_len - 1)

    for d in range(2):
        h_prev = jnp.where(first_t, 0.0, hsp_ref[0, d].astype(jnp.float32))
        c_prev = jnp.where(first_t, 0.0, csp_ref[0, d].astype(jnp.float32))
        # whh may stream bf16 under SE_PALLAS_VJP_BF16 — cast the matmul
        # inputs to its dtype (f32 path unchanged; bf16 path quantizes
        # through the same gate-recompute channel as the residuals)
        gates = xw_ref[0, d].astype(jnp.float32) + jnp.dot(
            h_prev.astype(whh_ref.dtype), whh_ref[d],
            preferred_element_type=jnp.float32,
        )
        i_g = jax.nn.sigmoid(gates[..., :H])
        f_g = jax.nn.sigmoid(gates[..., H : 2 * H])
        g_g = jnp.tanh(gates[..., 2 * H : 3 * H])
        o_g = jax.nn.sigmoid(gates[..., 3 * H :])
        tc = jnp.tanh(cs_ref[0, d].astype(jnp.float32))

        dh = dhs_ref[0, d].astype(jnp.float32) + dh_scr[d]
        do = dh * tc
        dct = dh * o_g * (1.0 - tc * tc) + dc_scr[d]
        di = dct * g_g
        df = dct * c_prev
        dg = dct * i_g
        dc_scr[d] = dct * f_g

        da = jnp.concatenate(
            [
                di * i_g * (1.0 - i_g),
                df * f_g * (1.0 - f_g),
                dg * (1.0 - g_g * g_g),
                do * o_g * (1.0 - o_g),
            ],
            axis=-1,
        )  # (B, 4H)
        dxw_ref[0, d] = da.astype(dxw_ref.dtype)
        # dh_{t-1} = da @ W_hh^T  (whh_ref[d] is (H, 4H) = W_hh^T)
        dh_scr[d] = jax.lax.dot_general(
            da.astype(whh_ref.dtype), whh_ref[d], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # dW_hh^T accumulation: h_{t-1}^T @ da -> (H, 4H)
        dwhh_ref[d] += jax.lax.dot_general(
            h_prev, da, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _vjp_stream_dtype():
    """Residual-stream dtype for the differentiable kernel.

    ``SE_PALLAS_VJP_BF16=1`` stores the forward's h/c residual streams —
    and the incoming dh cotangent stream — in bf16. The backward kernel
    recomputes gates from these residuals, so the quantization enters
    through the same channel the (default-on) bf16 xw stream already
    uses; the recurrent cotangent state itself stays f32 in VMEM. Halves
    four of the six per-step HBM streams and their double-buffered VMEM
    blocks, which is what raises the batch ceiling past B=256."""
    import os

    return (
        jnp.bfloat16
        if os.environ.get("SE_PALLAS_VJP_BF16", "0") == "1"
        else jnp.float32
    )


def _tm_fwd_with_cell(xw_tm, whh, interpret):
    T, d2, B, h4 = xw_tm.shape
    H = h4 // 4
    res_dt = _vjp_stream_dtype()
    return pl.pallas_call(
        functools.partial(_kernel_tm_fc, hidden=H),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 2, B, h4), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, h4), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, B, H), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, H), lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, 2, B, H), res_dt),
            jax.ShapeDtypeStruct((T, 2, B, H), res_dt),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_tm, whh)


def _tm_bwd(xw_tm, whh, hs_tm, cs_tm, dhs_tm, interpret):
    T, d2, B, h4 = xw_tm.shape
    H = h4 // 4
    # under SE_PALLAS_VJP_BF16 the recurrent weights also stream bf16 in
    # the backward (the dW_hh output accumulator stays f32): shaves the
    # constant whh block's VMEM share — part of what fits B=384
    whh = whh.astype(_vjp_stream_dtype())
    rev = lambda t: (T - 1 - t, 0, 0, 0)            # noqa: E731
    rev_prev = lambda t: (jnp.maximum(T - 2 - t, 0), 0, 0, 0)  # noqa: E731
    dxw, dwhh = pl.pallas_call(
        functools.partial(_kernel_tm_bwd, hidden=H, seq_len=T),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 2, B, h4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, h4), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, H), rev_prev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, B, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, B, h4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, H, h4), lambda t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            # dxw streams out in xw's own dtype: the VJP previously cast
            # f32->bf16 right after the kernel anyway (one rounding either
            # way), so emitting bf16 directly is numerically identical and
            # halves the largest double-buffered VMEM block + HBM stream
            jax.ShapeDtypeStruct((T, 2, B, h4), xw_tm.dtype),
            jax.ShapeDtypeStruct((2, H, h4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, B, H), jnp.float32),
            pltpu.VMEM((2, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw_tm, whh, hs_tm, cs_tm, cs_tm, dhs_tm)
    return dxw, dwhh


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def lstm_bidir_tm(xw, w_hh_t, interpret=False):
    """Differentiable time-major bidirectional recurrence.

    Primal (no grad requested) runs the plain forward kernel, so the
    inference path is byte-identical to :func:`lstm_bidir_pallas_tm`
    (including its env-tuned output dtype). Under ``jax.grad`` the
    forward additionally records cell states and the backward runs
    :func:`_kernel_tm_bwd`. Returns (2, B, T, H) f32."""
    return lstm_bidir_pallas_tm(xw, w_hh_t, interpret=interpret)


def _lstm_bidir_tm_fwd(xw, w_hh_t, interpret):
    whh = w_hh_t.astype(jnp.float32)
    xw_tm = jnp.moveaxis(xw, 2, 0)  # (T, 2, B, 4H)
    hs_tm, cs_tm = _tm_fwd_with_cell(xw_tm, whh, interpret)
    return (
        jnp.moveaxis(hs_tm, 0, 2).astype(jnp.float32),
        (xw_tm, whh, hs_tm, cs_tm),
    )


def _lstm_bidir_tm_bwd(interpret, res, dout):
    xw_tm, whh, hs_tm, cs_tm = res
    # cotangent arrives (2, B, T, H); previous-step h/c blocks are the
    # same hs/cs arrays under a clamped reverse index map. Under
    # SE_PALLAS_VJP_BF16 the dh stream is quantized like the residuals.
    dhs_tm = jnp.moveaxis(dout, 2, 0).astype(hs_tm.dtype)
    dxw_tm, dwhh = _tm_bwd(xw_tm, whh, hs_tm, cs_tm, dhs_tm, interpret)
    dxw = jnp.moveaxis(dxw_tm, 0, 2)
    return dxw, dwhh


lstm_bidir_tm.defvjp(_lstm_bidir_tm_fwd, _lstm_bidir_tm_bwd)


# ---------------------------------------------------------------------------
# Kernel under a device mesh (shard_map). GSPMD treats the Mosaic custom
# call as opaque, so simply jitting the kernel with mesh shardings
# replicates it (round-2 finding). Instead the mesh path calls the kernel
# per device inside an explicit ``jax.shard_map``: the batch dimension is
# sharded over the data axes, the (small) recurrent weights are passed
# replicated, and the custom VJP wraps the shard_maps — forward runs the
# residual-recording kernel on each device's batch shard, backward runs
# the reverse-time kernel per device and sums the per-device dW_hh
# partials (the gradient all-reduce, expressed as a stacked out-spec +
# sum so no replication assumptions ride on ``check_vma=False``).
#
# Tensor-parallel gate sharding (mesh 'model' > 1) is NOT supported here:
# a 'model'-sharded W_hh would have to be gathered into every kernel
# instance, defeating the sharding — those runs keep the scan recurrence
# (parallel/mesh.py documents the rule).
#
# The context plumbing lets models/lstm.py discover AT TRACE TIME that it
# is being traced for a mesh step (parallel/mesh.py wraps each jitted
# step call in ``shard_context``), without threading a Mesh through flax
# module attributes.
# ---------------------------------------------------------------------------

_SHARD_CTX: list = []


class shard_context:
    """Context manager marking 'tracing happens for a mesh step': while
    active, LSTMStack routes the time-major kernel through
    :func:`lstm_bidir_tm_sharded` with this mesh/axes."""

    def __init__(self, mesh, axes):
        self.entry = (mesh, tuple(axes))

    def __enter__(self):
        _SHARD_CTX.append(self.entry)
        return self

    def __exit__(self, *exc):
        _SHARD_CTX.pop()
        return False


def current_shard_context():
    return _SHARD_CTX[-1] if _SHARD_CTX else None


@functools.lru_cache(maxsize=None)
def _make_sharded_tm(mesh, axes, interpret):
    """Build (and cache per (mesh, axes, interpret)) the custom-VJP
    function running the time-major kernel per device under shard_map."""
    from jax.sharding import PartitionSpec as P

    ax = axes if len(axes) > 1 else axes[0]
    spec_bm = P(None, ax, None, None)   # batch-major (2, B, T, ...)
    spec_tm = P(None, None, ax, None)   # time-major (T, 2, B, H) residuals
    rep3 = P(None, None, None)
    sm = functools.partial(jax.shard_map, mesh=mesh, check_vma=False)

    prim_f = sm(
        lambda a, w: lstm_bidir_pallas_tm(a, w, interpret=interpret),
        in_specs=(spec_bm, rep3), out_specs=spec_bm,
    )

    def _fwd_body(a, w):
        a_tm = jnp.moveaxis(a, 2, 0)
        hs_tm, cs_tm = _tm_fwd_with_cell(a_tm, w, interpret)
        return jnp.moveaxis(hs_tm, 0, 2).astype(jnp.float32), hs_tm, cs_tm

    fwd_f = sm(_fwd_body, in_specs=(spec_bm, rep3),
               out_specs=(spec_bm, spec_tm, spec_tm))

    def _bwd_body(a, w, hs_tm, cs_tm, dout):
        a_tm = jnp.moveaxis(a, 2, 0)
        # _lstm_bidir_tm_bwd takes the batch-major cotangent and returns
        # batch-major dxw; dW_hh comes back as this device's partial sum
        dxw, dwhh = _lstm_bidir_tm_bwd(
            interpret, (a_tm, w, hs_tm, cs_tm), dout)
        return dxw, dwhh[None]

    bwd_f = sm(_bwd_body,
               in_specs=(spec_bm, rep3, spec_tm, spec_tm, spec_bm),
               out_specs=(spec_bm, P(ax, None, None, None)))

    @jax.custom_vjp
    def f(a, w):
        return prim_f(a, w)

    def f_fwd(a, w):
        w32 = w.astype(jnp.float32)
        out, hs_tm, cs_tm = fwd_f(a, w32)
        return out, (a, w32, hs_tm, cs_tm)

    def f_bwd(res, dout):
        a, w, hs_tm, cs_tm = res
        dxw, dwhh_parts = bwd_f(a, w, hs_tm, cs_tm, dout)
        # the cross-device gradient reduction: per-device partials ride a
        # stacked leading axis; summing it is GSPMD's all-reduce
        return dxw, dwhh_parts.sum(0)

    f.defvjp(f_fwd, f_bwd)
    return f


def lstm_bidir_tm_sharded(xw, w_hh_t, mesh, axes, interpret=False):
    """Time-major bidirectional recurrence, batch-sharded over ``axes``
    of ``mesh``: each device runs the Pallas kernel on its own batch
    shard. Differentiable (per-device reverse-time backward kernel +
    dW_hh reduction). Numerics match :func:`lstm_bidir_tm` — forward
    bit-exact, gradients to f32 epsilon (dW_hh partials reassociate).

    Falls back to the unsharded kernel when the batch doesn't divide the
    device count (GSPMD will then replicate the custom call — announced)."""
    import warnings

    n = 1
    for a in axes:
        n *= mesh.shape[a]
    if xw.shape[1] % n != 0:
        warnings.warn(
            f"[pallas] batch {xw.shape[1]} not divisible by {n} mesh "
            f"devices: kernel runs unsharded (replicated by GSPMD)"
        )
        return lstm_bidir_tm(xw, w_hh_t, interpret)
    return _make_sharded_tm(mesh, tuple(axes), bool(interpret))(
        xw, w_hh_t.astype(jnp.float32))


def lstm_bidir_pallas(
    xw: jnp.ndarray,      # (2, B, T, 4H) input projections (+biases)
    w_hh_t: jnp.ndarray,  # (2, H, 4H)
    chunk: int = None,
    batch_block: int = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns hidden states (2, B, T, H).

    ``xw`` streams HBM->VMEM in ITS OWN dtype — pass bf16 to halve the
    dominant HBM stream (the kernel accumulates gates in f32 either way).

    VMEM budget per grid step: xw block 2*BB*chunk*4H + out block
    2*BB*chunk*H + weights 2*H*4H + state 2*2*BB*H floats, double-buffered
    by the pipeline — defaults stay well under the 16 MB scoped limit for
    H <= 512."""
    import os

    if chunk is None:
        chunk = int(os.environ.get("SE_PALLAS_CHUNK", "8"))
    if batch_block is None:
        batch_block = int(os.environ.get("SE_PALLAS_BB", "32"))
    d2, B, T, h4 = xw.shape
    H = h4 // 4
    assert d2 == 2 and w_hh_t.shape == (2, H, h4)

    bb = min(batch_block, B)
    pad_b = (-B) % bb
    pad_t = (-T) % chunk
    if pad_b or pad_t:
        xw = jnp.pad(xw, ((0, 0), (0, pad_b), (0, pad_t), (0, 0)))
    Bp, Tp = B + pad_b, T + pad_t

    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, hidden=H),
        grid=(Bp // bb, Tp // chunk),
        in_specs=[
            pl.BlockSpec(
                (2, bb, chunk, h4), lambda b, t: (0, b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, H, h4), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (2, bb, chunk, H), lambda b, t: (0, b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((2, Bp, Tp, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, bb, H), jnp.float32),
            pltpu.VMEM((2, bb, H), jnp.float32),
        ],
        interpret=interpret,
    )(xw, w_hh_t.astype(jnp.float32))
    return out[:, :B, :T, :]
