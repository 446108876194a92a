"""Pallas TPU flash attention with in-kernel salted-hash dropout.

The round-4 device trace of the Mockingjay joint-finetune step (the
reference's config-4 workload, dropout live) showed the query-chunked
attention path costing 63% of the 472 ms step — 6 forward chunk loops at
35 ms/layer + 6 backward at 14.5 ms — against ~3% of the step's FLOPs:
each chunk materializes its (B, N, chunk, T) logits tensor in HBM and
softmax/mask/AV re-traverse it, so the stage is bandwidth-bound at ~1%
MXU efficiency (scripts/profile_step.py, docs/PERF.md round-4 trace).

This kernel keeps the whole probability pipeline in VMEM:

- grid (B, N, T/block_q), executed sequentially per TPU core; each
  program holds one query block plus the FULL key/value rows (T<=~4k at
  D=64 fits VMEM comfortably — speech frames, not LLM contexts), so a
  plain in-VMEM softmax replaces online-softmax bookkeeping;
- attention-probability dropout is a salted integer-hash mask computed
  from (batch*head, query, key) indices INSIDE the kernel — the same
  no-bits-in-HBM contract as models/transformer.py::hash_dropout, a
  different (equally valid) Bernoulli stream;
- differentiable via a custom VJP whose backward is a second kernel
  that recomputes probabilities per query block from q/k plus the saved
  logsumexp and re-derives the dropout mask from the 8-byte salt: no
  (T, T)-shaped tensor ever exists in HBM in either direction. dk/dv
  accumulate across query blocks in the output refs (TPU pallas grids
  run sequentially, the same property the LSTM kernel relies on);
- an optional additive key bias (B, T) carries the padded-frame
  attention mask (the (B, 1, 1, T) broadcast shape every call site
  uses).

The round-3 rejection of the stock `jax.experimental` flash kernel
(no dropout support, block_q > T failures on shape-inference dummy
calls, bias-tensor padding) does not apply here: this kernel pads and
masks internally, accepts any T, and exists precisely because the
dropout-live path IS the measured bottleneck.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# plain ints: jnp scalars would be closure-captured arrays, which
# pallas kernels reject ("captures constants")
_PHI1 = 2654435761
_PHI2 = 2246822519
_PHI3 = 3266489917
_PHI4 = 40503


def _dropout_mask(bn, q0, bq, T, salt_ref, rate):
    """Bernoulli(1-rate) keep mask (bq, T) from a salted avalanche hash
    of (batch*head, global query index, key index). Bitwise-identical
    between the forward and backward kernels (same inputs, same math)."""
    salt = jax.lax.bitcast_convert_type(salt_ref[0], jnp.uint32)  # (2,)
    # program-id scalars arrive int32: cast BEFORE mixing — i32 + u32
    # promotes through int64 (clamped under disabled x64) and the
    # sign-extending shifts then fail the unsigned threshold compare
    q0 = jnp.asarray(q0).astype(jnp.uint32)
    bn = jnp.asarray(bn).astype(jnp.uint32)
    qi = q0 + jax.lax.broadcasted_iota(jnp.uint32, (bq, T), 0)
    ki = jax.lax.broadcasted_iota(jnp.uint32, (bq, T), 1)
    h = (qi * jnp.uint32(_PHI1)) ^ (ki * jnp.uint32(_PHI2)) \
        ^ (bn * jnp.uint32(_PHI4)) ^ salt[0]
    h ^= h >> 16
    h *= jnp.uint32(_PHI3)
    h ^= h >> 13
    h ^= salt[1]
    h *= jnp.uint32(_PHI1)
    h ^= h >> 16
    keep = 1.0 - rate
    thresh = jnp.uint32(min(int(keep * 4294967296.0), 4294967295))
    return h < thresh


def _fwd_kernel(q_ref, k_ref, v_ref, salt_ref, kbias_ref, out_ref, lse_ref,
                *, scale, rate, t_valid, n_heads):
    bq = q_ref.shape[2]
    T = k_ref.shape[2]
    dt = q_ref.dtype
    b, n, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    q = q_ref[0, 0]                       # (bq, D)
    k = k_ref[0, 0]                       # (T, D)
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                             # (bq, T) f32, VMEM only
    logits += kbias_ref[0, 0][None, :]
    if t_valid < T:
        kmask = jax.lax.broadcasted_iota(jnp.int32, (bq, T), 1) < t_valid
        logits = jnp.where(kmask, logits, -jnp.inf)

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)               # (bq, T) f32
    s = jnp.sum(p, axis=-1, keepdims=True)
    lse_ref[0, 0, 0] = (m + jnp.log(s))[:, 0]
    p = p / s
    if rate > 0.0:
        keepm = _dropout_mask(
            b * n_heads + n, j * bq, bq, T, salt_ref, rate
        )
        p = jnp.where(keepm, p / (1.0 - rate), 0.0)
    out_ref[0, 0] = jax.lax.dot_general(
        p.astype(dt), v_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dt)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, out_ref, lse_ref, salt_ref,
                kbias_ref, dq_ref, dk_ref, dv_ref,
                *, scale, rate, t_valid, n_heads):
    bq = q_ref.shape[2]
    T = k_ref.shape[2]
    dt = q_ref.dtype
    b, n, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)

    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    logits += kbias_ref[0, 0][None, :]
    if t_valid < T:
        kmask = jax.lax.broadcasted_iota(jnp.int32, (bq, T), 1) < t_valid
        logits = jnp.where(kmask, logits, -jnp.inf)
    p = jnp.exp(logits - lse_ref[0, 0, 0][:, None])  # (bq, T); 0 at -inf

    if rate > 0.0:
        keep = 1.0 - rate
        keepm = _dropout_mask(
            b * n_heads + n, j * bq, bq, T, salt_ref, rate
        )
        p_drop = jnp.where(keepm, p / keep, 0.0)
    else:
        p_drop = p

    # dv += P_drop^T do ; dp = do v^T (masked) ; ds = P (dp - rowsum(do*o))
    dv_ref[0, 0] += jax.lax.dot_general(
        p_drop.astype(dt), do.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        do.astype(dt), v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if rate > 0.0:
        dp = jnp.where(keepm, dp / (1.0 - rate), 0.0)
    drow = jnp.sum(do * out_ref[0, 0].astype(jnp.float32), axis=-1,
                   keepdims=True)
    ds = p * (dp - drow) * scale          # (bq, T) f32
    ds_dt = ds.astype(dt)
    dq_ref[0, 0] = jax.lax.dot_general(
        ds_dt, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0, 0] += jax.lax.dot_general(
        ds_dt, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pad_t(x, tp):
    pad = tp - x.shape[2]
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x


def _geometry(T, block_q):
    """One padded length for the query AND key axes: bq divides it and it
    is lane/sublane friendly; keys past t_valid=T are masked in-kernel."""
    bq = min(block_q, 128 * -(-T // 128))
    tp = bq * -(-T // bq)
    return bq, tp


def _fwd_impl(q, k, v, salt_f, kbias, scale, rate, block_q, interpret):
    """(B, N, T, D) x3 -> out (B, N, T, D), lse (B, N, Tp) f32."""
    B, N, T, D = q.shape
    bq, Tp = _geometry(T, block_q)
    qp, kp, vp = _pad_t(q, Tp), _pad_t(k, Tp), _pad_t(v, Tp)
    kbp = jnp.pad(kbias, ((0, 0), (0, Tp - T)))[:, None]
    grid = (B, N, Tp // bq)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, rate=rate, t_valid=T, n_heads=N
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, n, j: (b, n, j, 0)),
            pl.BlockSpec((1, 1, Tp, D), lambda b, n, j: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Tp, D), lambda b, n, j: (b, n, 0, 0)),
            # (1, 1, Tp) / (1, 1, 1, bq) blocks: Mosaic requires the
            # last two block dims divisible by (8, 128) or equal to the
            # array dims — met here by making the second-minor dim 1
            pl.BlockSpec((1, 2), lambda b, n, j: (0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda b, n, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, n, j: (b, n, j, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda b, n, j: (b, n, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, N, 1, Tp), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, salt_f, kbp)
    return out[:, :, :T], lse


def _bwd_impl(q, k, v, salt_f, kbias, out, lse, do, scale, rate, block_q,
              interpret):
    B, N, T, D = q.shape
    bq, Tp = _geometry(T, block_q)
    qp, kp, vp = _pad_t(q, Tp), _pad_t(k, Tp), _pad_t(v, Tp)
    dop, outp = _pad_t(do, Tp), _pad_t(out, Tp)
    kbp = jnp.pad(kbias, ((0, 0), (0, Tp - T)))[:, None]
    grid = (B, N, Tp // bq)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, rate=rate, t_valid=T, n_heads=N
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, n, j: (b, n, j, 0)),
            pl.BlockSpec((1, 1, Tp, D), lambda b, n, j: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Tp, D), lambda b, n, j: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, n, j: (b, n, j, 0)),
            pl.BlockSpec((1, 1, bq, D), lambda b, n, j: (b, n, j, 0)),
            pl.BlockSpec((1, 1, 1, bq), lambda b, n, j: (b, n, 0, j)),
            pl.BlockSpec((1, 2), lambda b, n, j: (0, 0)),
            pl.BlockSpec((1, 1, Tp), lambda b, n, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, bq, D), lambda b, n, j: (b, n, j, 0)),
            pl.BlockSpec((1, 1, Tp, D), lambda b, n, j: (b, n, 0, 0)),
            pl.BlockSpec((1, 1, Tp, D), lambda b, n, j: (b, n, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, Tp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, Tp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, N, Tp, D), jnp.float32),
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, outp, lse, salt_f, kbp)
    return dq[:, :, :T], dk[:, :, :T], dv[:, :, :T]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_vjp(q, k, v, salt_f, kbias, scale, rate, block_q, interpret):
    out, _ = _fwd_impl(q, k, v, salt_f, kbias, scale, rate, block_q,
                       interpret)
    return out


def _flash_fwd(q, k, v, salt_f, kbias, scale, rate, block_q, interpret):
    out, lse = _fwd_impl(q, k, v, salt_f, kbias, scale, rate, block_q,
                         interpret)
    return out, (q, k, v, salt_f, kbias, out, lse)


def _flash_bwd(scale, rate, block_q, interpret, res, g):
    q, k, v, salt_f, kbias, out, lse = res
    dq, dk, dv = _bwd_impl(
        q, k, v, salt_f, kbias, out, lse, g, scale, rate, block_q,
        interpret,
    )
    return (
        dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
        jnp.zeros_like(salt_f), jnp.zeros_like(kbias),
    )


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q, k, v,
    scale: float,
    rate: float = 0.0,
    rng=None,
    kbias=None,
    block_q: int = 256,
    interpret: bool = False,
):
    """Flash attention over (B, T, N, D) tensors -> (B, T, N, D).

    rate > 0 applies salted-hash dropout to the attention probabilities
    (rng required); the mask is recomputed in the backward from the
    8-byte salt. ``kbias``: optional additive (B, T) f32 key bias (the
    padded-frame attention mask). Differentiable in q, k, v."""
    B, T, N, D = q.shape
    if rate > 0.0:
        assert rng is not None, "dropout needs an rng"
        salt = jax.random.bits(rng, (1, 2), jnp.uint32)
    else:
        salt = jnp.zeros((1, 2), jnp.uint32)
    salt_f = jax.lax.bitcast_convert_type(salt, jnp.float32)
    if kbias is None:
        kbias = jnp.zeros((B, T), jnp.float32)
    # kernel layout: (B, N, T, D)
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    out = _flash_vjp(
        qt, kt, vt, salt_f, kbias.astype(jnp.float32),
        float(scale), float(rate), int(block_q), bool(interpret),
    )
    return jnp.swapaxes(out, 1, 2)
