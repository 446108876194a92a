"""Pallas TPU flash attention with in-kernel salted-hash dropout.

The round-4 device trace of the Mockingjay joint-finetune step (the
reference's config-4 workload, dropout live) showed the query-chunked
attention path costing 63% of the 472 ms step — each chunk materializes
its (B, N, chunk, T) logits tensor in HBM and softmax/mask/AV re-traverse
it (scripts/profile_step.py, docs/PERF.md round-4 trace). The first flash
kernel (round 4) deleted that stream: the whole probability pipeline
stays in VMEM and no (T, T)-shaped tensor ever exists in HBM in either
direction.

Round 5 rebuilt the kernel LAYOUT-NATIVE after a second trace showed the
v1 calling convention itself costing ~48 ms of the 300 ms step: v1 wanted
(B, N, T, D) arrays padded to T=1024, so every layer paid pad + transpose
fusions on the way in and slice + transpose (+ f32->bf16 converts of
dq/dk/dv) on the way out — pure HBM data movement exceeding the forward
kernels' own time. This version consumes the projection layout directly
and moves every per-(T,T)-element pass it can onto O(T) operands:

- q/k/v arrive as (B, T, N*D) — exactly what the fused QKV matmul
  produces (models/transformer.py SelfAttention) up to a free reshape.
  No transpose, no padding pass: T stays ragged and the kernel masks.
- heads ride the lane axis in groups: each program owns P heads where
  P*D = a multiple of 128 lanes (P=2 at the TERA geometry D=64), grid
  (B, N/P, T/bq) with the query-block axis innermost so K/V blocks stay
  VMEM-resident across it.
- softmax scale is folded into the (bq, D) query block, normalization
  (1/s) and the dropout keep-rescale into the (bq, D) output block —
  three full (bq, T) VPU passes from v1 become O(bq*D) ones. The kernel
  is VPU-bound (softmax exp + hash), not MXU-bound, so eliding (bq, T)
  passes is worth more than matmul tuning.
- attention-probability dropout is a salted integer-hash mask computed
  from (batch*head, query, key) indices INSIDE the kernel — the same
  no-bits-in-HBM contract as models/transformer.py::hash_dropout, a
  different (equally valid) Bernoulli stream; bit-identical between
  forward and the recomputing backward (same indices, same math).
- the backward recomputes probabilities from q/k plus the saved
  logsumexp, accumulates dk/dv across query blocks in f32 VMEM scratch,
  and emits dq/dk/dv in the INPUT dtype — v1 wrote them f32 to HBM and
  cast+transposed them afterwards (three 196 MB streams at the bench
  shape); here the final cast happens in VMEM on flush.
- an optional additive key bias (B, T) carries the padded-frame
  attention mask (the (B, 1, 1, T) broadcast every call site uses).

Ragged-T handling: keys/queries past ``t_valid`` are masked in-kernel
(keys to -inf before softmax; invalid QUERY rows are forced to zero
logits so every intermediate stays finite, their outputs land in the
clipped region of the ragged last block, and the backward zeroes their
do rows so dk/dv see no garbage).

Measured (B=64, 10 s, bf16, Mockingjay joint finetune, docs/PERF.md):
chunked-hash 1,348x -> v1 flash 2,106x -> layout-native 2,6xx x.
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
    between the forward and backward kernels (same inputs, same math),
    and independent of the head-grouping/block geometry (it only sees
    absolute head and position indices)."""
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


def _heads_per_program(n_heads: int, head_dim: int, interpret: bool) -> int:
    """Smallest P with N % P == 0 and (P*D) % 128 == 0 (TPU lane rule);
    in interpret mode any grouping is legal, fall back to all heads."""
    for p in range(1, n_heads + 1):
        if n_heads % p == 0 and (p * head_dim) % 128 == 0:
            return p
    if interpret:
        return n_heads
    raise ValueError(
        f"flash kernel needs head grouping with P*D % 128 == 0; "
        f"got N={n_heads}, D={head_dim}"
    )


def _fwd_kernel(q_ref, k_ref, v_ref, salt_ref, b0_ref, kbias_ref, out_ref,
                lse_ref, *, scale, rate, t_valid, n_heads, hpp, head_dim,
                bq):
    Tk = k_ref.shape[1]
    dt = q_ref.dtype
    b, n2, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    b = b + b0_ref[0, 0]   # global batch index under data-parallel shards

    kb = kbias_ref[0, 0][None, :]                      # (1, Tk) f32
    ki_ok = jax.lax.broadcasted_iota(jnp.int32, (bq, Tk), 1) < t_valid
    qi_ok = (
        j * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, Tk), 0)
    ) < t_valid
    # rows past t_valid are unspecified memory (ragged blocks): the
    # logits get masked below, but V must be zeroed explicitly — its
    # garbage rows meet p's exact zeros in the AV matmul and 0*NaN=NaN
    krow_ok = jax.lax.broadcasted_iota(jnp.int32, (Tk, 1), 0) < t_valid
    vz = jnp.where(krow_ok, v_ref[0], 0)               # (Tk, P*D)
    # scale folded into the (bq, P*D) query block: one O(bq*D) multiply
    # replaces v1's O(bq*T) logits pass
    qs = q_ref[0] * jnp.asarray(scale, dt)             # (bq, P*D)
    keep = 1.0 - rate

    for h in range(hpp):
        lo = h * head_dim
        q = qs[:, lo:lo + head_dim]                    # (bq, D)
        k = k_ref[0][:, lo:lo + head_dim]              # (Tk, D)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                              # (bq, Tk) f32
        # invalid keys -> -inf (invisible); invalid QUERY rows -> all-0
        # logits (finite softmax; their out rows fall in the ragged
        # clipped region, the backward re-derives the same rows)
        logits = jnp.where(qi_ok, jnp.where(ki_ok, logits + kb, -jnp.inf),
                           0.0)
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)                        # (bq, Tk) f32
        s = jnp.sum(p, axis=-1, keepdims=True)
        lse_ref[0, 0, h, pl.ds(j * bq, bq)] = (m + jnp.log(s))[:, 0]
        if rate > 0.0:
            keepm = _dropout_mask(
                b * n_heads + (n2 * hpp + h), j * bq, bq, Tk, salt_ref, rate
            )
            p = jnp.where(keepm, p, 0.0)
        # normalization and the dropout keep-rescale ride the (bq, D)
        # output block instead of two more (bq, Tk) passes
        ctx = jax.lax.dot_general(
            p.astype(dt), vz[:, lo:lo + head_dim],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (1.0 / (s * keep))
        out_ref[0, :, lo:lo + head_dim] = ctx.astype(dt)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, out_ref, lse_ref, salt_ref,
                b0_ref, kbias_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc,
                *, scale, rate, t_valid, n_heads, hpp, head_dim, bq, nj):
    Tk = k_ref.shape[1]
    dt = q_ref.dtype
    b, n2, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    b = b + b0_ref[0, 0]   # same global index -> same mask as forward

    @pl.when(j == 0)
    def _():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    kb = kbias_ref[0, 0][None, :]
    ki_ok = jax.lax.broadcasted_iota(jnp.int32, (bq, Tk), 1) < t_valid
    qrow = j * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    q_row_ok = qrow < t_valid                          # (bq, 1)
    qi_ok = jnp.broadcast_to(q_row_ok, (bq, Tk))
    krow_ok = jax.lax.broadcasted_iota(jnp.int32, (Tk, 1), 0) < t_valid
    keep = 1.0 - rate
    # rows past t_valid in ANY ragged block are unspecified memory: the
    # matmuls pair them with exact zeros and 0*NaN=NaN, so sanitize all
    # five operand blocks on load (O(T*D) selects, not O(T^2)). do is
    # also where the 1/keep dropout rescale folds in.
    qs = jnp.where(q_row_ok, q_ref[0] * jnp.asarray(scale, dt), 0)
    kz = jnp.where(krow_ok, k_ref[0], 0)
    vz = jnp.where(krow_ok, v_ref[0], 0)
    oz = jnp.where(q_row_ok, out_ref[0].astype(jnp.float32), 0.0)
    do = jnp.where(q_row_ok, do_ref[0].astype(jnp.float32) / keep, 0.0)

    for h in range(hpp):
        lo = h * head_dim
        q = qs[:, lo:lo + head_dim]                    # scale folded in
        k = kz[:, lo:lo + head_dim]
        v = vz[:, lo:lo + head_dim]
        do_h = do[:, lo:lo + head_dim]                 # (bq, D) f32
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(qi_ok, jnp.where(ki_ok, logits + kb, -jnp.inf),
                           0.0)
        lse = lse_ref[0, 0, h, pl.ds(j * bq, bq)][:, None]
        p = jnp.exp(logits - lse)                      # normalized probs

        if rate > 0.0:
            keepm = _dropout_mask(
                b * n_heads + (n2 * hpp + h), j * bq, bq, Tk, salt_ref, rate
            )
            pd = jnp.where(keepm, p, 0.0)
        else:
            pd = p

        # dv += P_drop^T (do_raw/keep) ; dp̂ = masked (do_raw/keep) v^T ;
        # ds = P (dp̂ - rowsum(do_raw·out)): do arrived pre-divided by
        # keep, so rowsum(do_raw·out) = keep·rowsum(do·out). The softmax
        # scale rides the (already scaled) q operand into dk and the
        # scaled k operand into dq — no (bq, Tk)-sized scale pass.
        dv_acc[:, lo:lo + head_dim] += jax.lax.dot_general(
            pd.astype(dt), do_h.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = jax.lax.dot_general(
            do_h.astype(dt), v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if rate > 0.0:
            dp = jnp.where(keepm, dp, 0.0)
        o_h = oz[:, lo:lo + head_dim]
        drow = keep * jnp.sum(do_h * o_h, axis=-1, keepdims=True)
        ds = (p * (dp - drow)).astype(dt)
        dq_ref[0, :, lo:lo + head_dim] = jax.lax.dot_general(
            ds, k * jnp.asarray(scale, dt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dt)
        dk_acc[:, lo:lo + head_dim] += jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(j == nj - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dt)
        dv_ref[0] = dv_acc[...].astype(dt)


def _geometry(T: int, block_q: int):
    """Tk: key rows per block, 128-aligned (lane rule for the kbias
    block and sublane rule for k/v); bq <= Tk, 128-aligned; nj covers
    Tk so the lse lane writes never leave the block."""
    Tk = 128 * -(-T // 128)
    bq = max(128, min(block_q, Tk))
    bq -= bq % 128
    nj = -(-Tk // bq)
    return bq, Tk, nj


def _fwd_impl(q, k, v, salt_f, b0, kbias, scale, rate, block_q, interpret,
              n_heads, head_dim):
    """(B, T, N*D) x3 -> out (B, T, N*D), lse (B, N/P, P, nj*bq) f32."""
    B, T, H = q.shape
    bq, Tk, nj = _geometry(T, block_q)
    P = _heads_per_program(n_heads, head_dim, interpret)
    PD = P * head_dim
    kbp = jnp.pad(kbias, ((0, 0), (0, Tk - T)))[:, None]   # (B, 1, Tk)
    grid = (B, n_heads // P, nj)
    kernel = functools.partial(
        _fwd_kernel, scale=scale, rate=rate, t_valid=T, n_heads=n_heads,
        hpp=P, head_dim=head_dim, bq=bq,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, PD), lambda b, n, j: (b, j, n)),
            pl.BlockSpec((1, Tk, PD), lambda b, n, j: (b, 0, n)),
            pl.BlockSpec((1, Tk, PD), lambda b, n, j: (b, 0, n)),
            pl.BlockSpec((1, 2), lambda b, n, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda b, n, j: (0, 0)),
            pl.BlockSpec((1, 1, Tk), lambda b, n, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, PD), lambda b, n, j: (b, j, n)),
            pl.BlockSpec((1, 1, P, nj * bq), lambda b, n, j: (b, n, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), q.dtype),
            jax.ShapeDtypeStruct((B, n_heads // P, P, nj * bq),
                                 jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, salt_f, b0, kbp)
    return out, lse


def _bwd_impl(q, k, v, salt_f, b0, kbias, out, lse, do, scale, rate,
              block_q, interpret, n_heads, head_dim):
    B, T, H = q.shape
    bq, Tk, nj = _geometry(T, block_q)
    P = _heads_per_program(n_heads, head_dim, interpret)
    PD = P * head_dim
    kbp = jnp.pad(kbias, ((0, 0), (0, Tk - T)))[:, None]
    grid = (B, n_heads // P, nj)
    kernel = functools.partial(
        _bwd_kernel, scale=scale, rate=rate, t_valid=T, n_heads=n_heads,
        hpp=P, head_dim=head_dim, bq=bq, nj=nj,
    )
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, PD), lambda b, n, j: (b, j, n)),
            pl.BlockSpec((1, Tk, PD), lambda b, n, j: (b, 0, n)),
            pl.BlockSpec((1, Tk, PD), lambda b, n, j: (b, 0, n)),
            pl.BlockSpec((1, bq, PD), lambda b, n, j: (b, j, n)),
            pl.BlockSpec((1, bq, PD), lambda b, n, j: (b, j, n)),
            pl.BlockSpec((1, 1, P, nj * bq), lambda b, n, j: (b, n, 0, 0)),
            pl.BlockSpec((1, 2), lambda b, n, j: (0, 0)),
            pl.BlockSpec((1, 1), lambda b, n, j: (0, 0)),
            pl.BlockSpec((1, 1, Tk), lambda b, n, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, PD), lambda b, n, j: (b, j, n)),
            pl.BlockSpec((1, Tk, PD), lambda b, n, j: (b, 0, n)),
            pl.BlockSpec((1, Tk, PD), lambda b, n, j: (b, 0, n)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T, H), q.dtype),
            jax.ShapeDtypeStruct((B, T, H), k.dtype),
            jax.ShapeDtypeStruct((B, T, H), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((Tk, PD), jnp.float32),
            pltpu.VMEM((Tk, PD), jnp.float32),
        ],
        interpret=interpret,
    )(q, k, v, do, out, lse, salt_f, b0, kbp)
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash_vjp(q, k, v, salt_f, b0, kbias, scale, rate, block_q,
               interpret, n_heads, head_dim):
    out, _ = _fwd_impl(q, k, v, salt_f, b0, kbias, scale, rate, block_q,
                       interpret, n_heads, head_dim)
    return out


def _flash_fwd(q, k, v, salt_f, b0, kbias, scale, rate, block_q,
               interpret, n_heads, head_dim):
    out, lse = _fwd_impl(q, k, v, salt_f, b0, kbias, scale, rate, block_q,
                         interpret, n_heads, head_dim)
    return out, (q, k, v, salt_f, b0, kbias, out, lse)


def _flash_bwd(scale, rate, block_q, interpret, n_heads, head_dim, res, g):
    q, k, v, salt_f, b0, kbias, out, lse = res
    dq, dk, dv = _bwd_impl(
        q, k, v, salt_f, b0, kbias, out, lse, g.astype(q.dtype), scale,
        rate, block_q, interpret, n_heads, head_dim,
    )
    return (dq, dk, dv, jnp.zeros_like(salt_f), jnp.zeros_like(b0),
            jnp.zeros_like(kbias))


_flash_vjp.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q, k, v,
    scale: float,
    rate: float = 0.0,
    rng=None,
    kbias=None,
    block_q: int = 256,
    interpret: bool = False,
    batch0=None,
):
    """Flash attention over (B, T, N, D) tensors -> (B, T, N, D).

    The (B, T, N, D) -> (B, T, N*D) fold is a free reshape (contiguous
    trailing axes), so the kernel consumes the QKV projection's memory
    layout directly — no transpose or pad ever reaches HBM.

    rate > 0 applies salted-hash dropout to the attention probabilities
    (rng required); the mask is recomputed in the backward from the
    8-byte salt. ``kbias``: optional additive (B, T) f32 key bias (the
    padded-frame attention mask). ``batch0``: optional int32 scalar
    added to the kernel's batch index before mask hashing — a
    data-parallel shard passes its global batch offset so the mask
    stream is bit-identical to the unsharded run (the salt stays
    replicated). Differentiable in q, k, v."""
    B, T, N, D = q.shape
    if rate > 0.0:
        assert rng is not None, "dropout needs an rng"
        salt = jax.random.bits(rng, (1, 2), jnp.uint32)
    else:
        salt = jnp.zeros((1, 2), jnp.uint32)
    salt_f = jax.lax.bitcast_convert_type(salt, jnp.float32)
    if kbias is None:
        kbias = jnp.zeros((B, T), jnp.float32)
    b0 = jnp.zeros((1, 1), jnp.int32) if batch0 is None else \
        jnp.asarray(batch0, jnp.int32).reshape(1, 1)
    out = _flash_vjp(
        q.reshape(B, T, N * D), k.reshape(B, T, N * D),
        v.reshape(B, T, N * D), salt_f, b0, kbias.astype(jnp.float32),
        float(scale), float(rate), int(block_q), bool(interpret),
        int(N), int(D),
    )
    return out.reshape(B, T, N, D)


def flash_attention_sharded(
    mesh, axis: str,
    q, k, v,
    scale: float,
    rate: float = 0.0,
    rng=None,
    kbias=None,
    block_q: int = 256,
    interpret: bool = False,
):
    """Data-parallel flash attention: the kernel runs PER DEVICE inside
    an explicit ``shard_map`` (GSPMD treats a Mosaic custom call as
    opaque and would replicate it — the same issue the sharded LSTM
    kernel solves, ops/pallas/lstm_kernel.py). Batch is sharded over
    ``axis``; the dropout salt is replicated and each shard passes its
    global batch offset into the kernel, so the mask stream — which
    keys on absolute (batch, head, position) indices — is bit-identical
    to the unsharded kernel. Attention is per-utterance, so shards need
    no collectives; the custom VJP shards the same way."""
    B, T, N, D = q.shape
    n_dev = mesh.shape[axis]
    assert B % n_dev == 0, (B, n_dev)
    local_b = B // n_dev
    if rate > 0.0:
        assert rng is not None, "dropout needs an rng"
        salt = jax.random.bits(rng, (1, 2), jnp.uint32)
    else:
        salt = jnp.zeros((1, 2), jnp.uint32)
    if kbias is None:
        kbias = jnp.zeros((B, T), jnp.float32)

    from jax.sharding import PartitionSpec as P

    def local(q4, k4, v4, kb, salt_u32):
        b0 = jax.lax.axis_index(axis) * local_b
        salt_f = jax.lax.bitcast_convert_type(salt_u32, jnp.float32)
        out3 = _flash_vjp(
            q4.reshape(local_b, T, N * D), k4.reshape(local_b, T, N * D),
            v4.reshape(local_b, T, N * D), salt_f,
            b0.reshape(1, 1).astype(jnp.int32), kb.astype(jnp.float32),
            float(scale), float(rate), int(block_q), bool(interpret),
            int(N), int(D),
        )
        return out3.reshape(local_b, T, N, D)

    sm = jax.shard_map(
        local, mesh=mesh,
        in_specs=(
            P(axis, None, None, None), P(axis, None, None, None),
            P(axis, None, None, None), P(axis, None), P(None, None),
        ),
        out_specs=P(axis, None, None, None),
        check_vma=False,
    )
    return sm(q, k, v, kbias, salt)
