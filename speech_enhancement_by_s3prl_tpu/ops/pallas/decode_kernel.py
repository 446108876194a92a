"""Fused Pallas iSTFT + overlap-add decode kernel for TPU.

The XLA decode path (ops/stft.istft: rescale -> inverse-DFT einsum ->
scatter-free OLA -> envelope divide) measured 52 ms at the flagship
geometry (B=768, 10 s) against a ~5 ms memory-roofline: every stage
materializes its (B, T', n_fft)-sized intermediate in HBM and the
non-128-aligned minor dims (201/402/400/160) pad poorly
(docs/PERF.md round-3 DSP decomposition; stage bench in
scripts/bench_dsp_stages.py). This kernel runs the whole decode as ONE
pallas_call: each grid step loads a (Bb, Tb) block of the predicted
spectrum + packed phase, rescales in VMEM, hits the MXU with the
window-folded inverse-DFT matmul, overlap-adds locally, and streams out
exactly the finished hop-aligned samples. The (K-1)*hop-sample overlap
into the next block rides a VMEM carry scratch across the sequential
time grid — frames never touch HBM.

Reconstruction contract matches ops/stft.istft with a packed [re | im]
phase carrier ('uphase'): magnitude = linear ** (1/linear_power),
re/im rescaled by magnitude/|z| with the arctan2(0,0)=0 convention at
|z| = 0 (unit vector (1, 0)). Matmul runs bf16 x bf16 -> f32 like the
XLA path's default-precision einsum. Envelope division and trimming
happen in the caller (ops/stft.istft handles both when routed here).

Reference behavior being reproduced: ``preprocessor.istft(linear,
phase_inp)`` at /root/reference/runner.py:267.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pred_ref, zre_ref, zim_ref, wre_ref, wim_ref, out_ref, carry, *,
            n_freq, hop, k_blocks, linear_power):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    pred = pred_ref[...]                    # (Bb, Tb, F)
    zre, zim = zre_ref[...], zim_ref[...]   # (Bb, Tb, F) each
    if linear_power == 1.0:
        mag = pred
    elif linear_power == 2.0:
        mag = jnp.sqrt(pred)
    else:
        mag = pred ** (1.0 / linear_power)
    zmag = jnp.sqrt(zre * zre + zim * zim)
    pos = zmag > 0.0
    inv_z = 1.0 / jnp.where(pos, zmag, 1.0)
    re = (mag * jnp.where(pos, zre * inv_z, 1.0)).astype(jnp.bfloat16)
    im = (mag * jnp.where(pos, zim * inv_z, 0.0)).astype(jnp.bfloat16)

    bb, tb = re.shape[0], re.shape[1]
    re2 = re.reshape(bb * tb, n_freq)
    im2 = im.reshape(bb * tb, n_freq)

    # one matmul per hop-sized slot of the synthesis frame (Mosaic can't
    # split the lane dim of a single (Bb*Tb, K*hop) product), weights
    # pre-split host-side into (K, F, hop) re/im stacks so the kernel
    # only indexes major dims — no unaligned lane/sublane slicing
    def slot(j):
        acc = jax.lax.dot_general(
            re2, wre_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            im2, wim_ref[j], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc.reshape(bb, tb, hop)

    slots = [slot(j) for j in range(k_blocks)]

    # local overlap-add: slot j of frame t lands at hop-row t + j
    local = slots[0]                                     # (Bb, Tb, hop)
    for j in range(1, k_blocks):
        local = local + jnp.pad(
            slots[j][:, : tb - j], ((0, 0), (j, 0), (0, 0))
        )
    # out stays (Bb, Tb, hop): merging (Tb, hop) into one lane dim is an
    # unsupported shape cast in Mosaic — the caller flattens
    head = local[:, : k_blocks - 1] + carry[...]
    out_ref[...] = jnp.concatenate(
        [head, local[:, k_blocks - 1:]], axis=1
    )

    # tail rows spilling past this block: frame t, slot j with
    # t + j >= Tb -> carry row (t + j - Tb); slot j covers rows [0, j)
    tail = jnp.zeros((bb, k_blocks - 1, hop), jnp.float32)
    for j in range(1, k_blocks):
        tail = tail + jnp.pad(
            slots[j][:, tb - j:], ((0, 0), (0, k_blocks - 1 - j), (0, 0))
        )
    carry[...] = tail


@functools.lru_cache(maxsize=8)
def _inv_windowed_split(n_fft: int, win_length: int, hop: int):
    """Window-folded inverse-DFT weights as (K, F, hop) re/im stacks."""
    from ..stft import _dft_kernels

    _, inv, window = _dft_kernels(n_fft, win_length)
    k = -(-n_fft // hop)
    n_freq = inv.shape[0] // 2
    full = np.zeros((inv.shape[0], k * hop), np.float32)
    full[:, :n_fft] = inv * window[None, :]
    stacked = full.reshape(inv.shape[0], k, hop).transpose(1, 0, 2)
    return (
        np.ascontiguousarray(stacked[:, :n_freq]),
        np.ascontiguousarray(stacked[:, n_freq:]),
    )


def decode_ola_pallas(
    pred: jnp.ndarray,       # (B, T', F) non-negative spectrum
    uph: jnp.ndarray,        # (B, T', 2F) packed [re | im] phase carrier
    n_fft: int,
    win_length: int,
    hop: int,
    linear_power: float = 2.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Raw (untrimmed, un-normalized) OLA waveform, (B, Tpad * hop).

    Callers slice [n_fft//2 : n_fft//2 + (T'-1)*hop] and divide by the
    window-square envelope exactly as the XLA istft does.
    """
    B, T, F = pred.shape
    K = -(-n_fft // hop)
    wre_np, wim_np = _inv_windowed_split(n_fft, win_length, hop)
    wre = jnp.asarray(wre_np, jnp.bfloat16)
    wim = jnp.asarray(wim_np, jnp.bfloat16)

    # block geometry: Tb frames per step; zero-padded frames contribute
    # nothing (mag 0) so rounding T up is free. Tpad - T >= K - 1 keeps
    # every real frame's tail inside the gridded output.
    Tb = 128
    n_t = -(-(T + K - 1) // Tb)
    Tpad = n_t * Tb
    Bb = next(b for b in (8, 4, 2, 1) if B % b == 0)

    pad_t = Tpad - T
    pred = jnp.pad(pred, ((0, 0), (0, pad_t), (0, 0)))
    # re/im split host-side: Mosaic lane slicing at the (unaligned)
    # n_freq offset is the alternative, and it does not lower cleanly
    zre = jnp.pad(uph[..., :F], ((0, 0), (0, pad_t), (0, 0)))
    zim = jnp.pad(uph[..., F:], ((0, 0), (0, pad_t), (0, 0)))

    out = pl.pallas_call(
        functools.partial(
            _kernel, n_freq=F, hop=hop, k_blocks=K,
            linear_power=linear_power,
        ),
        grid=(B // Bb, n_t),
        in_specs=[
            pl.BlockSpec((Bb, Tb, F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, Tb, F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, Tb, F), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, F, hop), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, F, hop), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, Tb, hop), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tpad, hop), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bb, K - 1, hop), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            # batch blocks independent; time carries the OLA scratch
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(pred, zre, zim, wre, wim)
    return out.reshape(B, Tpad * hop)
