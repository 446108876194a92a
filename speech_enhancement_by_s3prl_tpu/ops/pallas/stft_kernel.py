"""Fused Pallas STFT (framing + window + real DFT) kernel for TPU.

The XLA path expresses the forward STFT as one strided
conv_general_dilated (ops/stft.stft method='matmul'); at the flagship
geometry (B=768 x 2 channels, 10 s) it measured 49.4 ms against a
~5 ms memory roofline, and neither a hop-blocked matmul rewrite
(55.2 ms) nor bf16 conv inputs (48.3 ms) moved it — the cost is XLA
materialization/layout overhead, not MXU throughput
(docs/PERF.md round-3 DSP decomposition). This kernel reads each
hop-sized slice of the waveform exactly once, keeps the overlapping
framing entirely in VMEM (frames start at hop multiples, so framing is
K = ceil(n_fft/hop) shifted views of a hop-blocked reshape), and hits
the MXU with the window-folded DFT matmul — one pallas_call, input read
once, spectrum written once.

The overlap of the last frames in a time block into the next hop block
is handled by passing the SAME hops array twice: a (Bb, Tf, hop)
current block plus a (Bb, K-1, hop) lookahead block addressed at the
following Tf-boundary, so no halo is re-fetched and no carry is needed
(read-only overlap).

Matmul runs bf16 x bf16 -> f32, matching the XLA conv's
default-precision numerics. Output is bit-compatible with
ops/stft.stft up to that rounding (parity-tested in
tests/test_pallas_dsp.py).

Framing convention reproduced: torch.stft(center=True,
pad_mode='reflect', onesided=True) with a periodic Hann window — the
reference preprocessor contract (/root/reference/runner.py:433).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cur_ref, nxt_ref, fwd_ref, out_ref, *, hop, k_blocks, n_out):
    cur = cur_ref[...]                       # (Bb, Tf, hop)
    nxt = nxt_ref[...][:, : k_blocks - 1]    # (Bb, 8, hop) -> first K-1
    hops = jnp.concatenate([cur, nxt], axis=1).astype(jnp.bfloat16)
    bb, tf = cur.shape[0], cur.shape[1]

    acc = None
    for j in range(k_blocks):
        part = jax.lax.dot_general(
            hops[:, j : j + tf].reshape(bb * tf, hop),
            fwd_ref[j * hop : (j + 1) * hop],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    out_ref[...] = acc.reshape(bb, tf, n_out)


@functools.lru_cache(maxsize=8)
def _fwd_padded(n_fft: int, win_length: int, pad_to: int):
    from ..stft import _dft_kernels

    fwd, _, _ = _dft_kernels(n_fft, win_length)
    out = np.zeros((pad_to, fwd.shape[1]), np.float32)
    out[:n_fft] = fwd
    return out


def stft_pallas(
    wavs: jnp.ndarray,        # (..., time) f32
    n_fft: int,
    win_length: int,
    hop: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """(..., n_frames, 2 * n_freq) packed [re | im] spectrum,
    n_frames = 1 + time // hop (torch.stft center=True convention)."""
    lead = wavs.shape[:-1]
    time = wavs.shape[-1]
    n_frames = 1 + time // hop
    K = -(-n_fft // hop)
    n_out = 2 * (n_fft // 2 + 1)

    x = wavs.reshape((-1, time))
    B = x.shape[0]
    x = jnp.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")

    Tf = 128
    la = 8  # lookahead block rows: Mosaic needs sublane blocks >= 8;
    #         only the first K-1 rows are consumed
    assert K - 1 <= la and Tf % la == 0
    n_t = -(-n_frames // Tf)
    # hops must cover frame (n_t*Tf - 1)'s last slice AND give every
    # grid step a valid lookahead block at the next Tf-boundary
    n_hops = n_t * Tf + la
    need = n_hops * hop
    if need > x.shape[-1]:
        x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
    else:
        x = x[:, :need]
    hops = x.reshape(B, n_hops, hop)

    Bb = next(b for b in (8, 4, 2, 1) if B % b == 0)
    fwd = jnp.asarray(_fwd_padded(n_fft, win_length, K * hop), jnp.bfloat16)

    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop, k_blocks=K, n_out=n_out),
        grid=(B // Bb, n_t),
        in_specs=[
            pl.BlockSpec((Bb, Tf, hop), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bb, la, hop),
                         lambda b, t: (b, (t + 1) * (Tf // la), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K * hop, n_out), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bb, Tf, n_out), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n_t * Tf, n_out), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # every block independent: let Mosaic pipeline both grid dims
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(hops, hops, fwd)
    return out[:, :n_frames].reshape(lead + (n_frames, n_out))
