"""TPU-native STFT / iSTFT.

Re-implements the spectral front-end contract of the reference's external
S3PRL ``OnlinePreprocessor`` (see /root/reference/runner.py:433,267 and
/root/reference/sampler.py:226-229 for the call sites that define it):

- framing convention identical to ``torch.stft(center=True,
  pad_mode='reflect', onesided=True, normalized=False)`` with a periodic
  Hann window: ``n_frames = 1 + len // hop`` (/root/reference/runner.py:455).
- ``magphase`` returns the POWER spectrum plus phase; magnitude is
  ``sqrt(power)`` (/root/reference/sampler.py:229).
- ``istft(power, phase)`` reconstructs with ``power ** (1/2)`` as magnitude
  and trims center padding, output length ``(n_frames - 1) * hop``.

TPU-first design: instead of translating torch's FFT call, the forward
transform is expressed as a single strided convolution with a
window-folded real-DFT kernel — framing + windowing + rFFT become one
fused matmul that XLA tiles onto the MXU. For n_fft = 400 the dense DFT
costs more FLOPs than an FFT but runs at MXU speed-of-light and fuses
with the surrounding elementwise work; the FFT path (``method='fft'``) is
kept for parity testing and very large n_fft.
"""
from __future__ import annotations

import functools
import math
import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


def _pallas_interpret() -> bool:
    # Mosaic kernels only lower for TPU; on CPU fall back to interpret
    # mode (tests, --cpu CLI runs with the knobs set)
    return jax.default_backend() == "cpu"


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window — matches ``torch.hann_window(periodic=True)``."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * math.pi * n / win_length)
    return w.astype(dtype)


def _padded_window(win_length: int, n_fft: int) -> np.ndarray:
    """Hann window zero-padded symmetrically to n_fft (torch.stft behavior)."""
    w = hann_window(win_length)
    if win_length == n_fft:
        return w
    assert win_length < n_fft
    left = (n_fft - win_length) // 2
    out = np.zeros(n_fft, dtype=np.float32)
    out[left : left + win_length] = w
    return out


@functools.lru_cache(maxsize=8)
def _dft_kernels(n_fft: int, win_length: int):
    """Window-folded real-DFT analysis kernel and synthesis kernel.

    Returns:
      fwd: (n_fft, 2 * n_freq) — frames @ fwd = [real | imag] of rFFT(w * x)
      inv: (2 * n_freq, n_fft) — [real | imag] @ inv = irFFT, *without* window
      window: (n_fft,)
    """
    n_freq = n_fft // 2 + 1
    window = _padded_window(win_length, n_fft)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * math.pi * n * k / n_fft
    cos, sin = np.cos(ang), np.sin(ang)
    # rFFT with e^{-i theta}: real = sum x cos, imag = -sum x sin
    fwd = np.concatenate([window[:, None] * cos, window[:, None] * -sin], axis=1)

    # inverse rDFT: x_n = (1/N) * sum_k c_k * (re_k cos - im_k sin),
    # c_k = 1 for k in {0, N/2}, else 2 (onesided hermitian completion).
    c = np.full(n_freq, 2.0)
    c[0] = 1.0
    if n_fft % 2 == 0:
        c[-1] = 1.0
    inv = np.concatenate([(c[:, None] * cos.T), (c[:, None] * -sin.T)], axis=0) / n_fft
    # host numpy constants: safe to build/cache inside any jit trace
    return (
        np.asarray(fwd, dtype=np.float32),
        np.asarray(inv, dtype=np.float32),
        np.asarray(window, dtype=np.float32),
    )


@dataclass(frozen=True)
class StftParams:
    """STFT geometry. Defaults reproduce the reference's pretraining config
    (/root/reference/config/pretrain_sample.yaml:46-49): 25 ms window,
    10 ms hop, 201 frequency bins at 16 kHz."""

    sample_rate: int = 16000
    win_ms: float = 25.0
    hop_ms: float = 10.0
    n_freq: int = 201

    @property
    def win_length(self) -> int:
        return round(self.win_ms * self.sample_rate / 1000)

    @property
    def hop_length(self) -> int:
        return round(self.hop_ms * self.sample_rate / 1000)

    @property
    def n_fft(self) -> int:
        return (self.n_freq - 1) * 2

    def n_frames(self, num_samples: int) -> int:
        return 1 + num_samples // self.hop_length


def _reflect_pad(wavs: jnp.ndarray, pad: int) -> jnp.ndarray:
    return jnp.pad(wavs, [(0, 0)] * (wavs.ndim - 1) + [(pad, pad)], mode="reflect")


def stft(wavs: jnp.ndarray, params: StftParams, method: str = "matmul") -> jnp.ndarray:
    """Short-time Fourier transform.

    Args:
      wavs: (..., time) float32.
      method: 'matmul' (fused framing+window+DFT as one strided conv on the
        MXU) or 'fft' (gather frames then jnp.fft.rfft).

    Returns:
      (..., n_frames, 2 * n_freq) with real parts in [..., :n_freq] and
      imaginary parts in [..., n_freq:].
    """
    n_fft, hop = params.n_fft, params.hop_length
    n_freq = params.n_freq
    lead = wavs.shape[:-1]
    time = wavs.shape[-1]
    n_frames = params.n_frames(time)

    if method == "matmul" and os.environ.get("SE_PALLAS_STFT", "0") == "1":
        # fused Pallas framing+window+DFT kernel: reads each hop-slice
        # once, keeps framing in VMEM (ops/pallas/stft_kernel.py);
        # bf16 x bf16 -> f32 matmul, parity vs this path in
        # tests/test_pallas_dsp.py
        from .pallas.stft_kernel import stft_pallas

        return stft_pallas(
            wavs, n_fft, params.win_length, hop,
            interpret=_pallas_interpret(),
        )

    x = wavs.reshape((-1, time))
    x = _reflect_pad(x, n_fft // 2)

    if method == "matmul":
        fwd, _, _ = _dft_kernels(n_fft, params.win_length)
        # One conv = framing + window + DFT. (B, 1, T) * (2F, 1, n_fft)
        out = jax.lax.conv_general_dilated(
            x[:, None, :],
            jnp.asarray(fwd.T[:, None, :]),
            window_strides=(hop,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )  # (B, 2F, n_frames)
        out = jnp.swapaxes(out, 1, 2)
    elif method == "hopmm":
        # Hop-blocked dense matmuls — the scatter-free OLA trick in
        # reverse: split the window-folded DFT kernel into K =
        # ceil(n_fft/hop) hop-sized row blocks so framing becomes K
        # shifted VIEWS of a (B, n_hops, hop) reshape. Measured ABLATION:
        # 55.2 ms vs 49.4 ms for the conv form at the flagship geometry
        # on v5e (docs/PERF.md) — XLA's strided-conv lowering was not the
        # bottleneck; kept for the record.
        fwd, _, _ = _dft_kernels(n_fft, params.win_length)
        k_blocks = -(-n_fft // hop)
        fwd_pad = np.zeros((k_blocks * hop, fwd.shape[1]), np.float32)
        fwd_pad[:n_fft] = fwd
        need = (n_frames - 1 + k_blocks) * hop
        if need > x.shape[-1]:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[-1])))
        else:
            x = x[:, :need]
        hops = x.reshape(x.shape[0], -1, hop)
        out = 0.0
        for j in range(k_blocks):
            blk = jnp.asarray(fwd_pad[j * hop : (j + 1) * hop])
            out = out + jnp.einsum(
                "bth,hf->btf", hops[:, j : j + n_frames], blk,
                preferred_element_type=jnp.float32,
            )
    elif method == "fft":
        _, _, window = _dft_kernels(n_fft, params.win_length)
        idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
        frames = x[:, idx] * jnp.asarray(window)  # (B, n_frames, n_fft)
        spec = jnp.fft.rfft(frames, axis=-1)
        out = jnp.concatenate([spec.real, spec.imag], axis=-1).astype(jnp.float32)
    else:
        raise ValueError(f"unknown stft method: {method}")

    return out.reshape(lead + (n_frames, 2 * n_freq))


def magphase(complx: jnp.ndarray, n_freq: int, power: float = 2.0):
    """Split packed [real | imag] into (power-spectrum, phase).

    ``power=2`` matches the reference preprocessor's magphase: the 'linear'
    feature is the POWER spectrogram (/root/reference/sampler.py:226-229
    takes sqrt to recover magnitude)."""
    re, im = complx[..., :n_freq], complx[..., n_freq:]
    sq = re * re + im * im
    if power == 2.0:
        mag = sq
    elif power == 1.0:
        mag = jnp.sqrt(sq)
    else:
        mag = sq ** (power / 2.0)
    phase = jnp.arctan2(im, re)
    return mag, phase


def istft(
    linear: jnp.ndarray,
    phase: jnp.ndarray,
    params: StftParams,
    linear_power: float = 2.0,
) -> jnp.ndarray:
    """Inverse STFT from (power-)magnitude + phase, torch.istft semantics.

    Mirrors the reference's ``preprocessor.istft(linear_tar, phase_inp)``
    (/root/reference/runner.py:267): magnitude = linear ** (1/linear_power),
    synthesis window = analysis Hann, center padding trimmed, output length
    ``(n_frames - 1) * hop``, normalized by the window-square overlap-add
    envelope.

    ``phase`` carries the phase in either representation:
      - (..., n_frames, n_freq): radians (the reference contract) —
        reconstruction is ``mag * (cos, sin)(phase)``.
      - (..., n_frames, 2 * n_freq): a packed ``[re | im]`` complex
        spectrum (the 'uphase' feature) — reconstruction rescales it to
        the target magnitude: ``mag * (re, im) / |z|``. Identical math
        with NO transcendentals (the arctan2 -> cos/sin round trip the
        radian form forces costs three VPU passes over the full
        spectrogram; measured on the enhance pipeline in docs/PERF.md).
        The |z| = 0 corner keeps arctan2 semantics exactly: phase 0,
        i.e. unit vector (1, 0).

    Args:
      linear: (..., n_frames, n_freq) non-negative spectrum.
      phase: (..., n_frames, n_freq) or (..., n_frames, 2 * n_freq).
    """
    n_fft, hop, n_freq = params.n_fft, params.hop_length, params.n_freq
    lead = linear.shape[:-2]
    n_frames = linear.shape[-2]

    if (
        phase.shape[-1] == 2 * n_freq
        and os.environ.get("SE_PALLAS_DECODE", "0") == "1"
    ):
        # fused Pallas rescale+iDFT+OLA kernel (ops/pallas/decode_kernel)
        # — inputs read once, waveform written once; trimming and
        # envelope normalization stay here
        from .pallas.decode_kernel import decode_ola_pallas

        raw = decode_ola_pallas(
            linear.reshape((-1, n_frames, n_freq)),
            phase.reshape((-1, n_frames, 2 * n_freq)),
            n_fft, params.win_length, hop,
            linear_power=linear_power,
            interpret=_pallas_interpret(),
        )
        start = n_fft // 2
        length = (n_frames - 1) * hop
        wav = raw[:, start : start + length]
        env = _ola_envelope(n_fft, params.win_length, hop, n_frames)[
            start : start + length
        ]
        wav = wav / jnp.where(env > 1e-11, env, 1.0)
        return wav.reshape(lead + (length,))

    mag = linear ** (1.0 / linear_power) if linear_power != 1.0 else linear
    if phase.shape[-1] == 2 * n_freq:
        zre, zim = phase[..., :n_freq], phase[..., n_freq:]
        zmag = jnp.sqrt(zre * zre + zim * zim)
        inv_z = 1.0 / jnp.where(zmag > 0.0, zmag, 1.0)
        re = mag * jnp.where(zmag > 0.0, zre * inv_z, 1.0)
        im = mag * jnp.where(zmag > 0.0, zim * inv_z, 0.0)
    else:
        re = mag * jnp.cos(phase)
        im = mag * jnp.sin(phase)
    packed = jnp.concatenate([re, im], axis=-1).reshape((-1, n_frames, 2 * n_freq))

    _, inv, window = _dft_kernels(n_fft, params.win_length)
    inv, window = jnp.asarray(inv), jnp.asarray(window)
    frames = (
        jnp.einsum("btf,fn->btn", packed, inv, preferred_element_type=jnp.float32)
        * window
    )  # (B, n_frames, n_fft)

    wav = _overlap_add(frames, hop)  # (B, n_fft + (n_frames-1)*hop)

    start = n_fft // 2
    length = (n_frames - 1) * hop
    wav = wav[:, start : start + length]
    env = _ola_envelope(n_fft, params.win_length, hop, n_frames)[
        start : start + length
    ]
    wav = wav / jnp.where(env > 1e-11, env, 1.0)
    return wav.reshape(lead + (length,))


def _overlap_add(frames: jnp.ndarray, hop: int) -> jnp.ndarray:
    """Scatter-free overlap-add.

    TPU scatters serialize badly; instead each n_fft-sample frame is split
    into K = ceil(n_fft/hop) hop-sized slots — slot j of frame t lands
    exactly at hop-slot (t + j) of the output — so OLA reduces to K shifted
    dense adds, fully vectorized on the VPU.
    """
    b, n_frames, n_fft = frames.shape
    k = -(-n_fft // hop)
    pad = k * hop - n_fft
    if pad:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
    slots = frames.reshape(b, n_frames, k, hop)

    out_slots = n_frames + k - 1
    wav = jnp.zeros((b, out_slots, hop), dtype=frames.dtype)
    for j in range(k):
        wav = wav.at[:, j : j + n_frames].add(slots[:, :, j])
    return wav.reshape(b, out_slots * hop)[:, : n_fft + (n_frames - 1) * hop]


@functools.lru_cache(maxsize=32)
def _ola_envelope_np(n_fft: int, win_length: int, hop: int, n_frames: int):
    w2 = _padded_window(win_length, n_fft).astype(np.float64) ** 2
    out = np.zeros(n_fft + (n_frames - 1) * hop)
    for t in range(n_frames):
        out[t * hop : t * hop + n_fft] += w2
    return out.astype(np.float32)


def _ola_envelope(n_fft, win_length, hop, n_frames):
    return jnp.asarray(_ola_envelope_np(n_fft, win_length, hop, n_frames))
