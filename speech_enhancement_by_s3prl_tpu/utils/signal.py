"""Signal toolbox: silence removal and resampling.

Rebuilds the reference's utils toolbox surface (/root/reference/utils.py:
71-249 — ``Silence_Remover`` and the Kaldi-style polyphase ``Resampler``;
both dead code there but part of the public toolbox, SURVEY.md section 2
item 7) as jit-friendly JAX functions.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=2)
def _hann_nozero(n: int) -> np.ndarray:
    return np.hanning(n + 2)[1:-1].astype(np.float32)


def remove_silence(
    x: jnp.ndarray,
    y: jnp.ndarray,
    dyn_range: float = 40.0,
    framelen: int = 256,
    hop: int = 128,
    use_ref: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """STOI-style silent-frame removal on a pair of 1-D signals.

    Frames both signals (hann window), drops frames whose energy is more
    than ``dyn_range`` dB below the loudest frame (measured on ``y`` when
    ``use_ref``), and overlap-adds the kept frames. Static-shape variant:
    kept frames are stable-partitioned to the front and the returned
    signals are zero beyond ``n_kept * hop + hop`` (also returned).

    Returns (x_speech, y_speech, n_valid_samples).
    """
    w = jnp.asarray(_hann_nozero(framelen))
    n_frames = max((x.shape[-1] - framelen) // hop + 1, 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(framelen)[None, :]
    xf = x[idx] * w
    yf = y[idx] * w

    basis = yf if use_ref else xf
    energies = 20.0 * jnp.log10(jnp.linalg.norm(basis, axis=-1) + 1e-12)
    keep = (energies.max() - dyn_range - energies) < 0

    order = jnp.argsort(~keep, stable=True)
    xk = xf[order] * keep[order][:, None]
    yk = yf[order] * keep[order][:, None]

    out_len = (n_frames - 1) * hop + framelen
    pos = (jnp.arange(n_frames)[:, None] * hop + jnp.arange(framelen)[None, :]).reshape(-1)
    x_out = jnp.zeros(out_len, x.dtype).at[pos].add(xk.reshape(-1))
    y_out = jnp.zeros(out_len, y.dtype).at[pos].add(yk.reshape(-1))
    n_valid = keep.sum() * hop + hop
    return x_out, y_out, n_valid


class Resampler:
    """Polyphase sinc resampler, Kaldi convention (lowpass at 0.99 * Nyquist
    of the lower rate, configurable filter width), implemented as one
    dilated/strided convolution on device."""

    def __init__(self, lowpass_filter_width: int = 6):
        self.width = lowpass_filter_width

    @functools.lru_cache(maxsize=8)
    def _kernel(self, orig_freq: int, new_freq: int) -> np.ndarray:
        g = math.gcd(orig_freq, new_freq)
        up, down = new_freq // g, orig_freq // g
        min_freq = min(orig_freq, new_freq)
        cutoff = 0.99 * 0.5 * min_freq
        # windowed-sinc at the polyphase rate
        poly_rate = orig_freq * up
        half_width = int(math.ceil(self.width * poly_rate / (2.0 * cutoff)))
        n = np.arange(-half_width, half_width + 1, dtype=np.float64)
        t = n / poly_rate
        win = np.where(
            np.abs(t) < self.width / (2.0 * cutoff),
            0.5 * (1 + np.cos(2 * math.pi * cutoff / self.width * t)),
            0.0,
        )
        sinc = 2 * cutoff / orig_freq * np.sinc(2 * cutoff * t)
        return (win * sinc).astype(np.float32), up, down

    def __call__(self, waveform: jnp.ndarray, orig_freq: int, new_freq: int):
        """(..., T) -> (..., ceil(T * new / orig))."""
        if orig_freq == new_freq:
            return waveform
        h, up, down = self._kernel(int(orig_freq), int(new_freq))
        lead = waveform.shape[:-1]
        t = waveform.shape[-1]
        xb = waveform.reshape((-1, 1, t))
        n_out = int(math.ceil(t * up / down))
        out = jax.lax.conv_general_dilated(
            xb,
            jnp.asarray(h)[None, None, :],
            window_strides=(down,),
            padding=[(len(h) // 2, len(h) // 2 + up * down)],
            lhs_dilation=(up,),
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        # kernel amplitude 2*cutoff/orig = (2*cutoff/poly_rate) * up already
        # compensates the zero-stuffing attenuation — no extra gain here
        return out[:, 0, :n_out].reshape(lead + (n_out,))
