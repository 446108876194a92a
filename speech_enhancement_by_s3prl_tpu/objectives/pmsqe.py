"""PMSQE — Perceptual Metric for Speech Quality Evaluation, in JAX.

The reference drives asteroid's ``SingleSrcPMSQE`` on masked power spectra
(/root/reference/objective.py:48-62) — a differentiable distortion modeled
on PESQ's perceptual pipeline (Martin-Donas et al., IEEE SPL 2018):
bark-band grouping, partial gain equalization, Zwicker-law loudness, and
symmetric + asymmetric disturbance aggregation.

Note on fidelity: asteroid's bark matrices are tabulated for 256/512-FFT
grids; the reference even overrides ``nbins=400`` against a 201-bin input
(objective.py:51-52), so its PMSQE numbers were never table-exact. This
implementation generates the bark bands analytically (Traunmüller bark
scale, 49 bands for 16 kHz wideband) for WHATEVER n_freq the framework's
STFT produces, keeping the loss consistent with the 201-bin pipeline and
fully differentiable on device.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# Zwicker-law and disturbance constants from the PESQ/PMSQE formulation
POWER_FACTOR = 1e7          # target active-band power after normalization
ZWICKER_GAMMA = 0.23
P0 = 1e4                    # modeled hearing threshold per band (flat approx.)
MASK_FACTOR = 0.25
ASYM_CLIP = 12.0
ASYM_FLOOR = 3.0
D_SYM_WEIGHT = 0.1
D_ASYM_WEIGHT = 0.0309      # asteroid's alpha/beta pairing for joint use


def hz_to_bark(f):
    return 26.81 * np.asarray(f, dtype=np.float64) / (1960.0 + np.asarray(f)) - 0.53


@functools.lru_cache(maxsize=4)
def bark_matrix(n_freq: int, sample_rate: int, n_bands: Optional[int] = None):
    """(n_freq, n_bands) averaging matrix over equal-bark-width bands."""
    if n_bands is None:
        n_bands = 49 if sample_rate >= 16000 else 42
    freqs = np.linspace(0.0, sample_rate / 2.0, n_freq)
    bark = hz_to_bark(freqs)
    edges = np.linspace(bark[1], bark[-1], n_bands + 1)
    mat = np.zeros((n_freq, n_bands), dtype=np.float32)
    idx = np.clip(np.searchsorted(edges, bark) - 1, 0, n_bands - 1)
    for k in range(n_freq):
        mat[k, idx[k]] = 1.0
    # normalize: mean power per band
    counts = mat.sum(axis=0, keepdims=True)
    mat = mat / np.maximum(counts, 1.0)
    return mat


class PMSQE:
    """Differentiable PMSQE distortion between power spectra.

    __call__(deg_power, ref_power, frame_masks) -> scalar loss.
    deg/ref: (B, T, n_freq) power spectra; frame_masks: (B, T).
    """

    def __init__(self, sample_rate: int = 16000, n_bands: Optional[int] = None,
                 eps: float = 1e-8):
        self.sample_rate = sample_rate
        self.n_bands = n_bands
        self.eps = eps

    def _bark(self, power):
        mat = jnp.asarray(
            bark_matrix(power.shape[-1], self.sample_rate, self.n_bands)
        )
        # near-f32 operands: bark sums span ~60 dB of band dynamics, and
        # TPU default precision bf16-truncates matmul inputs (see
        # metrics/stoi.py measurement)
        from ..metrics.stoi import metric_precision

        return jnp.einsum("...f,fb->...b", power, mat,
                          preferred_element_type=jnp.float32,
                          precision=metric_precision())

    def _normalize_power(self, power, frame_masks):
        """Scale so mean active power in the speech band hits POWER_FACTOR
        (PESQ's level alignment, simplified to a per-utterance gain)."""
        n_freq = power.shape[-1]
        f = np.linspace(0, self.sample_rate / 2, n_freq)
        band = jnp.asarray(((f > 350) & (f < 3250)).astype(np.float32))
        masked = power * frame_masks[..., None]
        band_power = (masked * band).sum(axis=(-1, -2))
        n_active = jnp.maximum(frame_masks.sum(-1) * band.sum(), 1.0)
        mean_power = band_power / n_active
        gain = POWER_FACTOR / jnp.maximum(mean_power, self.eps)
        return power * gain[:, None, None]

    def _loudness(self, bark):
        ratio = (0.5 + 0.5 * bark / P0) ** ZWICKER_GAMMA - 1.0
        return ((P0 / 0.5) ** ZWICKER_GAMMA) * jnp.maximum(ratio, 0.0)

    def __call__(self, deg_power, ref_power, frame_masks):
        fm = frame_masks.astype(deg_power.dtype)
        deg = self._normalize_power(deg_power, fm)
        ref = self._normalize_power(ref_power, fm)

        deg_bark = self._bark(deg)
        ref_bark = self._bark(ref)

        # partial gain equalization: per-band average ratio, clamped as in
        # PESQ to avoid over-compensation
        num = (ref_bark * fm[..., None]).sum(axis=1) + self.eps
        den = (deg_bark * fm[..., None]).sum(axis=1) + self.eps
        band_gain = jnp.clip(num / den, 3e-4, 5.0)
        deg_bark = deg_bark * band_gain[:, None, :]

        l_deg = self._loudness(deg_bark)
        l_ref = self._loudness(ref_bark)

        diff = jnp.abs(l_deg - l_ref)
        mask_thr = MASK_FACTOR * jnp.minimum(l_deg, l_ref)
        d_sym = jnp.maximum(diff - mask_thr, 0.0)

        asym = ((deg_bark + 50.0) / (ref_bark + 50.0)) ** 1.2
        asym = jnp.where(asym < ASYM_FLOOR, 0.0, jnp.minimum(asym, ASYM_CLIP))
        d_asym = d_sym * asym

        # per-frame band aggregation (L2-ish as in PMSQE), masked frame mean
        frame_sym = jnp.sqrt((d_sym**2).mean(axis=-1) + self.eps)
        frame_asym = jnp.sqrt((d_asym**2).mean(axis=-1) + self.eps)
        denom = jnp.maximum(fm.sum(axis=-1), 1.0)
        per_utt = (
            (D_SYM_WEIGHT * frame_sym + D_ASYM_WEIGHT * frame_asym) * fm
        ).sum(axis=-1) / denom
        return per_utt.mean()
