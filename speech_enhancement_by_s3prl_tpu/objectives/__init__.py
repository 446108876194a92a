"""Training objectives.

The reference's seven losses (/root/reference/objective.py) all follow one
contract: ``criterion(**step_context) -> (loss, aux_dict)`` where the step
context carries whichever tensors the loss cherry-picks (the
``criterion(**remove_self(locals()), **model_results)`` kwargs-soup at
/root/reference/runner.py:458,575 — SURVEY.md section 2.10). The rebuild
keeps the same names and kwargs vocabulary but passes an explicit context
dict; every loss is a pure, vmap/jit-friendly function of masked arrays.

Spectral losses consume the POWER spectrogram ('linear' features), exactly
like the reference (e.g. SISDR takes sqrt to get magnitudes,
objective.py:89-90).
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp

Aux = Dict[str, Any]


class L1:
    """Log-spectral L1 (/root/reference/objective.py:103-117): mean |log_pred
    - log(tar + eps)| over valid frames only. The reference gathers valid
    frames with masked_select; on TPU we keep static shapes and divide by
    the mask mass instead."""

    def __init__(self, eps: float = 1e-10, **kwargs):
        self.eps = eps

    def __call__(self, log_predicted, linear_tar, stft_length_masks, **kwargs):
        mask = stft_length_masks[..., None]
        diff = jnp.abs(log_predicted - jnp.log(linear_tar + self.eps)) * mask
        # masked_select keeps whole frames: element count = mask.sum() * F
        loss = diff.sum() / (stft_length_masks.sum() * log_predicted.shape[-1])
        return loss, {}


class SISDR:
    """Hand-rolled scale-invariant SDR on sqrt-magnitude spectra
    (/root/reference/objective.py:81-100)."""

    def __init__(self, eps: float = 1e-10, **kwargs):
        self.eps = eps

    def __call__(self, predicted, linear_tar, stft_length_masks, **kwargs):
        mask = stft_length_masks[..., None]
        src = jnp.sqrt(jax.nn.relu(predicted)) * mask
        tar = jnp.sqrt(jax.nn.relu(linear_tar)) * mask
        src = src.reshape(src.shape[0], -1)
        tar = tar.reshape(tar.shape[0], -1)
        alpha = (src * tar).sum(-1) / ((tar * tar).sum(-1) + self.eps)
        ay = alpha[:, None] * tar
        norm = ((ay - src) ** 2).sum(-1) + self.eps
        loss = -10.0 * jnp.log10((ay * ay).sum(-1) / norm + self.eps)
        return loss.mean(), {}


def _si_sdr_core(est, tar, zero_mean: bool, eps: float = 1e-8):
    """SI-SDR of flattened signals, (B, N) -> (B,)."""
    if zero_mean:
        est = est - est.mean(axis=-1, keepdims=True)
        tar = tar - tar.mean(axis=-1, keepdims=True)
    dot = (est * tar).sum(-1, keepdims=True)
    s_tar_energy = (tar * tar).sum(-1, keepdims=True) + eps
    scaled_tar = dot * tar / s_tar_energy
    e_noise = est - scaled_tar
    ratio = (scaled_tar**2).sum(-1) / ((e_noise**2).sum(-1) + eps)
    return 10.0 * jnp.log10(ratio + eps)


class sisdr:
    """Negative SI-SDR on masked spectra (the asteroid ``SingleSrcNegSDR
    ("sisdr", zero_mean=False)`` call at /root/reference/objective.py:65-78),
    computed over the flattened (frames x bins) spectrum per utterance."""

    def __init__(self, **kwargs):
        pass

    def __call__(self, predicted, linear_tar, stft_length_masks, **kwargs):
        mask = stft_length_masks[..., None]
        src = (predicted * mask).reshape(predicted.shape[0], -1)
        tar = (linear_tar * mask).reshape(linear_tar.shape[0], -1)
        return -_si_sdr_core(src, tar, zero_mean=False).mean(), {}


class stoi:
    """Negative STOI loss on masked waveforms
    (/root/reference/objective.py:16-29). Differentiable JAX STOI; waveform
    tensors only exist on the eval path in the reference (SURVEY.md
    section 2.10) and the same holds here."""

    def __init__(self, sample_rate: int = 16000, **kwargs):
        from ..metrics.stoi import stoi_coeff_batch

        self._fn = partial(stoi_coeff_batch, sample_rate=sample_rate, extended=False,
                           remove_silent=False)

    def __call__(self, wav_predicted, wav_tar, length_masks, **kwargs):
        src = wav_predicted * length_masks
        tar = wav_tar * length_masks
        # stoi_coeff_batch signature is (clean_reference, processed)
        return -self._fn(tar, src).mean(), {}


class estoi:
    """Negative extended-STOI loss (/root/reference/objective.py:32-45)."""

    def __init__(self, sample_rate: int = 16000, **kwargs):
        from ..metrics.stoi import stoi_coeff_batch

        self._fn = partial(stoi_coeff_batch, sample_rate=sample_rate, extended=True,
                           remove_silent=False)

    def __call__(self, wav_predicted, wav_tar, length_masks, **kwargs):
        src = wav_predicted * length_masks
        tar = wav_tar * length_masks
        return -self._fn(tar, src).mean(), {}


class pmsqe:
    """PMSQE perceptual loss on masked power spectra
    (/root/reference/objective.py:48-62). JAX implementation of the
    Martin-Donas et al. (2018) PESQ-inspired bark-domain distortion."""

    def __init__(self, **kwargs):
        from .pmsqe import PMSQE

        self._fn = PMSQE(sample_rate=16000)

    def __call__(self, predicted, linear_tar, stft_length_masks, **kwargs):
        mask = stft_length_masks[..., None]
        src = predicted * mask
        tar = linear_tar * mask
        return self._fn(src, tar, stft_length_masks), {}


class WSD:
    """Weighted speech-distortion loss on the mask ``offset``
    (/root/reference/objective.py:120-152): a voice-activity mask from an
    energy-dB threshold gates the speech-distortion term; the noise-leakage
    term penalizes mask response on the noise excess. Emits a
    spectrogram-figure logger closure like the reference."""

    # the Runner re-runs the objective eagerly at media_step to dispatch
    # the figure logger (inside jit the closure would capture tracers)
    has_logger = True

    def __init__(self, alpha: float = 0.5, db_interval: float = 30, eps: float = 1e-10,
                 **kwargs):
        self.alpha = alpha
        self.db_interval = db_interval
        self.eps = eps

    def __call__(self, linear_inp, offset, linear_tar, stft_length_masks, **kwargs):
        S, G = linear_tar, offset
        N = jax.nn.relu(linear_inp - linear_tar)

        energy = S.sum(axis=-1, keepdims=True)
        db_thres = 10.0 * jnp.log10(energy.max() + self.eps) - self.db_interval
        voice_mask = (10.0 * jnp.log10(energy + self.eps) > db_thres).astype(S.dtype)

        mask = stft_length_masks[..., None]
        speech_diff = (S - G * S) * voice_mask * mask
        speech_loss = (speech_diff**2).sum(axis=(-1, -2)).mean()
        noise_loss = ((G * N * mask) ** 2).sum(axis=(-1, -2)).mean()

        def logger(log, global_step, *, _S=S, _vm=voice_mask, _e=energy, _N=N,
                   _inp=linear_inp, eps=self.eps):
            from ..utils.plotting import plot_spectrograms
            import numpy as np

            fig = plot_spectrograms([
                np.log(np.asarray(_S[0]) + eps),
                np.log(np.asarray(_inp[0]) + eps),
                np.log(np.broadcast_to(np.asarray(_e[0]), _S[0].shape) + eps),
                np.log(np.asarray((_S * _vm)[0]) + eps),
                np.log(np.asarray(_N[0]) + eps),
            ])
            log.add_figure("WSD_variables", fig, global_step)

        loss = self.alpha * speech_loss + (1.0 - self.alpha) * noise_loss
        return loss, {"logger": logger}


OBJECTIVE_REGISTRY = {
    "L1": L1,
    "SISDR": SISDR,
    "sisdr": sisdr,
    "stoi": stoi,
    "estoi": estoi,
    "pmsqe": pmsqe,
    "WSD": WSD,
}


def build_objective(name: str, **cfg):
    """Explicit registry replacing ``eval(f'{objective}(**cfg)')``
    (/root/reference/runner.py:83)."""
    assert name in OBJECTIVE_REGISTRY, f"unknown objective {name}"
    return OBJECTIVE_REGISTRY[name](**cfg)
