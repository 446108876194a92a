"""On-device feature engine — the native replacement for the external S3PRL
``OnlinePreprocessor`` contract (SURVEY.md section 2.9; call sites at
/root/reference/runner.py:433,558, /root/reference/run_downstream.py:123-164,
/root/reference/sampler.py:60).

A ``feat_list`` of dicts ``{feat_type, channel, log, delta, cmvn}`` with
feat_type in {complx, linear, phase, mel, mfcc} is compiled into one pure
function: a single STFT per (batch, channel) feeds every requested feature,
so the whole front-end is one XLA program that fuses framing + window + DFT
+ mel/MFCC matmuls + log/delta/CMVN elementwise work.

Frame-count convention: ``n_frames = 1 + time // hop``
(/root/reference/runner.py:455). 'linear' is the POWER spectrum and
``istft`` consumes it with ``linear_power=2``
(/root/reference/sampler.py:229).
"""
from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_to_mfcc, power_to_mel
from .stft import StftParams, istft as _istft, magphase, stft as _stft

# 'uphase' is a TPU-first addition to the reference's menu: the phase
# carried as the raw packed [re | im] spectrum (a free slice of the STFT
# output) instead of radians. ops/stft.istft consumes it directly by
# magnitude rescaling, which removes the arctan2 -> cos/sin round trip —
# three transcendental VPU passes over the full spectrogram — from the
# enhance pipeline. Radian 'phase' remains for the reference contract.
FEAT_TYPES = ("complx", "linear", "phase", "uphase", "mel", "mfcc")


def compute_deltas(feat: jnp.ndarray, win_length: int = 5) -> jnp.ndarray:
    """Delta features over the time axis (torchaudio ``compute_deltas``
    semantics: symmetric difference kernel, replicate padding).

    feat: (..., time, dim)
    """
    n = (win_length - 1) // 2
    denom = sum(i * i for i in range(1, n + 1)) * 2.0
    padded = jnp.concatenate(
        [jnp.repeat(feat[..., :1, :], n, axis=-2), feat,
         jnp.repeat(feat[..., -1:, :], n, axis=-2)],
        axis=-2,
    )
    time = feat.shape[-2]
    out = jnp.zeros_like(feat)
    for i in range(-n, n + 1):
        if i == 0:
            continue
        out = out + i * jax.lax.dynamic_slice_in_dim(padded, i + n, time, axis=-2)
    return out / denom


def apply_cmvn(feat: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    """Per-utterance cepstral mean/variance normalization over time.

    Uses the unbiased (ddof=1) std to match torch ``Tensor.std`` used across
    the reference model code (/root/reference/model.py:30,88)."""
    mean = feat.mean(axis=-2, keepdims=True)
    var = ((feat - mean) ** 2).sum(axis=-2, keepdims=True) / jnp.maximum(
        feat.shape[-2] - 1, 1
    )
    return (feat - mean) / (jnp.sqrt(var) + eps)


def get_feat_config(
    feat_type: str, channel: int = 0, log: bool = False, delta: int = 0,
    cmvn: bool = False,
) -> Dict[str, Any]:
    """Static helper mirroring ``OnlinePreprocessor.get_feat_config``
    (/root/reference/run_downstream.py:153-156, runner.py:50)."""
    assert feat_type in FEAT_TYPES, feat_type
    return {
        "feat_type": feat_type,
        "channel": channel,
        "log": log,
        "delta": delta,
        "cmvn": cmvn,
    }


def feat_dim(cfg: Dict[str, Any], params: "PreprocessorConfig") -> int:
    base = {
        "complx": 2 * params.stft.n_freq,
        "linear": params.stft.n_freq,
        "phase": params.stft.n_freq,
        "uphase": 2 * params.stft.n_freq,
        "mel": params.n_mels,
        "mfcc": params.n_mfcc,
    }[cfg["feat_type"]]
    return base * (1 + int(cfg.get("delta", 0)))


@dataclass(frozen=True)
class PreprocessorConfig:
    """Constructor vocabulary of the reference preprocessor
    (/root/reference/config/pretrain_sample.yaml:46-50)."""

    sample_rate: int = 16000
    win_ms: float = 25.0
    hop_ms: float = 10.0
    n_freq: int = 201
    n_mels: int = 40
    n_mfcc: int = 13
    eps: float = 1e-10

    @property
    def stft(self) -> StftParams:
        return StftParams(
            sample_rate=self.sample_rate,
            win_ms=self.win_ms,
            hop_ms=self.hop_ms,
            n_freq=self.n_freq,
        )


class OnlinePreprocessor:
    """Feature engine with the reference's API surface.

    ``__call__(wavs)`` with wavs (batch, channel, time) returns one feature
    array per feat_list entry, each (batch, n_frames, dim); with no wavs it
    returns dummy features for shape inference
    (/root/reference/run_downstream.py:163-164, model.py:146).

    Extra constructor kwargs (e.g. the dataset fields that ride along in
    ``pretrain_config['online']``, run_downstream.py:159) are ignored, as in
    the reference.
    """

    get_feat_config = staticmethod(get_feat_config)

    def __init__(
        self,
        sample_rate: int = 16000,
        win_ms: float = 25.0,
        hop_ms: float = 10.0,
        n_freq: int = 201,
        n_mels: int = 40,
        n_mfcc: int = 13,
        feat_list: Optional[List[Dict[str, Any]]] = None,
        eps: float = 1e-10,
        stft_method: str = "matmul",
        **kwargs,
    ):
        self.config = PreprocessorConfig(
            sample_rate=sample_rate,
            win_ms=win_ms,
            hop_ms=hop_ms,
            n_freq=n_freq,
            n_mels=n_mels,
            n_mfcc=n_mfcc,
            eps=eps,
        )
        self.feat_list = copy.deepcopy(feat_list) if feat_list is not None else None
        self.stft_method = stft_method
        # attribute compatibility with reference call sites:
        self._sample_rate = sample_rate  # runner.py:48
        self._win_args = {  # runner.py:455, sampler.py:68
            "n_fft": self.config.stft.n_fft,
            "hop_length": self.config.stft.hop_length,
            "win_length": self.config.stft.win_length,
        }
        self.channel_inp = 0  # overwritten by the CLI wiring
        self.channel_tar = 1

    # -- low-level pieces (exposed like the reference's _stft/_magphase,
    #    used by the active sampler's histogram scorer) ------------------
    def stft_complex(self, wavs: jnp.ndarray) -> jnp.ndarray:
        return _stft(wavs, self.config.stft, method=self.stft_method)

    def magphase(self, complx: jnp.ndarray):
        return magphase(complx, self.config.n_freq, power=2.0)

    # reference-alias surface (/root/reference/sampler.py:226-229 accesses
    # preprocessor._stft / ._magphase / ._window directly)
    def _stft(self, wavs, window=None):
        return self.stft_complex(wavs)

    def _magphase(self, complx):
        return self.magphase(complx)

    @property
    def _window(self):
        from .stft import hann_window

        return hann_window(self.config.stft.win_length)

    # -- feature extraction ---------------------------------------------
    def extract(self, wavs: jnp.ndarray, feat_list: Sequence[Dict[str, Any]]):
        """Pure function: wavs (B, C, T) -> list of (B, n_frames, dim)."""
        cfg = self.config
        # only transform the channels the feat_list actually references:
        # dataset batches carry three channels (mixed/clean/noise) but the
        # six-feature bundle reads two — a third of the STFT (the
        # pipeline's single most expensive op) would be dead work the
        # compiler cannot eliminate out of the one fused conv
        used = sorted({int(f.get("channel", 0)) for f in feat_list})
        if len(used) < wavs.shape[1]:
            wavs = wavs[:, tuple(used)]
            remap = {c: i for i, c in enumerate(used)}
        else:
            remap = None
        complx = self.stft_complex(wavs)  # (B, C_used, T', 2F)
        re, im = complx[..., : cfg.n_freq], complx[..., cfg.n_freq :]
        power = re * re + im * im

        # radian phase (arctan2 over the full spectrogram) only when a
        # feat entry asks for it; 'uphase' rides the complx slice for free
        cache: Dict[str, jnp.ndarray] = {
            "complx": complx,
            "linear": power,
            "uphase": complx,
        }

        def base_feat(feat_type: str) -> jnp.ndarray:
            if feat_type in cache:
                return cache[feat_type]
            if feat_type == "phase":
                cache["phase"] = jnp.arctan2(im, re)
            elif feat_type == "mel":
                cache["mel"] = power_to_mel(power, cfg.n_mels, cfg.sample_rate)
            elif feat_type == "mfcc":
                mel = base_feat("mel")
                cache["mfcc"] = mel_to_mfcc(mel, cfg.n_mfcc)
            else:
                raise ValueError(f"unknown feat_type {feat_type}")
            return cache[feat_type]

        outs = []
        for f in feat_list:
            ch = int(f.get("channel", 0))
            if remap is not None:
                ch = remap[ch]
            feat = base_feat(f["feat_type"])[:, ch]
            if f.get("log", False):
                feat = jnp.log(feat + cfg.eps)
            if int(f.get("delta", 0)) > 0:
                parts = [feat]
                for _ in range(int(f["delta"])):
                    parts.append(compute_deltas(parts[-1]))
                feat = jnp.concatenate(parts, axis=-1)
            if f.get("cmvn", False):
                feat = apply_cmvn(feat)
            outs.append(feat)
        return outs

    def __call__(self, wavs=None, feat_list=None):
        feat_list = self.feat_list if feat_list is None else feat_list
        assert feat_list is not None, "no feat_list given"
        if wavs is None:
            max_ch = max(int(f.get("channel", 0)) for f in feat_list)
            wavs = jnp.zeros((1, max_ch + 1, self.config.sample_rate), jnp.float32)
        return self.extract(wavs, feat_list)

    def istft(self, linears=None, phases=None, linear_power: float = 2.0):
        """Waveform reconstruction with (noisy) phase
        (/root/reference/runner.py:266-270)."""
        return _istft(linears, phases, self.config.stft, linear_power=linear_power)

    def feat_dims(self, feat_list=None) -> List[int]:
        feat_list = self.feat_list if feat_list is None else feat_list
        return [feat_dim(f, self.config) for f in feat_list]
