"""Pretrained-head downstream models.

``SpecHead`` wraps a (typically pretrained) spectrogram-prediction head and
``Mockingjay`` wraps the full pretrained encoder + head as a finetunable
downstream model (/root/reference/model.py:94-126, 129-171). Both share the
head contract ``(features, linears) -> (predicted, {'log_predicted': ...})``
and the log-domain convention of the pretraining target: if the checkpoint's
``online.target.log`` flag is set the raw head output is a log-spectrum
(predicted = exp(raw)), else predicted is linear and log_predicted is
``log(raw + eps)`` (/root/reference/model.py:108-125,159-170).

Pretrained weights arrive through ``torch_import.load_s3prl_checkpoint``;
random init is used otherwise (the ``random_init`` escape hatch at
/root/reference/model.py:112-117).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .heads import ACTIVATIONS, Aux, activation
from .transformer import (
    TransformerConfig,
    TransformerEncoder,
    TransformerSpecPredictionHead,
)


class SpecHead(nn.Module):
    """Spec-prediction head as a downstream model."""

    output_size: int = 201
    config: TransformerConfig = None  # type: ignore[assignment]
    log_domain: bool = True
    activation: str = "ReLU"
    eps: float = 1e-6

    @nn.compact
    def __call__(self, features, linears=None, **kwargs) -> Tuple[jnp.ndarray, Aux]:
        cfg = self.config or TransformerConfig()
        raw, _ = TransformerSpecPredictionHead(cfg, self.output_size, name="spechead")(
            features
        )
        if self.log_domain:
            predicted, log_predicted = jnp.exp(raw), raw
        else:
            predicted, log_predicted = raw, jnp.log(raw + self.eps)
        predicted = activation(self.activation)(predicted)
        return predicted, {"log_predicted": log_predicted}


class Mockingjay(nn.Module):
    """Full pretrained transformer + SpecHead as one finetunable downstream
    (/root/reference/model.py:129-171). ``features`` is the upstream-style
    input feature (e.g. 80-dim log-mel+delta)."""

    output_size: int = 201
    config: TransformerConfig = None  # type: ignore[assignment]
    log_domain: bool = True
    activation: str = "ReLU"
    eps: float = 1e-6
    compute_dtype: Any = jnp.float32  # bf16 finetune: f32 LN/accumulation
    # rematerialize encoder layers under autodiff (memory <-> FLOPs):
    # drops the per-layer FFN activation residuals that cap the
    # finetune batch (docs/PERF.md Mockingjay table)
    remat: bool = False

    @nn.compact
    def __call__(
        self, features, linears=None, deterministic=True, **kwargs
    ) -> Tuple[jnp.ndarray, Aux]:
        cfg = self.config or TransformerConfig()
        hidden = TransformerEncoder(
            cfg, compute_dtype=self.compute_dtype, remat=self.remat,
            name="mockingjay",
        )(features, deterministic=deterministic)
        raw, _ = TransformerSpecPredictionHead(cfg, self.output_size, name="spechead")(
            hidden
        )
        if self.log_domain:
            predicted, log_predicted = jnp.exp(raw), raw
        else:
            predicted, log_predicted = raw, jnp.log(raw + self.eps)
        predicted = activation(self.activation)(predicted)
        return predicted, {"log_predicted": log_predicted}
