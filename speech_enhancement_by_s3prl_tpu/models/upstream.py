"""Upstream model wrappers.

The reference builds its upstream through S3PRL's ``TRANSFORMER(options,
inp_dim)`` with an attached ``SpecHead`` (/root/reference/run_downstream.py:
167-192), or an identity ``dummy_upstream`` for the no-SSL baseline. The
rebuild provides the same surface as a bound (module, params) pair:

- ``UpstreamTransformer``: flax encoder (+ spec head) with the reference's
  options vocabulary — no_grad (stop_gradient), dropout override,
  select_layer, weighted_sum, spec_aug;
- ``DummyUpstream``: identity with ``out_dim``;
- both expose ``.out_dim``, are callable on (B, T, feat) and return
  (B, T', hidden) — the contract asserted at run_downstream.py:190-191.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .transformer import (
    TransformerConfig,
    TransformerEncoder,
    TransformerSpecPredictionHead,
)


def apply_spec_aug(
    feat: jnp.ndarray,
    rng,
    time_masks: int = 2,
    time_width: int = 30,
    freq_masks: int = 2,
    freq_width: int = 12,
) -> jnp.ndarray:
    """SpecAugment-style time/frequency masking on (B, T, D) features —
    the upstream 'spec_aug' option (SURVEY.md section 2.9 item 2). Static
    mask counts/widths; positions drawn from `rng` per utterance."""
    B, T, D = feat.shape
    keys = jax.random.split(rng, 4)

    def band_mask(starts, width, size, axis_len):
        pos = jnp.arange(axis_len)[None, None, :]
        s = starts[..., None]
        return ((pos >= s) & (pos < s + width)).any(axis=1)  # (B, axis_len)

    t_starts = jax.random.randint(
        keys[0], (B, time_masks), 0, jnp.maximum(T - time_width, 1)
    )
    f_starts = jax.random.randint(
        keys[1], (B, freq_masks), 0, jnp.maximum(D - freq_width, 1)
    )
    t_mask = band_mask(t_starts, time_width, time_masks, T)  # (B, T)
    f_mask = band_mask(f_starts, freq_width, freq_masks, D)  # (B, D)
    keep = (~t_mask[:, :, None]) & (~f_mask[:, None, :])
    return feat * keep.astype(feat.dtype)


class DummyUpstream:
    """Identity upstream (/root/reference/run_downstream.py:187-188)."""

    def __init__(self, input_dim: int):
        self.out_dim = input_dim
        self.params = {}
        self.trainable = False

    def __call__(self, features, params=None, train=False, rngs=None):
        return features

    def spec_head(self, hidden, params=None):
        raise NotImplementedError("dummy upstream has no SpecHead")


@dataclasses.dataclass
class UpstreamOptions:
    """The options dict of /root/reference/run_downstream.py:170-179."""

    load_pretrain: bool = True
    no_grad: bool = False
    dropout: Optional[float] = None  # None = keep checkpoint dropout
    spec_aug: bool = False
    spec_aug_prev: bool = True
    weighted_sum: bool = False
    select_layer: int = -1


class UpstreamTransformer:
    """Bound transformer upstream with optional spec head.

    ``params`` is a dict with keys 'encoder', optionally 'spechead' and
    (when weighted_sum) 'layer_weights'. ``__call__`` maps input features to
    hidden states; ``spec_head`` maps hidden states to linear spectra —
    together they implement the pseudo-wav path
    (/root/reference/runner.py:273-284).
    """

    def __init__(
        self,
        config: TransformerConfig,
        input_dim: int,
        options: Optional[UpstreamOptions] = None,
        output_size: int = 201,
        params: Optional[Dict[str, Any]] = None,
        seed: int = 0,
        compute_dtype=jnp.float32,
        log_domain: bool = False,
    ):
        self.config = config
        self.options = options or UpstreamOptions()
        if self.options.dropout is not None:
            config = dataclasses.replace(
                config,
                hidden_dropout_prob=float(self.options.dropout),
                attention_probs_dropout_prob=float(self.options.dropout),
            )
            self.config = config
        self.encoder = TransformerEncoder(config, compute_dtype=compute_dtype)
        self.head = TransformerSpecPredictionHead(config, output_size)
        self.out_dim = config.hidden_size
        self.output_size = output_size
        self.input_dim = input_dim

        if params is None:
            key = jax.random.PRNGKey(seed)
            dummy = jnp.zeros((1, 8, input_dim), jnp.float32)
            enc = self.encoder.init({"params": key, "dropout": key}, dummy)["params"]
            hid = jnp.zeros((1, 8, config.hidden_size), jnp.float32)
            head = self.head.init(key, hid)["params"]
            params = {"encoder": enc, "spechead": head}
            if self.options.weighted_sum:
                params["layer_weights"] = jnp.zeros(
                    (config.num_hidden_layers,), jnp.float32
                )
        self.params = params
        self.log_domain = log_domain
        # trainable when a dropout override asks for train-mode finetuning
        # (/root/reference/runner.py:100-107)
        self.trainable = self.options.dropout is not None

    def __call__(self, features, params=None, train=False, rngs=None):
        p = self.params if params is None else params
        opts = self.options
        if opts.spec_aug and train and rngs is not None:
            # spec_aug_prev semantics: mask the input features before the
            # encoder (run_downstream.py:174-175 options)
            features = apply_spec_aug(features, rngs.get("dropout"))
        use_all = opts.weighted_sum or opts.select_layer != -1
        out = self.encoder.apply(
            {"params": p["encoder"]},
            features,
            deterministic=not train,
            output_all_layers=use_all,
            rngs=rngs if train else None,
        )
        if use_all:
            if opts.weighted_sum:
                w = jax.nn.softmax(p["layer_weights"])
                out = jnp.einsum("l...,l->...", out, w)
            else:
                out = out[opts.select_layer]
        if opts.no_grad and not self.trainable:
            out = jax.lax.stop_gradient(out)
        return out

    def spec_head(self, hidden, params=None):
        """Predicted linear POWER spectrum: the attached SpecHead's domain
        handling (/root/reference/model.py:119-125) — exp when the
        pretraining target was log-spectrum, then ReLU so downstream
        sqrt/istft stay finite."""
        p = self.params if params is None else params
        raw, _ = self.head.apply({"params": p["spechead"]}, hidden)
        predicted = jnp.exp(raw) if self.log_domain else raw
        return jax.nn.relu(predicted)


def build_upstream(
    upstream: str,
    input_dim: int,
    ckpt: str = "",
    dropout: Optional[float] = None,
    output_size: int = 201,
    seed: int = 0,
    payload=None,
    compute_dtype=None,
):
    """Factory mirroring ``get_upstream_model``
    (/root/reference/run_downstream.py:167-192): 'transformer' loads/creates
    the encoder (+SpecHead), 'baseline' is the identity. ``payload`` is an
    already-torch.load'ed checkpoint dict for ``ckpt`` — callers that read
    the checkpoint's config first pass it to skip a second disk load.
    ``compute_dtype`` accepts the CLI vocabulary ('f32' | 'bf16') or a jnp
    dtype; None keeps f32 (LN/accumulation stay f32 either way)."""
    from .heads import normalize_compute_dtype

    dt = (
        jnp.float32 if compute_dtype is None
        else normalize_compute_dtype(compute_dtype)
    )
    if upstream == "baseline":
        return DummyUpstream(input_dim)
    assert upstream == "transformer", f"unknown upstream {upstream}"

    if ckpt:
        from .torch_import import load_s3prl_checkpoint

        loaded = load_s3prl_checkpoint(ckpt, payload=payload)
        opts = UpstreamOptions(dropout=dropout)
        return UpstreamTransformer(
            loaded.config,
            input_dim=loaded.input_dim,
            options=opts,
            output_size=loaded.output_size,
            params=loaded.params,
            log_domain=loaded.log_domain,
            compute_dtype=dt,
        )
    config = TransformerConfig(input_dim=input_dim)
    return UpstreamTransformer(
        config, input_dim=input_dim, options=UpstreamOptions(dropout=dropout),
        output_size=output_size, seed=seed, compute_dtype=dt,
    )
