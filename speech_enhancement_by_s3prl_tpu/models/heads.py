"""Downstream enhancement heads.

The reference's five heads (/root/reference/model.py) share one contract:
``model(features, linears) -> (predicted_linear, aux_dict)`` where
``features`` is the downstream input ((B, T, D) upstream hiddens or raw
features) and ``linears`` is the noisy POWER spectrogram (B, T, 201).
Rebuilt here as flax modules with the same hyperparameter vocabulary
(config/vcb.yaml:42-58 'model' section) and torch-default initializers so
training dynamics match.

Registry replaces the reference's ``eval(args.downstream)`` factory
(/root/reference/run_downstream.py:210; SURVEY.md section 2.10).
"""
from __future__ import annotations

import math
import os
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .lstm import LSTMStack

Aux = Dict[str, jnp.ndarray]

ACTIVATIONS: Dict[str, Callable] = {
    "Identity": lambda x: x,
    "ReLU": jax.nn.relu,
    "Sigmoid": jax.nn.sigmoid,
    "Tanh": jnp.tanh,
    "GELU": jax.nn.gelu,
    "LeakyReLU": lambda x: jax.nn.leaky_relu(x, 0.01),
    "ELU": jax.nn.elu,
    "Softplus": jax.nn.softplus,
}


def activation(name: str) -> Callable:
    assert name in ACTIVATIONS, f"unknown activation {name}"
    return ACTIVATIONS[name]


DTYPE_ALIASES = {
    "f32": jnp.float32, "float32": jnp.float32, "fp32": jnp.float32,
    "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
}


def normalize_compute_dtype(value):
    """CLI/YAML dtype vocabulary ('f32' | 'bf16') -> jnp dtype.

    The CLI's ``--compute_dtype`` travels as a string through the args
    namespace (and into checkpoint ``Settings.Paras``, so serving
    surfaces rebuild with the training dtype); module fields want the
    jnp dtype. Dtype-like values pass through untouched."""
    if isinstance(value, str):
        try:
            return DTYPE_ALIASES[value.lower()]
        except KeyError:
            raise ValueError(
                f"unknown compute_dtype {value!r}; use one of "
                f"{sorted(DTYPE_ALIASES)}"
            )
    return value


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch nn.Linear default: kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).
    flax kernels are (in, out); fan_in = shape[0]."""
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_dense(features: int, fan_in: int, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_linear_bias_init(fan_in),
        name=name,
    )


def cmvn_t(x: jnp.ndarray, eps: float) -> jnp.ndarray:
    """Per-utterance time normalization with unbiased std
    (/root/reference/model.py:30,88)."""
    mean = x.mean(axis=1, keepdims=True)
    var = ((x - mean) ** 2).sum(axis=1, keepdims=True) / jnp.maximum(x.shape[1] - 1, 1)
    return (x - mean) / (jnp.sqrt(var) + eps)


class Linear(nn.Module):
    """Direct spectrum regression (/root/reference/model.py:8-17)."""

    input_size: int
    output_size: int
    activation: str = "ReLU"

    @nn.compact
    def __call__(self, features, linears=None, **kwargs) -> Tuple[jnp.ndarray, Aux]:
        predicted = torch_dense(self.output_size, self.input_size, name="linear")(
            features
        )
        return activation(self.activation)(predicted), {}


class LinearResidual(nn.Module):
    """Sigmoid mask times noisy linear, optional input CMVN
    (/root/reference/model.py:20-34)."""

    input_size: int = 201
    output_size: int = 201
    activation: str = "Sigmoid"
    cmvn: bool = True
    eps: float = 1e-6

    @nn.compact
    def __call__(self, features, linears, **kwargs) -> Tuple[jnp.ndarray, Aux]:
        if self.cmvn:
            features = cmvn_t(features, self.eps)
        offset = torch_dense(self.output_size, self.input_size, name="linear")(features)
        offset = activation(self.activation)(offset)
        return linears * offset, {"offset": offset}


class LSTM(nn.Module):
    """LSTM -> scaling layer -> exp: predicts log-magnitude spectrum
    (/root/reference/model.py:37-60). aux carries ``log_predicted``."""

    input_size: int = 201
    output_size: int = 201
    hidden_size: int = 201
    num_layers: int = 3
    bidirectional: bool = False
    activation: str = "Identity"
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    # instruments LSTM layer k — or the whole head with 'all' (every LSTM
    # layer + the scaling Dense) — for the capture scorer
    # (active/sampler.py); None (default) is byte-identical to the
    # uninstrumented model
    capture_layer: Any = None  # None | int | 'all'

    @nn.compact
    def __call__(self, features, linears=None, lstm_state=None,
                 **kwargs) -> Tuple[jnp.ndarray, Aux]:
        stack = LSTMStack(
            self.hidden_size, self.num_layers, self.bidirectional,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
            capture_layer=self.capture_layer,
            name="lstm",
        )
        # streaming continuation (ops/streaming.py StatefulStreamer):
        # lstm_state threads per-layer (h, c) carries through the stack
        # and the final carries ride back in aux["lstm_state"]
        state_out = None
        if lstm_state is not None:
            hs, state_out = stack(
                features, initial_state=lstm_state, return_state=True
            )
        else:
            hs = stack(features)
        out_in = max(1, 2 * int(self.bidirectional)) * self.hidden_size
        log_predicted = nn.Dense(
            self.output_size,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            name="scaling_layer",
        )(hs)
        del out_in
        if self.capture_layer == "all":
            # per-sample grads of the scaling Dense: kernel = x (x) d,
            # bias = sum_t d — from the sowed input and this cotangent
            self.sow("intermediates", "scaling_xs", hs)
            log_predicted = self.perturb("scaling_xw", log_predicted)
        log_predicted = activation(self.activation)(log_predicted)
        aux: Aux = {"log_predicted": log_predicted}
        if state_out is not None:
            aux["lstm_state"] = state_out
        return jnp.exp(log_predicted), aux


class Residual(nn.Module):
    """LSTM mask times noisy linear (/root/reference/model.py:63-91).
    aux carries ``offset`` (consumed by the WSD objective)."""

    input_size: int = 201
    output_size: int = 201
    hidden_size: int = 201
    num_layers: int = 3
    bidirectional: bool = False
    activation: str = "Sigmoid"
    cmvn: bool = False
    eps: float = 1e-6
    compute_dtype: Any = jnp.float32
    use_pallas: bool = False
    capture_layer: Any = None  # None | int | 'all'

    @nn.compact
    def __call__(self, features, linears, lstm_state=None,
                 **kwargs) -> Tuple[jnp.ndarray, Aux]:
        stack = LSTMStack(
            self.hidden_size, self.num_layers, self.bidirectional,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
            capture_layer=self.capture_layer,
            name="lstm",
        )
        state_out = None
        if lstm_state is not None:
            offset, state_out = stack(
                features, initial_state=lstm_state, return_state=True
            )
        else:
            offset = stack(features)
        if self.cmvn:
            offset = cmvn_t(offset, self.eps)
        dense_in = offset
        offset = nn.Dense(
            self.output_size,
            kernel_init=nn.initializers.xavier_uniform(),
            bias_init=nn.initializers.zeros,
            name="scaling_layer",
        )(dense_in)
        if self.capture_layer == "all":
            self.sow("intermediates", "scaling_xs", dense_in)
            offset = self.perturb("scaling_xw", offset)
        offset = activation(self.activation)(offset)
        aux: Aux = {"offset": offset}
        if state_out is not None:
            aux["lstm_state"] = state_out
        return linears * offset, aux


def build_head(model_name: str, input_size: int, output_size: int, **cfg) -> nn.Module:
    """Explicit registry replacing ``eval(args.downstream)``. Extra kwargs
    (the args-namespace soup the reference passes through,
    run_downstream.py:208-210) are filtered to each model's fields; flax's
    reserved `name`/`parent` fields are never taken from config."""
    from .spec_head import Mockingjay, SpecHead  # cycle-free late import

    registry = {
        "Linear": Linear,
        "LinearResidual": LinearResidual,
        "LSTM": LSTM,
        "Residual": Residual,
        "SpecHead": SpecHead,
        "Mockingjay": Mockingjay,
    }
    assert model_name in registry, f"unknown downstream model {model_name}"
    cls = registry[model_name]

    # SE_PALLAS_LSTM=1 selects the Pallas recurrence kernel on every
    # surface that builds a head (serve/enhance/eval/train CLIs) without
    # plumbing a flag through each. The default time-major kernel is
    # differentiable (custom VJP), so this works under jax.grad too;
    # only the SE_PALLAS_TM=0 batch-blocked ablation is forward-only.
    if "use_pallas" not in cfg and os.environ.get("SE_PALLAS_LSTM", "0") == "1":
        cfg = dict(cfg)
        cfg["use_pallas"] = True

    # ckpt-backed heads: module structure (transformer config, log-domain
    # flag, and for Mockingjay the output width) comes from the pretraining
    # checkpoint, exactly as the reference constructors read it
    # (/root/reference/model.py:95-110 SpecHead from args.ckpt;
    # model.py:143-160 Mockingjay from args.dckpt). The pretrained *weights*
    # are overlaid by the Runner at init time via
    # torch_import.pretrained_head_params.
    ckpt_path = (
        cfg.get("dckpt", "") if model_name == "Mockingjay" else cfg.get("ckpt", "")
    )
    if model_name in ("SpecHead", "Mockingjay") and ckpt_path:
        from .torch_import import load_s3prl_checkpoint

        lc = load_s3prl_checkpoint(ckpt_path)
        cfg = dict(cfg)
        cfg["config"] = lc.config
        cfg["log_domain"] = lc.log_domain
        if model_name == "Mockingjay":
            # reference ignores the passed output_dim and uses the
            # pretraining target's width (model.py:152-154)
            output_size = lc.output_size
        elif "spechead" in lc.params:
            head_width = lc.params["spechead"]["output"]["kernel"].shape[1]
            assert head_width == output_size, (
                f"ckpt SpecHead width {head_width} != requested {output_size} "
                "(reference model.py:103 assertion)"
            )
    # the CLI args namespace carries `config` = the YAML *path*; never let
    # that string shadow a model's `config` field (Mockingjay/SpecHead
    # take a TransformerConfig there). A dict from the YAML model section
    # is promoted to TransformerConfig.
    if isinstance(cfg.get("config"), str):
        cfg = dict(cfg)
        cfg.pop("config")
    elif isinstance(cfg.get("config"), dict):
        from .transformer import TransformerConfig

        cfg = dict(cfg)
        cfg["config"] = TransformerConfig(**cfg["config"])
    fields = {f.name for f in cls.__dataclass_fields__.values()}
    fields -= {"name", "parent"}
    kwargs = {k: v for k, v in cfg.items() if k in fields}
    if "compute_dtype" in kwargs:
        kwargs["compute_dtype"] = normalize_compute_dtype(
            kwargs["compute_dtype"]
        )
    if "input_size" in fields:
        kwargs["input_size"] = input_size
    if "output_size" in fields:
        kwargs["output_size"] = output_size
    return cls(**kwargs)
