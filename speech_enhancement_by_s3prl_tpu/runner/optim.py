"""Optimizers.

The reference's default optimizer is S3PRL's BertAdam
(``get_optimizer(named_params, lr, warmup_proportion, training_steps)``,
/root/reference/runner.py:109-115; SURVEY.md section 2.9 item 4): Adam
WITHOUT bias correction, decoupled 0.01 weight decay on every parameter
except biases and LayerNorm scales, and a warmup-linear-decay schedule over
``total_step``. Plain Adam(betas=(0.9, 0.999)) is the alternative.

Rebuilt here as optax transforms so the whole update lives inside the
jitted train step.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def warmup_linear_schedule(
    lr: float, warmup_proportion: float, total_steps: int
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr * (x/warmup) while x < warmup else lr * (1-x)/(1-warmup),
    x = step / total_steps (BertAdam's warmup_linear)."""

    def schedule(step):
        x = jnp.asarray(step, jnp.float32) / max(total_steps, 1)
        warm = x / max(warmup_proportion, 1e-8)
        decay = jnp.maximum((1.0 - x) / max(1.0 - warmup_proportion, 1e-8), 0.0)
        return lr * jnp.where(x < warmup_proportion, warm, decay)

    return schedule


def _no_decay(path_tuple) -> bool:
    """bias / LayerNorm params are excluded from weight decay (the
    'no_decay' grouping in S3PRL's get_optimizer)."""
    names = [getattr(k, "key", str(k)) for k in path_tuple]
    flat = "/".join(str(n) for n in names).lower()
    return (
        flat.endswith("bias")
        or "b_ih" in flat
        or "b_hh" in flat
        or "_ln/" in flat
        or flat.endswith("/scale")
        or "layernorm" in flat
    )


def scale_by_bert_adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-6):
    """Adam moments without bias correction (BertAdam semantics)."""

    def init_fn(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        out = jax.tree.map(lambda m, v: m / (jnp.sqrt(v) + eps), mu, nu)
        return out, optax.ScaleByAdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def bert_adam(
    lr: float,
    warmup_proportion: float,
    total_steps: int,
    weight_decay: float = 0.01,
    max_grad_norm: float = None,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-6,
) -> optax.GradientTransformation:
    """Full BertAdam: uncorrected Adam, selective decay, warmup-linear-decay
    schedule. ``max_grad_norm`` defaults to None because the train step
    already global-norm-clips at the configured ``gradient_clipping``
    (trainer.py) — clipping again here would shrink updates whenever the
    already-clipped norm exceeded 1 (and S3PRL's own inner per-parameter
    clip at 1.0 is a no-op after a global clip to <= 1.0)."""

    def decay_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not _no_decay(path), params
        )

    sched = warmup_linear_schedule(lr, warmup_proportion, total_steps)
    chain = [
        scale_by_bert_adam(b1, b2, eps),
        optax.add_decayed_weights(weight_decay, mask=decay_mask),
        # BertAdam evaluates the schedule at the post-increment step count
        # (first update uses x = 1/total, not 0)
        optax.scale_by_schedule(lambda count: sched(count + 1)),
        optax.scale(-1.0),
    ]
    if max_grad_norm is not None and max_grad_norm > 0:
        chain.insert(0, optax.clip_by_global_norm(max_grad_norm))
    return optax.chain(*chain)


def plain_adam(lr: float) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, betas=(0.9, 0.999)) equivalent
    (/root/reference/runner.py:114-115)."""
    return optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)


def build_optimizer(
    name: str, lr: float, warmup_proportion: float = 0.07, total_steps: int = 20000
) -> optax.GradientTransformation:
    if name == "BertAdam":
        return bert_adam(lr, warmup_proportion, total_steps)
    if name == "Adam":
        return plain_adam(lr)
    raise ValueError(f"unknown optimizer {name}")
