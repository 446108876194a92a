"""Compiled train/eval steps.

The reference's hot loop (/root/reference/runner.py:361-511) runs
preprocess → forward → loss → backward → clip → step as separate torch
calls with host round-trips; here the ENTIRE step — STFT feature
extraction, upstream/head forward, objective, backward, global-norm clip,
non-finite-guard and optimizer update — is one XLA program per duration
bucket, jitted with donated buffers. Eval similarly fuses forward, iSTFT
decode, level renorm, loss and the on-device metrics into one program.

The reference's NaN/Inf grad-norm guard (runner.py:467-471: skip the
update, keep going) becomes a ``jnp.where`` on the update, so it costs
nothing and stays on device.

Data parallelism (absent in the reference — SURVEY.md parallelism
inventory) is layered on by ``parallel/mesh.py`` via sharding constraints
on the batch dimension; the step functions here are sharding-agnostic.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..metrics import batch_scores
from ..ops.audio import length_masks, masked_normalize_decibel


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return (self.params, self.opt_state, self.step), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState, TrainState.tree_flatten, TrainState.tree_unflatten
)


def make_context(
    preprocessor,
    wavs: jnp.ndarray,
    lengths: jnp.ndarray,
    channel_inp: int,
    channel_tar: int,
) -> Dict[str, jnp.ndarray]:
    """Extract the six-feature bundle and assemble the objective context
    (the typed replacement for ``remove_self(locals())``,
    /root/reference/runner.py:433-458; SURVEY.md section 7 item 3)."""
    feats = preprocessor(wavs)
    (
        feats_for_upstream,
        feats_for_downstream,
        linear_inp,
        phase_inp,
        linear_tar,
        phase_tar,
    ) = feats

    hop = preprocessor._win_args["hop_length"]
    stft_lengths = lengths // hop + 1
    stft_masks = length_masks(stft_lengths, linear_inp.shape[1])

    return {
        "wavs": wavs,
        "lengths": lengths,
        "feats_for_upstream": feats_for_upstream,
        "feats_for_downstream": feats_for_downstream,
        "linear_inp": linear_inp,
        "phase_inp": phase_inp,
        "linear_tar": linear_tar,
        "phase_tar": phase_tar,
        "stft_lengths": stft_lengths,
        "stft_length_masks": stft_masks,
        "wav_inp": wavs[:, channel_inp, :],
        "wav_tar": wavs[:, channel_tar, :],
    }


@dataclasses.dataclass
class StepBuilder:
    """Closes over all static configuration and builds jitted step fns."""

    preprocessor: Any
    model: Any                      # flax module (downstream head)
    objective: Any                  # callable(**ctx) -> (loss, aux)
    optimizer: optax.GradientTransformation
    upstream: Any = None            # bound upstream (UpstreamTransformer/Dummy)
    from_waveform: bool = False
    from_rawfeature: bool = True
    channel_inp: int = 0
    channel_tar: int = 1
    grad_clip: float = 1.0
    eval_metrics: Tuple[str, ...] = ("sisdr",)
    sample_rate: int = 16000
    donate: bool = True

    # -- shared forward ------------------------------------------------
    def upstream_params(self):
        """Frozen upstream weights, threaded through the jitted steps as an
        explicit argument — closing over a 100 MB parameter tree would bake
        it into every compiled executable as constants."""
        return getattr(self.upstream, "params", None) if self.upstream else None

    def _down_inp(self, ctx, up_params=None, train=False, rngs=None):
        if self.from_waveform:
            # the reference hands raw waveforms to a transformer that runs
            # its own internal feature extraction
            # (/root/reference/runner.py:447-449); here the feature engine
            # is already fused into the step, so the model receives the
            # same upstream-input features that internal extraction would
            # have produced
            return ctx["feats_for_upstream"]
        if self.from_rawfeature:
            return ctx["feats_for_downstream"]
        assert self.upstream is not None, "--from_* unset requires an upstream"
        # --dropout puts the upstream in train mode during training
        # (/root/reference/runner.py:100-107): dropout/spec_aug are live in
        # the compiled train step only when the override made it trainable
        up_train = bool(train and getattr(self.upstream, "trainable", False))
        kwargs = {"train": up_train, "rngs": rngs if up_train else None}
        if up_params is not None and len(jax.tree.leaves(up_params)):
            return self.upstream(
                ctx["feats_for_upstream"], params=up_params, **kwargs
            )
        return self.upstream(ctx["feats_for_upstream"], **kwargs)

    def _forward(self, params, ctx, train: bool, rngs=None, up_params=None):
        down_inp = self._down_inp(ctx, up_params, train=train, rngs=rngs)
        kwargs = {"deterministic": not train}  # dropout-bearing heads
        if rngs is not None:
            kwargs["rngs"] = rngs
        predicted, aux = self.model.apply(
            params, features=down_inp, linears=ctx["linear_inp"], **kwargs
        )
        return predicted, aux

    def loss_fn(self, params, ctx, rngs=None, up_params=None):
        predicted, aux = self._forward(
            params, ctx, train=True, rngs=rngs, up_params=up_params
        )
        full_ctx = {**ctx, "predicted": predicted, **aux}
        loss, obj_aux = self.objective(**full_ctx)
        return loss, (predicted, aux, obj_aux)

    # -- train ----------------------------------------------------------
    def train_step_raw(self):
        """The unjitted step — parallel/mesh.py jits it once with explicit
        shardings (no nested jit)."""

        def step(state: TrainState, wavs, lengths, rng, up_params):
            ctx = make_context(
                self.preprocessor, wavs, lengths, self.channel_inp, self.channel_tar
            )
            rngs = {"dropout": jax.random.fold_in(rng, state.step)}
            (loss, _), grads = jax.value_and_grad(self.loss_fn, has_aux=True)(
                state.params, ctx, rngs, up_params
            )
            grad_norm = optax.global_norm(grads)
            # grad clip happens inside the optimizer chain (BertAdam) OR here
            # for plain Adam; replicate the reference's pre-step global clip
            # (/root/reference/runner.py:463-464)
            scale = jnp.minimum(1.0, self.grad_clip / (grad_norm + 1e-6))
            grads = jax.tree.map(lambda g: g * scale, grads)

            updates, new_opt = self.optimizer.update(
                grads, state.opt_state, state.params
            )
            # non-finite guard: skip the update, keep the step counter
            # (/root/reference/runner.py:467-471)
            ok = jnp.isfinite(grad_norm)
            new_params = jax.tree.map(
                lambda p, u: jnp.where(ok, p + u, p), state.params, updates
            )
            new_opt = jax.tree.map(
                lambda new, old: jnp.where(ok, new, old), new_opt, state.opt_state
            )
            new_state = TrainState(new_params, new_opt, state.step + 1)
            return new_state, {"loss": loss, "grad_norm": grad_norm, "skipped": ~ok}

        return step

    def train_step_fn(self):
        donate = (0,) if self.donate else ()
        jitted = jax.jit(self.train_step_raw(), donate_argnums=donate)
        up = self.upstream_params()

        def wrapped(state, wavs, lengths, rng):
            return jitted(state, wavs, lengths, rng, up)

        return wrapped

    # -- eval -----------------------------------------------------------
    def decode_wav(self, predicted, phase_inp, lengths, max_len, target_level):
        """iSTFT + zero-pad to max_len + renorm to target level
        (/root/reference/runner.py:266-270)."""
        wav = self.preprocessor.istft(predicted, phase_inp)
        pad = max_len - wav.shape[-1]
        if pad > 0:
            wav = jnp.pad(wav, ((0, 0), (0, pad)))
        else:
            wav = wav[:, :max_len]
        masks = length_masks(lengths, max_len)
        return masked_normalize_decibel(wav, target_level, masks)

    def eval_step_raw(self, wav_out: str = "full"):
        """The unjitted eval step — parallel/mesh.py jits it with the batch
        sharded over the whole mesh for multi-chip eval/serving.

        wav_out='first' returns only utterance 0 of the noisy/clean/
        enhanced waveforms — all the runner's media logging reads when
        every metric scores on device. Dropping the other B-1 rows frees
        three full-batch (B, T) output buffers (~1.5 GB at B=768 x 10 s),
        raising the eval batch ceiling (docs/PERF.md eval table)."""

        def step(params, wavs, lengths, up_params):
            ctx = make_context(
                self.preprocessor, wavs, lengths, self.channel_inp, self.channel_tar
            )
            predicted, aux = self._forward(
                params, ctx, train=False, up_params=up_params
            )
            max_len = wavs.shape[-1]
            wav_predicted = self.decode_wav(
                predicted, ctx["phase_inp"], lengths, max_len, ctx["wav_tar"]
            )
            masks = length_masks(lengths, max_len)
            full_ctx = {
                **ctx,
                "predicted": predicted,
                **aux,
                "wav_predicted": wav_predicted,
                "length_masks": masks,
            }
            loss, _ = self.objective(**full_ctx)
            scores = batch_scores(
                self.eval_metrics, wav_predicted, ctx["wav_tar"], lengths,
                self.sample_rate,
            )
            keep = (lambda w: w[:1]) if wav_out == "first" else (lambda w: w)
            return {
                "loss": loss,
                "scores": scores,
                "wav_predicted": keep(wav_predicted),
                "wav_inp": keep(ctx["wav_inp"]),
                "wav_tar": keep(ctx["wav_tar"]),
            }

        return step

    def eval_step_fn(self, wav_out: str = "full"):
        jitted = jax.jit(self.eval_step_raw(wav_out))
        up = self.upstream_params()

        def wrapped(params, wavs, lengths):
            return jitted(params, wavs, lengths, up)

        return wrapped

    # -- state ----------------------------------------------------------
    def init_state(self, rng, example_wavs, example_lengths) -> TrainState:
        ctx = make_context(
            self.preprocessor, example_wavs, example_lengths,
            self.channel_inp, self.channel_tar,
        )
        down_inp = self._down_inp(ctx, self.upstream_params())
        params = self.model.init(
            {"params": rng, "dropout": rng},
            features=down_inp, linears=ctx["linear_inp"],
        )
        opt_state = self.optimizer.init(params)
        return TrainState(params, opt_state, jnp.zeros([], jnp.int32))
