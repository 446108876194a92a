"""Capture-based per-sample gradient scoring (active/sampler.py
``impl='capture'``).

The capture scorer reconstructs per-sample layer gradients from ONE
batched backward (gate cotangents via a zero perturbation, models/lstm.py
``capture_layer``) instead of ``vmap(grad)``. The embeddings equal the
vmap ones up to a positive per-sample scale (the objective's batch
reduction weights), so every cosine-derived quantity — the match scores
that drive buffer admission (/root/reference/sampler.py:113-120) — is
preserved. These tests pin that contract.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from speech_enhancement_by_s3prl_tpu.active.sampler import (
    make_scoring_fn,
    matching,
)
from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.objectives import build_objective
from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.runner.trainer import StepBuilder


def small_builder(objective="L1", **head_cfg):
    feat_list = [get_feat_config("linear", 0)] * 3 + [
        get_feat_config("phase", 0),
        get_feat_config("linear", 1),
        get_feat_config("phase", 1),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    cfg = dict(hidden_size=8, num_layers=2, bidirectional=True)
    cfg.update(head_cfg)
    model = build_head("LSTM", input_size=201, output_size=201, **cfg)
    return StepBuilder(
        preprocessor=pre, model=model, objective=build_objective(objective),
        optimizer=optax.adam(1e-3),
    )


def batch():
    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal((3, 3, 8000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 6000, 4000])
    return wavs, lengths


@pytest.mark.parametrize("layerid", [0, 1, None])
@pytest.mark.parametrize("objective", ["L1", "SISDR"])
def test_capture_matches_vmap_up_to_sample_scale(objective, layerid):
    # layerid=None exercises the whole-tree path (every LSTM layer + the
    # scaling Dense instrumented), the reference's default embedding
    sb = small_builder(objective)
    wavs, lengths = batch()
    state = sb.init_state(jax.random.PRNGKey(0), wavs, lengths)

    ev = np.asarray(
        make_scoring_fn(sb, layerid, impl="vmap")(state.params, wavs, lengths)
    )
    ec = np.asarray(
        make_scoring_fn(sb, layerid, impl="capture")(state.params, wavs, lengths)
    )
    assert ec.shape == ev.shape

    # each row differs by ONE positive scalar (the objective's per-sample
    # batch-reduction weight): constant ratio over coordinates
    for i in range(ev.shape[0]):
        m = np.abs(ev[i]) > 1e-8
        r = ec[i][m] / ev[i][m]
        assert r.mean() > 0
        assert r.std() / abs(r.mean()) < 1e-3, (i, r.std(), r.mean())

    # cosine matching against the (shared) query-side mean gradient is
    # what admission thresholds consume — must agree to float precision
    q = jnp.asarray(
        make_scoring_fn(sb, layerid, impl="vmap")(
            state.params, wavs, lengths, mean=True
        )
    )
    mv = np.asarray(matching(q, jnp.asarray(ev)))
    mc = np.asarray(matching(q, jnp.asarray(ec)))
    np.testing.assert_allclose(mv, mc, atol=1e-5)


def test_capture_composes_with_pallas_kernel(monkeypatch):
    """The whole point of the capture path: the recurrence runs batched, so
    SE_PALLAS_LSTM=1 (interpret-mode on CPU) composes with scoring — the
    differentiable kernel's dxw IS the captured gate cotangent."""
    monkeypatch.setenv("SE_PALLAS_LSTM", "1")
    sb_k = small_builder(num_layers=1)
    assert sb_k.model.use_pallas
    monkeypatch.delenv("SE_PALLAS_LSTM")
    sb_s = small_builder(num_layers=1)

    rng = np.random.default_rng(1)
    wavs = jnp.asarray(rng.standard_normal((2, 3, 2000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([2000, 1600])
    state = sb_s.init_state(jax.random.PRNGKey(0), wavs, lengths)

    es = np.asarray(
        make_scoring_fn(sb_s, 0, impl="capture")(state.params, wavs, lengths)
    )
    ek = np.asarray(
        make_scoring_fn(sb_k, 0, impl="capture")(state.params, wavs, lengths)
    )
    # same math through kernel vs scan; tolerance covers fp reordering
    cos = (es * ek).sum(1) / (
        np.linalg.norm(es, axis=1) * np.linalg.norm(ek, axis=1)
    )
    np.testing.assert_allclose(cos, 1.0, atol=1e-5)


def test_capture_falls_back_when_unsupported():
    wavs, lengths = batch()
    # unidirectional heads are unsupported -> fallback, still bit-equal
    sb_u = small_builder(bidirectional=False)
    state_u = sb_u.init_state(jax.random.PRNGKey(0), wavs, lengths)
    f_u = make_scoring_fn(sb_u, 0, impl="capture")
    ref_u = make_scoring_fn(sb_u, 0, impl="vmap")
    np.testing.assert_allclose(
        np.asarray(f_u(state_u.params, wavs, lengths)),
        np.asarray(ref_u(state_u.params, wavs, lengths)),
        atol=0,
    )


def test_env_knob_selects_impl(monkeypatch):
    """SE_SCORE_IMPL=capture routes the CLI scoring surfaces without code
    changes (runner.py passes impl=None)."""
    sb = small_builder()
    wavs, lengths = batch()
    state = sb.init_state(jax.random.PRNGKey(0), wavs, lengths)
    monkeypatch.setenv("SE_SCORE_IMPL", "capture")
    f_env = make_scoring_fn(sb, 0)
    e_env = np.asarray(f_env(state.params, wavs, lengths))
    e_cap = np.asarray(
        make_scoring_fn(sb, 0, impl="capture")(state.params, wavs, lengths)
    )
    np.testing.assert_allclose(e_env, e_cap, atol=0)
