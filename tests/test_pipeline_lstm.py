"""Wavefront pipeline-parallel LSTM vs the scan stack (4-way 'pipe' mesh
on the virtual CPU devices)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from speech_enhancement_by_s3prl_tpu.models.lstm import LSTMStack
from speech_enhancement_by_s3prl_tpu.parallel.pipeline import (
    pipeline_lstm,
    stack_lstm_params,
)


def test_pipeline_matches_scan_stack():
    L, B, T, H = 4, 2, 64, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, H)), dtype=jnp.float32)

    model = LSTMStack(H, num_layers=L, bidirectional=False)
    params = model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(model.apply(params, x))

    mesh = Mesh(np.array(jax.devices()[:L]), axis_names=("pipe",))
    stacked = stack_lstm_params(params, L)
    out = np.asarray(pipeline_lstm(x, stacked, mesh, n_chunks=8))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_pipeline_single_chunk_degenerate():
    L, B, T, H = 2, 1, 16, 4
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, H)), dtype=jnp.float32)
    model = LSTMStack(H, num_layers=L, bidirectional=False)
    params = model.init(jax.random.PRNGKey(1), x)
    ref = np.asarray(model.apply(params, x))
    mesh = Mesh(np.array(jax.devices()[:L]), axis_names=("pipe",))
    out = np.asarray(
        pipeline_lstm(x, stack_lstm_params(params, L), mesh, n_chunks=1)
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)
