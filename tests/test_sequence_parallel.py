"""Sequence-parallel encoder: shard_map over ('data','seq') reproduces the
single-device TransformerEncoder (gathered-KV attention + offset position
encodings only repartition the same computation)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_enhancement_by_s3prl_tpu.models.transformer import (
    TransformerConfig,
    TransformerEncoder,
)
from speech_enhancement_by_s3prl_tpu.parallel.sequence import (
    make_seq_mesh,
    pad_frames_for_seq,
    sequence_parallel_encoder,
)


def small_cfg(**kw):
    return TransformerConfig(
        input_dim=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0, **kw
    )


@pytest.mark.parametrize("data,seq", [(2, 4), (4, 2), (1, 8)])
def test_sequence_parallel_matches_single_device(data, seq):
    cfg = small_cfg()
    enc = TransformerEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    spec = jax.random.normal(jax.random.PRNGKey(1), (4, 40, 16), jnp.float32)
    params = enc.init({"params": rng, "dropout": rng}, spec)["params"]

    ref = enc.apply({"params": params}, spec, deterministic=True)

    mesh = make_seq_mesh(data * seq, seq_parallel=seq)
    fn = sequence_parallel_encoder(enc, mesh)
    out = fn(params, spec)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sequence_parallel_with_downsample_rate():
    cfg = small_cfg(downsample_rate=2)
    enc = TransformerEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    spec = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 16), jnp.float32)
    params = enc.init({"params": rng, "dropout": rng}, spec)["params"]

    ref = enc.apply({"params": params}, spec, deterministic=True)
    mesh = make_seq_mesh(4, seq_parallel=4)  # 48 frames / (4*2) = 6 per shard
    fn = sequence_parallel_encoder(enc, mesh)
    out = fn(params, spec)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pad_frames_helper():
    spec = jnp.ones((2, 37, 16))
    padded, t = pad_frames_for_seq(spec, seq=4, dr=2)
    assert t == 37 and padded.shape[1] == 40
    already = jnp.ones((2, 40, 16))
    same, t2 = pad_frames_for_seq(already, seq=4, dr=2)
    assert same.shape[1] == 40 and t2 == 40


def test_sequence_parallel_rejects_indivisible_time():
    cfg = small_cfg()
    enc = TransformerEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    spec = jax.random.normal(jax.random.PRNGKey(3), (2, 42, 16), jnp.float32)
    params = enc.init({"params": rng, "dropout": rng}, spec)["params"]
    mesh = make_seq_mesh(4, seq_parallel=4)
    fn = sequence_parallel_encoder(enc, mesh)
    with pytest.raises(AssertionError):
        fn(params, spec)
