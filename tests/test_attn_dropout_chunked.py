"""Query-chunked attention-dropout path (models/transformer.py).

Training with live attention dropout previously forced the naive explicit
path, whose (B, N, T, T) probability tensor capped the Mockingjay
finetune batch at 64 (docs/PERF.md). The chunked path computes probs one
query chunk at a time under jax.checkpoint with a per-chunk folded
dropout rng — same Bernoulli process, different (equally valid) mask
stream, no full probs tensor in fwd OR bwd.
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.models.transformer import (
    TransformerConfig,
    TransformerEncoder,
    chunked_dropout_attention,
)


def _qkv(B=2, T=23, N=3, D=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(  # noqa: E731
        rng.standard_normal((B, T, N, D)), jnp.float32
    )
    return mk(), mk(), mk()


def _plain_attention(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def test_rate0_matches_plain_attention():
    q, k, v = _qkv()
    scale = 1.0 / math.sqrt(q.shape[-1])
    ref = _plain_attention(q, k, v, scale)
    # chunk does not divide T=23 -> exercises the padding path too
    out = chunked_dropout_attention(
        q, k, v, None, scale, 0.0, jax.random.PRNGKey(0), 8, jnp.float32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_dropout_statistics_and_determinism():
    q, k, v = _qkv(B=2, T=32, seed=1)
    scale = 1.0 / math.sqrt(q.shape[-1])
    rate = 0.4
    key = jax.random.PRNGKey(3)
    out1 = chunked_dropout_attention(q, k, v, None, scale, rate, key, 16,
                                     jnp.float32)
    out2 = chunked_dropout_attention(q, k, v, None, scale, rate, key, 16,
                                     jnp.float32)
    # same key -> identical (mask stream is fold_in(key, chunk_idx))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = chunked_dropout_attention(q, k, v, None, scale, rate,
                                     jax.random.PRNGKey(4), 16, jnp.float32)
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-4

    # inverted-scaling keeps the expectation: average many keys
    ref = _plain_attention(q, k, v, scale)
    acc = np.zeros_like(np.asarray(ref))
    n = 64
    for i in range(n):
        acc += np.asarray(
            chunked_dropout_attention(q, k, v, None, scale, rate,
                                      jax.random.PRNGKey(100 + i), 16,
                                      jnp.float32)
        )
    err = np.abs(acc / n - np.asarray(ref)).mean() / (
        np.abs(np.asarray(ref)).mean() + 1e-9
    )
    assert err < 0.15, err


def test_grads_flow_and_are_finite():
    q, k, v = _qkv(B=1, T=16, seed=2)
    scale = 1.0 / math.sqrt(q.shape[-1])

    def loss(q, k, v):
        out = chunked_dropout_attention(
            q, k, v, None, scale, 0.2, jax.random.PRNGKey(0), 8, jnp.float32
        )
        return jnp.sum(out**2)

    gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for g in (gq, gk, gv):
        assert bool(jnp.all(jnp.isfinite(g)))
        assert float(jnp.abs(g).max()) > 0.0


def test_hash_dropout_statistics():
    from speech_enhancement_by_s3prl_tpu.models.transformer import (
        hash_dropout,
    )

    x = jnp.ones((8, 5, 97, 64), jnp.float32)
    rate = 0.3
    out = np.asarray(hash_dropout(x, rate, jax.random.PRNGKey(0)))
    # kept entries are scaled 1/keep, dropped are exactly 0
    kept = out > 0
    np.testing.assert_allclose(out[kept], 1.0 / (1.0 - rate), rtol=1e-6)
    # empirical drop fraction ~ rate (n = 2.4M -> very tight)
    frac = 1.0 - kept.mean()
    assert abs(frac - rate) < 0.005, frac
    # per-row balance: no row is systematically skewed (mask must not
    # correlate with position in an obvious way)
    row_frac = 1.0 - kept.reshape(-1, 64).mean(1)
    assert abs(float(row_frac.mean()) - rate) < 0.005
    assert float(row_frac.std()) < 0.09  # binomial std at n=64 is 0.057
    # deterministic in key; different keys differ
    out2 = np.asarray(hash_dropout(x, rate, jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(out, out2)
    out3 = np.asarray(hash_dropout(x, rate, jax.random.PRNGKey(1)))
    assert (out != out3).any()
    # expectation preserved on real data
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((64, 4096)), jnp.float32)
    acc = np.zeros(y.shape, np.float64)
    for i in range(32):
        acc += np.asarray(hash_dropout(y, rate, jax.random.PRNGKey(10 + i)))
    err = np.abs(acc / 32 - np.asarray(y)).mean() / np.abs(np.asarray(y)).mean()
    assert err < 0.2, err
    # rate 0 is the identity, and grads flow
    np.testing.assert_array_equal(
        np.asarray(hash_dropout(y, 0.0, jax.random.PRNGKey(0))), np.asarray(y)
    )
    g = jax.grad(lambda t: hash_dropout(t, rate, jax.random.PRNGKey(2)).sum())(y)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_encoder_attn_dropout_impls_agree_in_distribution(monkeypatch):
    # hash (default) vs flax impl: same Bernoulli process, different
    # stream — both train-mode forwards finite, deterministic path equal
    cfg = TransformerConfig(
        input_dim=12, hidden_size=24, num_hidden_layers=1,
        num_attention_heads=3, intermediate_size=48,
        attention_probs_dropout_prob=0.4, hidden_dropout_prob=0.0,
    )
    enc = TransformerEncoder(cfg)
    rng = np.random.default_rng(8)
    spec = jnp.asarray(rng.standard_normal((2, 21, 12)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), spec)
    monkeypatch.setenv("SE_ATTN_IMPL", "naive")
    monkeypatch.setenv("SE_DROPOUT_IMPL", "hash")  # opt-in on this path
    a = enc.apply(params, spec, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(3)})
    monkeypatch.setenv("SE_DROPOUT_IMPL", "flax")
    b = enc.apply(params, spec, deterministic=False,
                  rngs={"dropout": jax.random.PRNGKey(3)})
    assert bool(jnp.all(jnp.isfinite(a))) and bool(jnp.all(jnp.isfinite(b)))
    assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6  # streams differ


def test_hidden_dropout_hash_impl(monkeypatch):
    # SE_HIDDEN_DROPOUT_IMPL=hash swaps the 13 hidden-state nn.Dropout
    # sites for the fused hash mask: deterministic forwards must be
    # impl-independent, train-mode forwards finite with working grads,
    # and the empirical drop rate must match the configured probability.
    cfg = TransformerConfig(
        input_dim=12, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=3, intermediate_size=48,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.35,
    )
    enc = TransformerEncoder(cfg)
    rng = np.random.default_rng(11)
    spec = jnp.asarray(rng.standard_normal((2, 21, 12)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), spec)

    monkeypatch.setenv("SE_HIDDEN_DROPOUT_IMPL", "hash")
    det_h = enc.apply(params, spec, deterministic=True)
    monkeypatch.setenv("SE_HIDDEN_DROPOUT_IMPL", "flax")
    det_f = enc.apply(params, spec, deterministic=True)
    np.testing.assert_array_equal(np.asarray(det_h), np.asarray(det_f))

    monkeypatch.setenv("SE_HIDDEN_DROPOUT_IMPL", "hash")
    out1 = enc.apply(params, spec, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(5)})
    out2 = enc.apply(params, spec, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(5)})
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    out3 = enc.apply(params, spec, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(6)})
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 1e-6
    assert bool(jnp.all(jnp.isfinite(out1)))

    # drop-rate statistics measured directly at one dropout site: the
    # encoder input dropout feeds the first LayerNorm, so probe the
    # helper itself on a large activation (the module path is already
    # covered by finiteness + determinism above)
    from speech_enhancement_by_s3prl_tpu.models.transformer import (
        hash_dropout,
    )

    big = jnp.ones((64, 1001, 24), jnp.float32)
    kept = np.asarray(hash_dropout(big, 0.35, jax.random.PRNGKey(2))) > 0
    assert abs((1.0 - kept.mean()) - 0.35) < 0.005

    def loss(p):
        out = enc.apply(p, spec, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(9)})
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    flat = jnp.concatenate([l.ravel() for l in jax.tree.leaves(g)])
    assert bool(jnp.all(jnp.isfinite(flat)))
    assert float(jnp.abs(flat).max()) > 0.0


def test_encoder_training_uses_chunked_path(monkeypatch):
    # module-level: a train-mode forward with attention dropout on runs
    # through the chunked path (default) and through the naive path
    # (SE_ATTN_IMPL=naive); both must be finite and differ only by the
    # dropout mask stream (same distribution, different draws)
    cfg = TransformerConfig(
        input_dim=12, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=3, intermediate_size=48,
        attention_probs_dropout_prob=0.3, hidden_dropout_prob=0.0,
    )
    enc = TransformerEncoder(cfg)
    rng = np.random.default_rng(5)
    spec = jnp.asarray(rng.standard_normal((2, 19, 12)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), spec)

    monkeypatch.setenv("SE_ATTN_DROPOUT_CHUNK", "8")
    out_c = enc.apply(params, spec, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(7)})
    monkeypatch.setenv("SE_ATTN_IMPL", "naive")
    out_n = enc.apply(params, spec, deterministic=False,
                      rngs={"dropout": jax.random.PRNGKey(7)})
    assert bool(jnp.all(jnp.isfinite(out_c)))
    assert bool(jnp.all(jnp.isfinite(out_n)))
    assert out_c.shape == out_n.shape
    # with dropout OFF both paths agree exactly on the math
    monkeypatch.delenv("SE_ATTN_IMPL", raising=False)
    cfg0 = TransformerConfig(
        input_dim=12, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=3, intermediate_size=48,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
    )
    enc0 = TransformerEncoder(cfg0)
    a = enc0.apply(params, spec, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(1)})
    b = enc0.apply(params, spec, deterministic=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_encoder_train_grads_with_chunked_dropout(monkeypatch):
    monkeypatch.setenv("SE_ATTN_DROPOUT_CHUNK", "8")
    cfg = TransformerConfig(
        input_dim=12, hidden_size=24, num_hidden_layers=1,
        num_attention_heads=3, intermediate_size=48,
        attention_probs_dropout_prob=0.2, hidden_dropout_prob=0.1,
    )
    enc = TransformerEncoder(cfg)
    rng = np.random.default_rng(6)
    spec = jnp.asarray(rng.standard_normal((2, 17, 12)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), spec)

    def loss(p):
        out = enc.apply(p, spec, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(9)})
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    flat = jnp.concatenate([l.ravel() for l in jax.tree.leaves(g)])
    assert bool(jnp.all(jnp.isfinite(flat)))
    assert float(jnp.abs(flat).max()) > 0.0
