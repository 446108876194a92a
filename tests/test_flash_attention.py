"""Flash-attention Pallas kernel (ops/pallas/attention_kernel.py):
forward/grad parity vs the XLA reference path, padding/bias handling,
and the in-kernel hash-dropout contract (bit-identical mask between
forward and the recomputing backward)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.ops.pallas.attention_kernel import (
    _PHI1,
    _PHI2,
    _PHI3,
    _PHI4,
    flash_attention,
)


def _mk(rng, B=2, T=67, N=3, D=16, dtype=jnp.float32):
    q = jnp.asarray(rng.standard_normal((B, T, N, D)), dtype)
    k = jnp.asarray(rng.standard_normal((B, T, N, D)), dtype)
    v = jnp.asarray(rng.standard_normal((B, T, N, D)), dtype)
    return q, k, v


def _ref(q, k, v, scale, kbias=None, keep_mask=None, rate=0.0):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if kbias is not None:
        logits = logits + kbias[:, None, None, :]
    p = jax.nn.softmax(logits, axis=-1)
    if keep_mask is not None:
        p = jnp.where(keep_mask, p / (1.0 - rate), 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def test_forward_matches_reference_no_dropout():
    rng = np.random.default_rng(0)
    q, k, v = _mk(rng)
    scale = 0.25
    out = flash_attention(q, k, v, scale, interpret=True)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_forward_with_key_bias_and_odd_length():
    """T=67 pads to 128 in-kernel; padded keys must be invisible, and the
    (B, T) additive key bias (the padded-frame attention mask shape)
    must land on the logits."""
    rng = np.random.default_rng(1)
    q, k, v = _mk(rng, T=67)
    kbias = jnp.asarray(
        np.where(np.arange(67)[None, :] < 50, 0.0, -1e9), jnp.float32
    ).repeat(2, axis=0).reshape(2, 67)
    out = flash_attention(q, k, v, 0.25, kbias=kbias, interpret=True)
    ref = _ref(q, k, v, 0.25, kbias=kbias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_grads_match_reference_no_dropout():
    rng = np.random.default_rng(2)
    q, k, v = _mk(rng, T=40)
    cot = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, 0.25, interpret=True) * cot).sum()

    def loss_ref(q, k, v):
        return (_ref(q, k, v, 0.25) * cot).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5, err_msg=f"d{name}"
        )


def _host_mask(salt, B, N, Tq, Tp, rate):
    """The kernel's hash mask reconstructed on host (same math, numpy)."""
    keep = 1.0 - rate
    thresh = np.uint32(min(int(keep * 4294967296.0), 4294967295))
    qi = np.arange(Tp, dtype=np.uint32)[:, None]
    ki = np.arange(Tp, dtype=np.uint32)[None, :]
    masks = np.zeros((B, N, Tp, Tp), bool)
    with np.errstate(over="ignore"):
        for b in range(B):
            for n in range(N):
                bn = np.uint32(b * N + n)
                h = (qi * np.uint32(_PHI1)) ^ (ki * np.uint32(_PHI2)) \
                    ^ bn * np.uint32(_PHI4) ^ np.uint32(salt[0])
                h ^= h >> np.uint32(16)
                h *= np.uint32(_PHI3)
                h ^= h >> np.uint32(13)
                h ^= np.uint32(salt[1])
                h *= np.uint32(_PHI1)
                h ^= h >> np.uint32(16)
                masks[b, n] = h < thresh
    return jnp.asarray(masks[:, :, :Tq, :Tq])


def test_dropout_forward_matches_reconstructed_mask():
    """rate>0: the kernel's output equals the explicit-probs reference
    using the SAME mask, reconstructed on host from the salt."""
    rng = np.random.default_rng(3)
    q, k, v = _mk(rng, T=50)
    rate = 0.3
    key = jax.random.PRNGKey(7)
    out = flash_attention(q, k, v, 0.25, rate=rate, rng=key, interpret=True)

    salt = np.asarray(jax.random.bits(key, (1, 2), jnp.uint32))[0]
    mask = _host_mask(salt, 2, 3, 50, 128, rate)
    ref = _ref(q, k, v, 0.25, keep_mask=mask, rate=rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
    # and the keep fraction is plausible
    frac = float(np.asarray(mask).mean())
    assert abs(frac - (1 - rate)) < 0.02, frac


def test_dropout_grads_match_reconstructed_mask():
    """The backward recomputes the mask from the 8-byte salt: grads must
    equal the explicit-probs reference using the same constant mask —
    the fwd/bwd mask-consistency proof."""
    rng = np.random.default_rng(4)
    q, k, v = _mk(rng, T=33)
    rate = 0.25
    key = jax.random.PRNGKey(11)
    salt = np.asarray(jax.random.bits(key, (1, 2), jnp.uint32))[0]
    mask = _host_mask(salt, 2, 3, 33, 128, rate)
    cot = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_flash(q, k, v):
        return (flash_attention(
            q, k, v, 0.25, rate=rate, rng=key, interpret=True
        ) * cot).sum()

    def loss_ref(q, k, v):
        return (_ref(q, k, v, 0.25, keep_mask=mask, rate=rate) * cot).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=f"d{name}"
        )


def test_deterministic_in_rng():
    rng = np.random.default_rng(5)
    q, k, v = _mk(rng, T=20)
    key = jax.random.PRNGKey(3)
    a = flash_attention(q, k, v, 0.25, rate=0.5, rng=key, interpret=True)
    b = flash_attention(q, k, v, 0.25, rate=0.5, rng=key, interpret=True)
    assert np.array_equal(np.asarray(a), np.asarray(b))
    c = flash_attention(q, k, v, 0.25, rate=0.5,
                        rng=jax.random.PRNGKey(4), interpret=True)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_bf16_inputs():
    rng = np.random.default_rng(6)
    q, k, v = _mk(rng, T=40, dtype=jnp.bfloat16)
    out = flash_attention(q, k, v, 0.25, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _ref(q, k, v, 0.25)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
    )


def test_transformer_flash_routing(monkeypatch):
    """SE_ATTN_IMPL=flash routes SelfAttention through the kernel: exact
    equality with the fused path when dropout is off, and a running,
    finite, deterministic-in-rng path when attention dropout is live."""
    import flax.linen as nn

    from speech_enhancement_by_s3prl_tpu.models.transformer import (
        TransformerConfig,
        TransformerEncoder,
    )

    cfg = TransformerConfig(
        input_dim=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.1,
    )
    enc = TransformerEncoder(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 37, 16), jnp.float32)
    p = enc.init({"params": rng, "dropout": rng}, x)["params"]

    monkeypatch.delenv("SE_ATTN_IMPL", raising=False)
    ref = enc.apply({"params": p}, x, deterministic=True)
    monkeypatch.setenv("SE_ATTN_IMPL", "flash")
    got = enc.apply({"params": p}, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)

    # dropout live: runs, finite, deterministic in the dropout rng
    d1 = enc.apply({"params": p}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(5)})
    d2 = enc.apply({"params": p}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(5)})
    d3 = enc.apply({"params": p}, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(6)})
    assert np.isfinite(np.asarray(d1)).all()
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert not np.array_equal(np.asarray(d1), np.asarray(d3))
    del nn
