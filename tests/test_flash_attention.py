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


def test_batch0_offsets_mask_stream():
    """batch0 shifts the kernel's batch index for mask hashing: scoring
    the tail half of a batch with batch0=offset must reproduce the
    full-batch output exactly (the contract the data-parallel shards
    rely on)."""
    rng = np.random.default_rng(7)
    q, k, v = _mk(rng, B=4, T=45)
    key = jax.random.PRNGKey(9)
    full = flash_attention(q, k, v, 0.25, rate=0.4, rng=key, interpret=True)
    tail = flash_attention(
        q[2:], k[2:], v[2:], 0.25, rate=0.4, rng=key, interpret=True,
        batch0=2,
    )
    np.testing.assert_array_equal(np.asarray(full[2:]), np.asarray(tail))


def test_sharded_matches_single_device():
    """flash_attention_sharded (per-device kernel under shard_map on a
    dp mesh) must match the single-device kernel bitwise in the forward
    — same salt, same absolute-index mask stream — and match grads."""
    from jax.sharding import Mesh

    from speech_enhancement_by_s3prl_tpu.ops.pallas.attention_kernel import (
        flash_attention_sharded,
    )

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    rng = np.random.default_rng(8)
    q, k, v = _mk(rng, B=8, T=37)
    key = jax.random.PRNGKey(13)
    kbias = jnp.asarray(
        np.where(np.arange(37)[None, :] < 30, 0.0, -1e9), jnp.float32
    ).repeat(8, axis=0).reshape(8, 37)

    single = flash_attention(
        q, k, v, 0.25, rate=0.3, rng=key, kbias=kbias, interpret=True
    )
    with mesh:
        sharded = flash_attention_sharded(
            mesh, "data", q, k, v, 0.25, rate=0.3, rng=key, kbias=kbias,
            interpret=True,
        )
    np.testing.assert_array_equal(np.asarray(single), np.asarray(sharded))

    cot = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_single(q, k, v):
        return (flash_attention(
            q, k, v, 0.25, rate=0.3, rng=key, kbias=kbias, interpret=True
        ) * cot).sum()

    def loss_sharded(q, k, v):
        return (flash_attention_sharded(
            mesh, "data", q, k, v, 0.25, rate=0.3, rng=key, kbias=kbias,
            interpret=True,
        ) * cot).sum()

    gs = jax.grad(loss_single, argnums=(0, 1, 2))(q, k, v)
    with mesh:
        gm = jax.grad(loss_sharded, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gs, gm, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, err_msg=f"d{name}"
        )


def test_mockingjay_flash_under_dp_mesh(monkeypatch):
    """The full routing: a Mockingjay train step on a dp mesh with
    SE_ATTN_IMPL=flash goes through flash_attention_sharded (the shard
    context installed by make_parallel_train_step) and its loss matches
    the single-device flash step."""
    import dataclasses

    import __graft_entry__ as graft
    from speech_enhancement_by_s3prl_tpu.models.spec_head import Mockingjay
    from speech_enhancement_by_s3prl_tpu.models.transformer import (
        TransformerConfig,
    )
    from speech_enhancement_by_s3prl_tpu.parallel.mesh import (
        make_mesh,
        make_parallel_train_step,
    )

    monkeypatch.setenv("SE_ATTN_IMPL", "flash")
    base = graft._build(delta=1)
    cfg = TransformerConfig(
        input_dim=80, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.1,
    )
    model = Mockingjay(output_size=201, config=cfg)
    builder = dataclasses.replace(
        base, model=model, from_waveform=True, from_rawfeature=False
    )
    rng = jax.random.PRNGKey(0)
    B, T = 8, 8000
    wavs = jax.random.normal(rng, (B, 3, T), jnp.float32) * 0.1
    lengths = jnp.full((B,), T, jnp.int32)

    state1 = builder.init_state(rng, wavs[:2], lengths[:2])
    single = builder.train_step_fn()

    mesh = make_mesh(8, model_parallel=1)
    state_m = builder.init_state(rng, wavs[:2], lengths[:2])
    step, state_m = make_parallel_train_step(builder, mesh, state_m)

    with mesh:
        for i in range(2):
            k = jax.random.fold_in(rng, i)
            state1, s1 = single(state1, wavs, lengths, k)
            state_m, s2 = step(state_m, wavs, lengths, k)
            np.testing.assert_allclose(
                float(s1["loss"]), float(s2["loss"]), rtol=2e-5
            )
