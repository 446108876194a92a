"""Pallas LSTM kernel parity vs the scan implementation (interpret mode on
CPU; compiled path exercised on TPU by bench/enhance)."""
import numpy as np

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.models.lstm import LSTMStack


def test_pallas_bidir_matches_scan(monkeypatch):
    # batch-blocked variant (the time-major kernel is the default)
    monkeypatch.setenv("SE_PALLAS_TM", "0")
    B, T, D, H = 2, 37, 16, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype=jnp.float32)

    scan_model = LSTMStack(H, num_layers=2, bidirectional=True)
    params = scan_model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(scan_model.apply(params, x))

    pallas_model = LSTMStack(
        H, num_layers=2, bidirectional=True, use_pallas=True,
        pallas_interpret=True,
    )
    out = np.asarray(pallas_model.apply(params, x))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_tm_matches_scan(monkeypatch):
    monkeypatch.setenv("SE_PALLAS_TM", "1")
    B, T, D, H = 3, 29, 16, 8
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype=jnp.float32)
    scan_model = LSTMStack(H, num_layers=2, bidirectional=True)
    params = scan_model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(scan_model.apply(params, x))
    tm = LSTMStack(H, num_layers=2, bidirectional=True, use_pallas=True,
                   pallas_interpret=True)
    out = np.asarray(tm.apply(params, x))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pallas_tm_bf16_out_close_to_scan(monkeypatch):
    # bf16 hidden-state OUT stream (recurrence stays f32 in VMEM): only
    # the inter-layer/output h values are quantized — bound the error by
    # the bf16 quantization budget, not exact parity
    monkeypatch.setenv("SE_PALLAS_TM", "1")
    monkeypatch.setenv("SE_PALLAS_HS_BF16", "1")
    B, T, D, H = 2, 23, 12, 8
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype=jnp.float32)
    scan_model = LSTMStack(H, num_layers=2, bidirectional=True)
    params = scan_model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(scan_model.apply(params, x))
    tm = LSTMStack(H, num_layers=2, bidirectional=True, use_pallas=True,
                   pallas_interpret=True)
    out = np.asarray(tm.apply(params, x))
    np.testing.assert_allclose(out, ref, atol=3e-2)
    assert np.abs(out - ref).mean() < 3e-3


def test_pallas_tm_grad_matches_scan(monkeypatch):
    # custom-VJP backward kernel (reverse-time grid, gate recomputation)
    # vs autodiff through the scan
    monkeypatch.setenv("SE_PALLAS_TM", "1")
    B, T, D, H = 2, 17, 12, 8
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype=jnp.float32)
    scan_model = LSTMStack(H, num_layers=2, bidirectional=True)
    params = scan_model.init(jax.random.PRNGKey(0), x)
    tm = LSTMStack(H, num_layers=2, bidirectional=True, use_pallas=True,
                   pallas_interpret=True)

    def make_loss(m):
        def f(p, xx):
            y = m.apply(p, xx)
            w = jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.01)
            return jnp.sum(jnp.sin(y) * w)
        return f

    g_ref = jax.grad(make_loss(scan_model))(params, x)
    g_tm = jax.grad(make_loss(tm))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_tm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    gx_ref = jax.grad(make_loss(scan_model), argnums=1)(params, x)
    gx_tm = jax.grad(make_loss(tm), argnums=1)(params, x)
    np.testing.assert_allclose(np.asarray(gx_ref), np.asarray(gx_tm),
                               atol=1e-4)


def test_pallas_tm_grad_vjp_bf16_streams(monkeypatch):
    # SE_PALLAS_VJP_BF16: h/c residual + dh cotangent streams stored bf16
    # (recurrent cotangent state stays f32 in VMEM). Quantization enters
    # through the gate-recompute channel only — grads must stay
    # directionally faithful to the f32 scan grads (cosine ~1), not exact.
    monkeypatch.setenv("SE_PALLAS_TM", "1")
    B, T, D, H = 2, 17, 12, 8
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype=jnp.float32)
    scan_model = LSTMStack(H, num_layers=2, bidirectional=True)
    params = scan_model.init(jax.random.PRNGKey(0), x)
    tm = LSTMStack(H, num_layers=2, bidirectional=True, use_pallas=True,
                   pallas_interpret=True)

    def loss(m):
        return lambda p: jnp.sum(jnp.sin(m.apply(p, x)))

    g_ref = jax.grad(loss(scan_model))(params)
    monkeypatch.setenv("SE_PALLAS_VJP_BF16", "1")
    g_tm = jax.grad(loss(tm))(params)

    def flat(t):
        return jnp.concatenate([l.ravel() for l in jax.tree.leaves(t)])

    a, b = flat(g_ref), flat(g_tm)
    cos = float(a @ b / (jnp.linalg.norm(a) * jnp.linalg.norm(b)))
    assert cos > 0.999, cos
    # and the forward primal itself stays f32-dtyped for downstream code
    assert tm.apply(params, x).dtype == jnp.float32


def test_fused_pallas_matches_scan(monkeypatch):
    monkeypatch.setenv("SE_PALLAS_FUSED", "1")
    B, T, D, H = 2, 37, 16, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((B, T, D)), dtype=jnp.float32)
    scan_model = LSTMStack(H, num_layers=2, bidirectional=True)
    params = scan_model.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(scan_model.apply(params, x))
    fused = LSTMStack(H, num_layers=2, bidirectional=True, use_pallas=True,
                      pallas_interpret=True)
    out = np.asarray(fused.apply(params, x))
    np.testing.assert_allclose(out, ref, atol=1e-5)
