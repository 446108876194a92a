"""Pallas LSTM kernel parity vs the scan implementation (interpret mode on
CPU; compiled path exercised on TPU by bench/enhance)."""
import numpy as np

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.models.lstm import LSTMStack


def test_pallas_bidir_matches_scan():
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
