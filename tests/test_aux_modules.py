"""Direct coverage for the small auxiliary modules: exec-cache keying,
multi-host init wrapper, spectrogram figure helpers."""
import numpy as np


def test_exec_cache_key_varies_with_signature_and_env(tmp_path, monkeypatch):
    """Cache keys must distinguish shapes/dtypes and fn_key — loading an
    executable for the wrong signature would abort the process."""
    import jax.numpy as jnp

    from speech_enhancement_by_s3prl_tpu.ops.pallas import exec_cache

    a = jnp.zeros((2, 3), jnp.float32)
    b = jnp.zeros((2, 4), jnp.float32)
    k1 = exec_cache._key("f", (a,), {})
    assert k1 == exec_cache._key("f", (a,), {})  # deterministic
    assert k1 != exec_cache._key("f", (b,), {})  # shape
    assert k1 != exec_cache._key("f", (a.astype(jnp.bfloat16),), {})  # dtype
    assert k1 != exec_cache._key("g", (a,), {})  # fn identity
    assert k1 != exec_cache._key("f", (), {"x": a})  # tree structure

    monkeypatch.setenv("SE_EXEC_CACHE_DIR", str(tmp_path / "c"))
    assert str(tmp_path / "c") == exec_cache._cache_dir()

    # SE_* knobs shape traced programs (kernel selection, stream dtypes):
    # they must change the key even when the call site's fn_key forgot
    # them (the serve path passes only the checkpoint path)
    monkeypatch.setenv("SE_PALLAS_LSTM", "1")
    k_knob = exec_cache._key("f", (a,), {})
    assert k_knob != k1
    monkeypatch.delenv("SE_PALLAS_LSTM")
    assert exec_cache._key("f", (a,), {}) == k1
    # cache-plumbing variables must NOT miss the cache
    monkeypatch.setenv("SE_EXEC_CACHE", "0")
    assert exec_cache._key("f", (a,), {}) == k1


def test_initialize_distributed_single_process_noop(monkeypatch):
    """Without coordinator env vars this is a documented no-op — the CLI
    calls it unconditionally behind --mesh."""
    from speech_enhancement_by_s3prl_tpu.parallel.distributed import (
        initialize_distributed,
        topology_summary,
    )

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert initialize_distributed() is False

    s = topology_summary()
    assert "process 0/1" in s and "devices" in s


def test_plot_spectrogram_figures():
    from speech_enhancement_by_s3prl_tpu.utils.plotting import (
        plot_spectrogram,
        plot_spectrograms,
    )

    spec = np.abs(np.random.default_rng(0).standard_normal((50, 201))) + 1e-3
    fig = plot_spectrogram(spec)
    assert fig.get_axes()
    figs = plot_spectrograms([spec, spec.T])
    assert figs.get_axes()

    import matplotlib.pyplot as plt

    plt.close("all")


def test_exec_cache_round_trip_and_corrupt_fallback(tmp_path, monkeypatch):
    """compile_cached must (a) compile + save on a cold cache, (b) return a
    working executable on a warm cache (loaded, or transparently recompiled
    when the serialized entry can't load on this host), and (c) recover
    from a corrupt cache entry by recompiling."""
    import jax.numpy as jnp

    from speech_enhancement_by_s3prl_tpu.ops.pallas.exec_cache import (
        compile_cached,
    )

    monkeypatch.setenv("SE_EXEC_CACHE_DIR", str(tmp_path))
    fn = lambda x: x * 2 + 1  # noqa: E731
    a = jnp.arange(8.0)
    want = np.asarray(a) * 2 + 1

    c1 = compile_cached(fn, a, fn_key="rt")
    assert c1 is not None
    np.testing.assert_allclose(np.asarray(c1(a)), want)
    entries = list(tmp_path.glob("*.aot"))
    assert len(entries) == 1, "cold call must persist one entry"

    c2 = compile_cached(fn, a, fn_key="rt")
    np.testing.assert_allclose(np.asarray(c2(a)), want)

    entries[0].write_bytes(b"corrupt")
    c3 = compile_cached(fn, a, fn_key="rt")
    np.testing.assert_allclose(np.asarray(c3(a)), want)
