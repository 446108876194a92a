"""Mesh parallelism: the dp x tp sharded train step must reproduce
single-device numerics (sharding partitions the same computation), run on
the 8 virtual CPU devices provided by conftest."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.objectives import build_objective
from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.parallel.mesh import (
    make_mesh,
    make_parallel_train_step,
    param_shardings,
)
from speech_enhancement_by_s3prl_tpu.runner.optim import build_optimizer
from speech_enhancement_by_s3prl_tpu.runner.trainer import StepBuilder


def tiny_builder():
    feat_list = [
        get_feat_config("mel", 0, log=True, delta=1, cmvn=True),
        get_feat_config("mel", 0, log=True, delta=1, cmvn=False),
        get_feat_config("linear", 0),
        get_feat_config("phase", 0),
        get_feat_config("linear", 1),
        get_feat_config("phase", 1),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    pre.channel_inp, pre.channel_tar = 0, 1
    model = build_head(
        "Residual", input_size=80, output_size=201, hidden_size=16,
        num_layers=1, bidirectional=True, cmvn=False,
    )
    return StepBuilder(
        preprocessor=pre,
        model=model,
        objective=build_objective("SISDR"),
        optimizer=build_optimizer("BertAdam", 1e-3, 0.07, 100),
        from_rawfeature=True,
        eval_metrics=("sisdr",),
        donate=False,
    )


def test_devices_available():
    assert len(jax.devices()) == 8


def test_parallel_step_matches_single_device():
    builder = tiny_builder()
    rng = jax.random.PRNGKey(0)
    B, T = 8, 8000
    wavs = jax.random.normal(rng, (B, 3, T), jnp.float32) * 0.1
    lengths = jnp.full((B,), T, jnp.int32)
    state0 = builder.init_state(rng, wavs, lengths)

    # single device
    single = builder.train_step_fn()
    s1, stats1 = single(state0, wavs, lengths, rng)

    # 4x2 mesh
    mesh = make_mesh(8, model_parallel=2)
    state_m = builder.init_state(rng, wavs, lengths)
    step, state_m = make_parallel_train_step(builder, mesh, state_m)
    with mesh:
        s2, stats2 = step(state_m, wavs, lengths, rng)

    np.testing.assert_allclose(
        float(stats1["loss"]), float(stats2["loss"]), rtol=1e-5
    )
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(jax.device_get(s2.params))
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_param_shardings_divisibility_guard():
    builder = tiny_builder()
    rng = jax.random.PRNGKey(0)
    wavs = jnp.zeros((2, 3, 8000), jnp.float32)
    lengths = jnp.full((2,), 8000, jnp.int32)
    state = builder.init_state(rng, wavs, lengths)
    mesh = make_mesh(8, model_parallel=2)
    sh = param_shardings(mesh, state.params)
    # every leaf got a NamedSharding
    assert all(s is not None for s in jax.tree.leaves(sh))

    # hidden 16 divides 2: lstm gate dims sharded on 'model'
    flat = jax.tree_util.tree_flatten_with_path(sh)[0]
    lstm_shardings = [
        s for path, s in flat if "w_hh" in "/".join(str(p) for p in path)
    ]
    assert any("model" in str(s.spec) for s in lstm_shardings)


def test_mesh_eval_with_metric_chunking(monkeypatch):
    """SE_METRIC_CHUNK composes with mesh-sharded eval: the lax.map over
    metric sub-batches runs inside the GSPMD-sharded program (resharding
    is transparent) and scores stay identical."""
    from speech_enhancement_by_s3prl_tpu.parallel.mesh import (
        make_parallel_eval_step,
    )

    builder = tiny_builder()
    rng = jax.random.PRNGKey(0)
    B, T = 8, 8000
    wavs = jax.random.normal(rng, (B, 3, T), jnp.float32) * 0.1
    lengths = jnp.full((B,), T, jnp.int32)
    state = builder.init_state(rng, wavs, lengths)
    mesh = make_mesh(8, model_parallel=2)

    monkeypatch.delenv("SE_METRIC_CHUNK", raising=False)
    ref_step = make_parallel_eval_step(builder, mesh)
    with mesh:
        ref = np.asarray(
            ref_step(state.params, wavs, lengths)["scores"]["sisdr"]
        )

    monkeypatch.setenv("SE_METRIC_CHUNK", "2")
    chunk_step = make_parallel_eval_step(builder, mesh)
    with mesh:
        got = np.asarray(
            chunk_step(state.params, wavs, lengths)["scores"]["sisdr"]
        )
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pallas_mesh_routing(monkeypatch):
    """Mesh builders keep a use_pallas model on a dp-only mesh (the
    kernel runs per device under shard_map), swap to the scan twin under
    tensor parallelism (W_hh gates are 'model'-sharded) or explicit
    SE_PALLAS_MESH=0 opt-out — loudly in both fallback cases."""
    import dataclasses
    import warnings

    from speech_enhancement_by_s3prl_tpu.parallel.mesh import (
        _mesh_safe_builder,
    )

    base = tiny_builder()
    model = build_head(
        "Residual", input_size=80, output_size=201, hidden_size=16,
        num_layers=1, bidirectional=True, cmvn=False, use_pallas=True,
    )
    builder = dataclasses.replace(base, model=model)
    dp_mesh = make_mesh(8, model_parallel=1)
    tp_mesh = make_mesh(8, model_parallel=2)

    monkeypatch.delenv("SE_PALLAS_MESH", raising=False)
    monkeypatch.delenv("SE_PALLAS_TM", raising=False)

    # dp-only mesh: kernel kept, shard context returned
    kept, ctx = _mesh_safe_builder(builder, dp_mesh, ("data",))
    assert kept.model.use_pallas
    assert ctx == (dp_mesh, ("data",))

    # tensor parallelism: scan fallback, loud. The shard context is
    # still installed (round 5: the flash-attention routing consults it
    # and judges its own mesh suitability).
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        safe, ctx = _mesh_safe_builder(builder, tp_mesh, ("data",))
    assert not safe.model.use_pallas and ctx == (tp_mesh, ("data",))
    assert any("scan LSTM recurrence" in str(w.message) for w in caught)
    assert any("tensor-parallel" in str(w.message) for w in caught)

    # explicit opt-out
    monkeypatch.setenv("SE_PALLAS_MESH", "0")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        safe, ctx = _mesh_safe_builder(builder, dp_mesh, ("data",))
    assert not safe.model.use_pallas and ctx == (dp_mesh, ("data",))
    monkeypatch.delenv("SE_PALLAS_MESH", raising=False)

    # batch-blocked ablation kernel: only time-major is mesh-capable
    monkeypatch.setenv("SE_PALLAS_TM", "0")
    safe, ctx = _mesh_safe_builder(builder, dp_mesh, ("data",))
    assert not safe.model.use_pallas and ctx == (dp_mesh, ("data",))
    monkeypatch.delenv("SE_PALLAS_TM", raising=False)

    # scan models pass through untouched and silently, context installed
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        passed, ctx = _mesh_safe_builder(base, dp_mesh, ("data",))
    assert passed is base and ctx == (dp_mesh, ("data",)) and not caught


def test_pallas_kernel_under_mesh_matches_single_device(monkeypatch):
    """VERDICT r4 #2: the time-major Pallas kernel runs per device under
    shard_map on a dp mesh; a short training trajectory must match the
    single-device kernel step (same kernel, batch merely partitioned)."""
    import dataclasses

    monkeypatch.delenv("SE_PALLAS_MESH", raising=False)
    monkeypatch.delenv("SE_PALLAS_TM", raising=False)
    base = tiny_builder()
    model = build_head(
        "Residual", input_size=80, output_size=201, hidden_size=16,
        num_layers=1, bidirectional=True, cmvn=False, use_pallas=True,
    )
    builder = dataclasses.replace(base, model=model)
    rng = jax.random.PRNGKey(0)
    B, T = 8, 8000
    wavs = jax.random.normal(rng, (B, 3, T), jnp.float32) * 0.1
    lengths = jnp.full((B,), T, jnp.int32)

    state1 = builder.init_state(rng, wavs, lengths)
    single = builder.train_step_fn()

    mesh = make_mesh(8, model_parallel=1)
    state_m = builder.init_state(rng, wavs, lengths)
    step, state_m = make_parallel_train_step(builder, mesh, state_m)

    losses1, losses2 = [], []
    with mesh:
        for i in range(3):
            k = jax.random.fold_in(rng, i)
            state1, stats1 = single(state1, wavs, lengths, k)
            state_m, stats2 = step(state_m, wavs, lengths, k)
            losses1.append(float(stats1["loss"]))
            losses2.append(float(stats2["loss"]))
    np.testing.assert_allclose(losses1, losses2, rtol=2e-5)
    for a, b in zip(
        jax.tree.leaves(state1.params),
        jax.tree.leaves(jax.device_get(state_m.params)),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_transformer_tp_shardings_applied():
    """The Megatron pairing lands on a real transformer tree: qkv and
    FFN-intermediate kernels column-parallel, their consumers
    row-parallel, final projections replicated."""
    from speech_enhancement_by_s3prl_tpu.models.spec_head import Mockingjay
    from speech_enhancement_by_s3prl_tpu.models.transformer import (
        TransformerConfig,
    )
    from speech_enhancement_by_s3prl_tpu.parallel.mesh import param_shardings

    cfg = TransformerConfig(
        input_dim=16, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
    )
    m = Mockingjay(output_size=33, config=cfg)
    rng = jax.random.PRNGKey(0)
    p = m.init(
        {"params": rng, "dropout": rng},
        features=jnp.zeros((2, 12, 16)), linears=jnp.zeros((2, 12, 33)),
    )
    mesh = make_mesh(8, model_parallel=2)
    sh = param_shardings(mesh, p)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): s.spec
        for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]
    }
    get = lambda frag: {k: v for k, v in flat.items() if frag in k}  # noqa

    qkv_k = [v for k, v in flat.items() if k.endswith("attention/qkv/kernel")]
    assert qkv_k and all(str(s) == "PartitionSpec(None, 'model')"
                         for s in qkv_k), qkv_k
    inter_k = [v for k, v in flat.items()
               if k.endswith("intermediate/kernel")]
    assert inter_k and all(str(s) == "PartitionSpec(None, 'model')"
                           for s in inter_k)
    row_k = [v for k, v in flat.items()
             if "layer_" in k and k.endswith("output/kernel")]
    assert row_k and all(str(s) == "PartitionSpec('model', None)"
                         for s in row_k), row_k
    # final head projection replicated
    head_k = [v for k, v in flat.items()
              if k.endswith("spechead/output/kernel")]
    assert head_k and "model" not in str(head_k[0])
