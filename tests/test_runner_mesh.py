"""Runner-level mesh training: --mesh over the 8 virtual CPU devices.

Sharding only partitions the same computation, so the dp x tp loss
trajectory must reproduce single-device numerics (SURVEY.md section 7
item 9: additive capability gated on single-device parity)."""
import numpy as np
import pytest

import jax
from jax.sharding import PartitionSpec as P

from tests.test_e2e import corpus, make_runner  # noqa: F401


def test_runner_trains_on_mesh(corpus, tmp_path):
    runner, config, args = make_runner(corpus, tmp_path)
    runner.config["dataloader"]["batch_size"] = 4
    runner.args.mesh = "4x2"
    runner.set_model()
    assert runner.mesh is not None
    runner.train()
    assert runner.global_step == 5

    loss, scores, *_ = runner.evaluate()
    assert np.isfinite(loss)


def test_mesh_loss_matches_single_device(corpus, tmp_path_factory):
    """The Runner-wired dp x tp step must reproduce the single-device step's
    losses and parameters on identical batches (the loader itself is
    thread-order nondeterministic, so feed fixed batches directly)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    batches = [
        (
            jnp.asarray(rng.standard_normal((4, 3, 16000)).astype(np.float32) * 0.1),
            jnp.asarray([16000, 12000, 9000, 16000]),
        )
        for _ in range(3)
    ]

    def run(mesh):
        tmp = tmp_path_factory.mktemp(f"mesh_{mesh or 'single'}")
        runner, config, args = make_runner(corpus, tmp)
        runner.config["dataloader"]["batch_size"] = 4
        runner.args.mesh = mesh
        runner.set_model()
        state = runner.state
        losses = []
        for i, (wavs, lengths) in enumerate(batches):
            state, stats = runner.train_step(
                state, wavs, lengths, jax.random.PRNGKey(i)
            )
            losses.append(float(stats["loss"]))
        return losses, jax.tree.map(np.asarray, jax.device_get(state.params))

    single_losses, single_params = run(None)
    mesh_losses, mesh_params = run("4x2")
    np.testing.assert_allclose(mesh_losses, single_losses, rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(single_params), jax.tree.leaves(mesh_params)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-5)


def test_opt_state_sharding_is_path_matched(corpus, tmp_path):
    """Moments (mu/nu) carry their param's sharding; schedule counters and
    other scalars replicate — matched by path suffix, not shape."""
    from speech_enhancement_by_s3prl_tpu.parallel.mesh import (
        make_mesh,
        param_shardings,
        shard_train_state,
    )

    runner, config, args = make_runner(corpus, tmp_path)
    mesh = make_mesh(8, model_parallel=2)
    state, (p_sh, o_sh) = shard_train_state(mesh, runner.state)

    p_leaves = {
        tuple(str(getattr(k, "key", k)) for k in path): sh
        for path, sh in jax.tree_util.tree_flatten_with_path(p_sh)[0]
    }
    # find the LSTM input kernel's sharding: must be model-sharded
    lstm_keys = [k for k in p_leaves if "w_ih" in "/".join(k)]
    assert lstm_keys, "expected LSTM kernels in the param tree"
    assert any(
        p_leaves[k].spec != P(None, None) for k in lstm_keys
    ), "LSTM gate kernels should be tensor-parallel"

    # every moment leaf matching a param path must carry the same sharding
    o_flat = jax.tree_util.tree_flatten_with_path(o_sh)[0]
    matched = 0
    for path, sh in o_flat:
        names = tuple(
            str(getattr(k, "key", getattr(k, "idx", getattr(k, "name", k))))
            for k in path
        )
        for i in range(len(names)):
            if names[i:] in p_leaves:
                assert sh == p_leaves[names[i:]], f"mis-sharded moment {names}"
                matched += 1
                break
    assert matched >= 2 * len(p_leaves), "mu and nu should both be matched"


def test_mesh_eval_matches_single_device(corpus, tmp_path):
    """Batch-sharded eval over every mesh device reproduces the
    single-device eval outputs (scores are per-utterance, loss a mean)."""
    import jax.numpy as jnp

    runner, config, args = make_runner(corpus, tmp_path)
    runner.config["dataloader"]["batch_size"] = 4
    runner.args.mesh = "4x2"
    runner.set_model()
    assert runner.eval_step_parallel is not None

    rng = np.random.default_rng(1)
    wavs = jnp.asarray(rng.standard_normal((8, 3, 16000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([16000, 12000, 9000, 16000, 8000, 16000, 11000, 16000])

    single = runner.eval_step(runner.state.params, wavs, lengths)
    multi = runner.eval_step_parallel(runner.state.params, wavs, lengths)
    np.testing.assert_allclose(
        float(multi["loss"]), float(single["loss"]), rtol=2e-4
    )
    for name in single["scores"]:
        np.testing.assert_allclose(
            np.asarray(multi["scores"][name]),
            np.asarray(single["scores"][name]),
            rtol=2e-3, atol=1e-4,
        )
    # the single-device step returns wav_out='first' (only utterance 0,
    # all evaluate() reads when metrics are on-device — trainer.py); the
    # mesh step keeps the full sharded batch. Compare the shared row.
    assert single["wav_predicted"].shape[0] == 1
    np.testing.assert_allclose(
        np.asarray(multi["wav_predicted"])[:1],
        np.asarray(single["wav_predicted"]),
        atol=2e-4,
    )

    # evaluate() integrates it: indivisible last batches fall back
    loss, scores, *_ = runner.evaluate()
    assert np.isfinite(loss) and np.isfinite(scores).all()


def test_mesh_with_warm_start_and_resume(corpus, tmp_path):
    """--dckpt warm start and --resume load host arrays AFTER the mesh
    sharding is set up; the sharded train step must still run (uncommitted
    arrays get resharded by the explicit in_shardings)."""
    import jax.numpy as jnp

    runner, config, args = make_runner(corpus, tmp_path / "a")
    runner.config["dataloader"]["batch_size"] = 4
    runner.args.mesh = "4x2"
    runner.set_model()
    runner.save_model()

    import glob

    ckpt = sorted(glob.glob(str(tmp_path / "a" / "states-*.ckpt")))[-1]

    # warm start a fresh mesh runner from that checkpoint
    runner2, _, _ = make_runner(corpus, tmp_path / "b")
    runner2.config["dataloader"]["batch_size"] = 4
    runner2.args.mesh = "4x2"
    runner2.args.dckpt = ckpt
    runner2.set_model()

    rng = np.random.default_rng(0)
    wavs = jnp.asarray(rng.standard_normal((4, 3, 16000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([16000, 12000, 16000, 9000])
    state, stats = runner2.train_step(
        runner2.state, wavs, lengths, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(stats["loss"]))

    # resume path on a mesh runner
    runner3, _, _ = make_runner(corpus, tmp_path / "c")
    runner3.config["dataloader"]["batch_size"] = 4
    runner3.args.mesh = "4x2"
    runner3.args.resume = ckpt
    runner3.set_model()
    state, stats = runner3.train_step(
        runner3.state, wavs, lengths, jax.random.PRNGKey(0)
    )
    assert np.isfinite(float(stats["loss"]))
