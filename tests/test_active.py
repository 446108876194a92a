"""Active-learning subsystem: gradient-embedding scoring, matching,
pseudo-wav construction, sync sampler loop, test_gradient diagnostic."""
import os
from argparse import Namespace

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.active.sampler import (
    hist_scoring,
    hist_thresholding,
    make_scoring_fn,
    matching,
    thresholding,
)
from speech_enhancement_by_s3prl_tpu.models.transformer import TransformerConfig
from speech_enhancement_by_s3prl_tpu.models.upstream import UpstreamTransformer
from tests.test_e2e import corpus, make_config, make_args, make_runner  # noqa: F401


SMALL_TF = TransformerConfig(
    input_dim=201, hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
    intermediate_size=32,
)


def small_upstream():
    return UpstreamTransformer(SMALL_TF, input_dim=201, output_size=201)


def test_scoring_per_sample_vs_mean(corpus, tmp_path):
    runner, *_ = make_runner(corpus, tmp_path)
    scoring = make_scoring_fn(runner.builder)
    rng = np.random.default_rng(0)
    wavs = rng.standard_normal((3, 3, 16000)).astype(np.float32) * 0.1
    lengths = np.asarray([16000, 12000, 8000])

    per = np.asarray(scoring(runner.state.params, wavs, lengths))
    assert per.shape[0] == 3 and per.shape[1] > 1000
    assert np.isfinite(per).all() and (np.abs(per).sum(1) > 0).all()

    mean = np.asarray(scoring(runner.state.params, wavs, lengths, mean=True))
    assert mean.shape[0] == 1 and mean.shape[1] == per.shape[1]

    # cosine matching in [-1, 1]; self-match of the mean embedding is 1
    m = np.asarray(matching(jnp.asarray(mean), jnp.asarray(mean)))
    np.testing.assert_allclose(m, 1.0, atol=1e-5)
    scores = np.asarray(matching(jnp.asarray(per), jnp.asarray(per)))
    assert (np.abs(scores) <= 1 + 1e-5).all()
    keep = np.asarray(thresholding(jnp.asarray(scores)))
    assert keep.dtype == bool


def test_scoring_layer_filtering(corpus, tmp_path):
    runner, *_ = make_runner(corpus, tmp_path)
    all_fn = make_scoring_fn(runner.builder, active_layerid=None)
    l0_fn = make_scoring_fn(runner.builder, active_layerid=0)
    rng = np.random.default_rng(1)
    wavs = rng.standard_normal((2, 3, 8000)).astype(np.float32) * 0.1
    lengths = np.asarray([8000, 8000])
    full = np.asarray(all_fn(runner.state.params, wavs, lengths))
    only0 = np.asarray(l0_fn(runner.state.params, wavs, lengths))
    assert only0.shape[1] < full.shape[1]


def test_layer_split_grads_match_filtering(corpus, tmp_path):
    # the scoring fn differentiates ONLY the selected subtree (skips the
    # other layers' per-sample outer products); must equal grad-then-filter
    # coordinate for coordinate
    import jax as _jax

    from speech_enhancement_by_s3prl_tpu.active.sampler import (
        _flatten,
        _select_layer,
        _split_layer,
        _merge_trees,
    )
    from speech_enhancement_by_s3prl_tpu.runner.trainer import make_context

    runner, *_ = make_runner(corpus, tmp_path)
    sb = runner.builder
    rng = np.random.default_rng(3)
    wavs = jnp.asarray(rng.standard_normal((2, 3, 8000)).astype(np.float32) * 0.1)
    lengths = jnp.asarray([8000, 6000])

    # merge/split round-trips the tree
    sel, rest = _split_layer(runner.state.params, 0)
    merged = _merge_trees(sel, rest)
    for a, b in zip(_jax.tree.leaves(merged),
                    _jax.tree.leaves(runner.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def full_loss(p):
        ctx = make_context(sb.preprocessor, wavs, lengths, sb.channel_inp,
                           sb.channel_tar)
        loss, _ = sb.loss_fn(p, ctx, rngs={"dropout": _jax.random.PRNGKey(0)})
        return loss

    g_full = _select_layer(_jax.grad(full_loss)(runner.state.params), 0)
    g_split = _jax.grad(lambda s: full_loss(_merge_trees(s, rest)))(sel)
    fa = np.concatenate([np.asarray(l).ravel() for l in _jax.tree.leaves(g_full)])
    fb = np.concatenate([np.asarray(l).ravel() for l in _jax.tree.leaves(g_split)])
    np.testing.assert_allclose(fa, fb, atol=1e-6)

    # and the public scoring fn produces the same embedding as an
    # explicit grad-then-filter per-sample computation
    l0_fn = make_scoring_fn(sb, active_layerid=0)
    emb = np.asarray(l0_fn(runner.state.params, np.asarray(wavs),
                           np.asarray(lengths)))

    def one(p, w, l, k):
        ctx = make_context(sb.preprocessor, w[None], l[None], sb.channel_inp,
                           sb.channel_tar)
        loss, _ = sb.loss_fn(p, ctx, rngs={"dropout": k})
        return loss

    keys = _jax.random.split(_jax.random.PRNGKey(0), 2)
    g_ref = _jax.vmap(_jax.grad(one), in_axes=(None, 0, 0, 0))(
        runner.state.params, wavs, lengths, keys
    )
    ref = np.asarray(_flatten(_select_layer(g_ref, 0)))
    np.testing.assert_allclose(emb, ref, atol=2e-5)


def test_bad_layerid_fails_loudly(corpus, tmp_path):
    import pytest as _pytest

    runner, *_ = make_runner(corpus, tmp_path)
    fn = make_scoring_fn(runner.builder, active_layerid=99)
    rng = np.random.default_rng(4)
    wavs = rng.standard_normal((2, 3, 8000)).astype(np.float32) * 0.1
    lengths = np.asarray([8000, 8000])
    with _pytest.raises(ValueError, match="l99_"):
        fn(runner.state.params, wavs, lengths)


def test_hist_scoring(corpus, tmp_path):
    runner, *_ = make_runner(corpus, tmp_path)
    rng = np.random.default_rng(2)
    wavs = jnp.asarray(rng.standard_normal((4, 3, 8000)).astype(np.float32))
    h = np.asarray(hist_scoring(runner.preprocessor, wavs))
    assert h.shape == (4, 201)
    np.testing.assert_allclose(np.linalg.norm(h, axis=1), 1.0, atol=1e-4)
    hm = hist_scoring(runner.preprocessor, wavs, mean=True)
    assert hm.shape == (1, 201)
    assert np.asarray(hist_thresholding(jnp.asarray([0.9, 0.5]))).tolist() == [
        True, False,
    ]


def test_pseudo_wav_build_and_pseudo_dataset_modes(corpus, tmp_path):
    """_build_pseudo_wavs with a real (random) transformer upstream
    (/root/reference/runner.py:287-305 path), then a pseudo_modes dataset."""
    up = small_upstream()
    runner, config, args = make_runner(corpus, tmp_path)
    runner.upstream_model = up
    runner.upstream_model2 = up
    runner._build_pseudo_wavs()
    assert runner.pseudo_clean is not None and len(runner.pseudo_clean) == 2
    assert all(w.ndim == 1 for w in runner.pseudo_clean)

    ds = runner.get_dataset("query")  # pseudo_modes [3]
    wavs, case = ds[0]
    assert case == 3 and wavs.shape[1] == 3


def test_sync_sampler_training(corpus, tmp_path):
    """Full sync-sampler + active-sampling training loop
    (/root/reference/runner.py:383-429 semantics)."""
    up = small_upstream()
    runner, config, args = make_runner(
        corpus, tmp_path, sync_sampler=True, active_sampling=True,
    )
    runner.upstream_model = up
    runner.upstream_model2 = up
    # query/candidate sets need pseudo modes on the train config
    runner.config["OnlineDataset_train"]["pseudo_modes"] = [0, 1, 2, 3]
    runner.train()
    assert runner.global_step == 5


def test_sync_sampler_media_logging(corpus, tmp_path, monkeypatch):
    """At media_step the sync branch logs the six active/query_* and
    active/match_* audio streams (/root/reference/runner.py:405-411)."""
    from speech_enhancement_by_s3prl_tpu.runner import runner as runner_mod

    up = small_upstream()
    runner, config, args = make_runner(
        corpus, tmp_path, sync_sampler=True, active_sampling=True,
    )
    runner.upstream_model = up
    runner.upstream_model2 = up
    runner.config["OnlineDataset_train"]["pseudo_modes"] = [0, 1, 2, 3]
    runner.rconfig["media_step"] = 2
    # force every candidate to match so active/match_* logging is
    # deterministically exercised
    monkeypatch.setattr(
        runner_mod, "matching",
        lambda q, t: jnp.ones((t.shape[0],), jnp.float32),
    )
    runner.train()
    runner.log.flush()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path), size_guidance={"images": 0})
    acc.Reload()
    img_tags = set(acc.Tags().get("images", []))
    # no soundfile wheel in-image: the audio logger falls back to the
    # spectrogram figure per tag, so the six streams appear as figures
    for prefix in ("active/query", "active/match"):
        for ch in ("noisy", "clean", "noise"):
            assert any(f"{prefix}_{ch}" in t for t in img_tags), (
                f"{prefix}_{ch} missing from media logs: {sorted(img_tags)}"
            )


def test_async_sampler_training(corpus, tmp_path, monkeypatch):
    """Full ASYNC-sampler training loop through the Runner: --sampler_device
    starts the background scoring thread, the trainer drains it at
    sampler_collect_step, and training ends with the sampler flushed
    (/root/reference/runner.py:223-263,374-381 lifecycle)."""
    from speech_enhancement_by_s3prl_tpu.active.sampler import AsyncSampler
    from speech_enhancement_by_s3prl_tpu.runner import runner as runner_mod

    collects = []
    orig_collect = AsyncSampler.collect
    monkeypatch.setattr(
        AsyncSampler, "collect",
        lambda self: collects.append(1) or orig_collect(self),
    )
    # force matches so buffers fill deterministically (thread-side matching
    # lives in active.sampler)
    from speech_enhancement_by_s3prl_tpu.active import sampler as sampler_mod

    monkeypatch.setattr(
        sampler_mod, "matching",
        lambda q, t: jnp.ones((np.asarray(t).shape[0],), jnp.float32),
    )
    monkeypatch.setattr(
        runner_mod, "matching",
        lambda q, t: jnp.ones((np.asarray(t).shape[0],), jnp.float32),
    )

    up = small_upstream()
    runner, config, args = make_runner(
        corpus, tmp_path, sampler_device=0, active_sampling=True,
    )
    runner.upstream_model = up
    runner.upstream_model2 = up
    runner.config["OnlineDataset_train"]["pseudo_modes"] = [0, 1, 2, 3]
    runner.train()
    assert runner.global_step == 5
    # lifecycle: started during training, drained at collect_step (2 and 4),
    # stopped at the end of train()
    assert len(collects) >= 1
    assert runner.sampler is None


def test_test_gradient_diagnostic(corpus, tmp_path):
    up = small_upstream()
    runner, *_ = make_runner(corpus, tmp_path, n_iterate=2)
    runner.upstream_model = up
    runner.upstream_model2 = up
    runner.config["OnlineDataset_train"]["pseudo_modes"] = [0, 1, 2, 3]
    sims = runner.test_gradient()
    assert os.path.exists(os.path.join(str(tmp_path), "sim_box.png"))
    assert any(len(v) > 0 for v in sims.values())


def test_pseudo_wav_media_logging(corpus, tmp_path):
    """--pseudo_clean/--pseudo_noise log model-generated audio at
    media_step (/root/reference/runner.py:439-445: the flags feed the
    media log; no built-in loss consumes them)."""
    up = small_upstream()
    runner, config, args = make_runner(
        corpus, tmp_path, pseudo_clean=True, pseudo_noise=True,
    )
    runner.upstream_model = up
    runner.upstream_model2 = up
    runner.rconfig["media_step"] = 2
    runner.train()
    runner.log.flush()

    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(tmp_path), size_guidance={"images": 0})
    acc.Reload()
    img_tags = set(acc.Tags().get("images", []))
    for tag in ("pseudo_clean", "pseudo_noise"):
        assert any(tag in t for t in img_tags), (
            f"{tag} missing from media logs: {sorted(img_tags)}"
        )
