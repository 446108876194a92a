"""AsyncSampler thread lifecycle: start -> fill buffers -> collect drains
atomically -> stop flushes (the reference child-process protocol,
/root/reference/runner.py:223-263, as a thread)."""
import time

import numpy as np

import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.active.sampler import (
    ACTIVE_BUFFER_NUM,
    AsyncSampler,
)


class FakeLoader:
    """Yields batches with all four cases; stable scoring targets."""

    def __init__(self, n_batches=4, bsz=4):
        self.n_batches = n_batches
        self.bsz = bsz
        rng = np.random.default_rng(0)
        self.wavs = rng.standard_normal((n_batches, bsz, 3, 800)).astype(np.float32)

    def __iter__(self):
        for i in range(self.n_batches):
            lengths = np.full(self.bsz, 800, np.int64)
            cases = np.arange(self.bsz) % ACTIVE_BUFFER_NUM
            yield lengths, self.wavs[i], cases


def fake_scoring(params, wavs, lengths, mean=False):
    w = np.asarray(wavs)
    out = w.reshape(w.shape[0], -1)[:, :16].astype(np.float32)
    # bias embeddings positively so cosine-vs-mean matches often
    out = np.abs(out) + 0.1
    if mean:
        return jnp.asarray(out.mean(0, keepdims=True))
    return jnp.asarray(out)


def test_async_sampler_lifecycle():
    query = (np.full(2, 800, np.int64),
             np.random.default_rng(1).standard_normal((2, 3, 800)).astype(np.float32),
             np.zeros(2, np.int64))
    sampler = AsyncSampler(
        scoring_fn=fake_scoring,
        params={},
        dataset=None,
        loader_factory=lambda: FakeLoader(),
        query_batch=query,
        sample_num=3,
    )
    sampler.start()
    assert sampler.alive
    deadline = time.time() + 20
    got = {}
    while time.time() < deadline:
        got = sampler.collect()
        if any(got.values()):
            break
        time.sleep(0.2)
    assert any(got.values()), "sampler filled no buffers"
    for case, items in got.items():
        assert len(items) <= 3  # sample_num cap
        for it in items:
            assert it["wavs"].shape[1] == 3 and "match_score" in it
    # collect drained: an immediate re-collect returns (nearly) empty
    sampler.stop()
    assert not sampler.alive
