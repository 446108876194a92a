"""StatefulStreamer (ops/streaming.py): sample-exact parity with the
offline full-utterance forward for unidirectional mask heads — the LSTM
state, STFT framing, delta context, and iSTFT overlap-add tails all
carry across chunks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.ops.streaming import StatefulStreamer


def _setup(delta=2, hidden=16, layers=2, n_mels=8):
    down = get_feat_config("mel", 0, log=True, delta=delta, cmvn=False)
    feat_list = [down, get_feat_config("linear", 0),
                 get_feat_config("uphase", 0)]
    pre = OnlinePreprocessor(feat_list=feat_list, n_mels=n_mels)
    in_dim = pre.feat_dims()[0]
    model = build_head(
        "Residual", input_size=in_dim, output_size=201,
        hidden_size=hidden, num_layers=layers, bidirectional=False,
        activation="Sigmoid", cmvn=False,
    )
    rng = jax.random.PRNGKey(0)
    wav0 = jnp.zeros((1, 1, 16000), jnp.float32)
    feats0 = pre.extract(wav0, feat_list)
    params = model.init(rng, features=feats0[0], linears=feats0[1])
    return pre, feat_list, model, params, down


def _offline(pre, feat_list, model, params, wav):
    feats = pre.extract(jnp.asarray(wav)[None, None], feat_list)
    predicted, _ = model.apply(params, features=feats[0], linears=feats[1])
    return np.asarray(pre.istft(predicted, feats[2]))[0]


@pytest.mark.parametrize("delta", [0, 2])
def test_streaming_matches_offline_exactly(delta):
    pre, feat_list, model, params, down = _setup(delta=delta)
    rng = np.random.default_rng(0)
    n = 16000 * 3 + 777  # deliberately not hop/chunk aligned
    t = np.arange(n) / 16000
    wav = (0.3 * np.sin(2 * np.pi * 220 * t)
           * (0.5 + 0.5 * np.sin(2 * np.pi * 2 * t))
           + 0.05 * rng.standard_normal(n)).astype(np.float32)

    ref = _offline(pre, feat_list, model, params, wav)

    streamer = StatefulStreamer(
        params, model, pre, feat_cfg=down, frames_per_chunk=40
    )
    out = []
    pos = 0
    sizes = rng.integers(900, 9000, size=64)  # ragged pushes
    for sz in sizes:
        if pos >= n:
            break
        out.append(streamer.push(wav[pos : pos + int(sz)]))
        pos += int(sz)
    if pos < n:
        out.append(streamer.push(wav[pos:]))
    out.append(streamer.flush())
    got = np.concatenate(out)

    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=2e-5)


def test_streaming_incremental_latency():
    """Pushing sample-by-sample chunks yields output incrementally (the
    constant-latency property), not one burst at flush."""
    pre, feat_list, model, params, down = _setup(delta=2)
    rng = np.random.default_rng(1)
    wav = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
    streamer = StatefulStreamer(
        params, model, pre, feat_cfg=down, frames_per_chunk=25
    )
    emitted_before_flush = 0
    for i in range(0, len(wav), 1600):  # 100 ms pushes
        emitted_before_flush += len(streamer.push(wav[i : i + 1600]))
    tail = streamer.flush()
    total = emitted_before_flush + len(tail)
    assert total == (len(wav) // pre.config.stft.hop_length) * \
        pre.config.stft.hop_length
    # the vast majority of audio arrived before flush
    assert emitted_before_flush > 0.7 * total, (emitted_before_flush, total)


def test_streaming_rejects_bidirectional():
    pre, feat_list, _, _, down = _setup()
    bidir = build_head(
        "Residual", input_size=pre.feat_dims()[0], output_size=201,
        hidden_size=8, num_layers=1, bidirectional=True,
        activation="Sigmoid", cmvn=False,
    )
    with pytest.raises(AssertionError, match="unidirectional"):
        StatefulStreamer(None, bidir, pre, feat_cfg=down)


def test_lstm_state_threading_matches_split_scan():
    """models/lstm.py state carrying: running a sequence in two halves
    with the carried (h, c) equals one full pass."""
    from speech_enhancement_by_s3prl_tpu.models.lstm import LSTMStack

    stack = LSTMStack(8, num_layers=2, bidirectional=False)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (3, 20, 5), jnp.float32)
    p = stack.init(rng, x)
    full = stack.apply(p, x)
    h1, st = stack.apply(p, x[:, :9], return_state=True)
    h2, _ = stack.apply(p, x[:, 9:], initial_state=st, return_state=True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([h1, h2], axis=1)), np.asarray(full),
        atol=1e-6,
    )
