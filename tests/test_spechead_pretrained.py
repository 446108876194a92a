"""SpecHead/Mockingjay pretrained-weight construction.

The reference *requires* an S3PRL pretraining checkpoint for these two
downstream heads: SpecHead loads ``ckpt['SpecHead']`` from --ckpt
(/root/reference/model.py:95-110) and Mockingjay loads encoder + head from
--dckpt (model.py:129-153). These tests build a synthetic torch checkpoint
with the S3PRL key layout (naming reconstructed from the public s3prl repo,
the layout torch_import.convert_* expects), run the heads through the
Runner, and assert the initialized state actually carries the checkpoint
weights — the round-1 failure mode was silent random init.

Also: forward parity of the imported encoder against a torch
implementation of the same architecture (validates Linear transposes,
fused-QKV concat and LayerNorm mapping end to end).
"""
import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn as tnn

from speech_enhancement_by_s3prl_tpu.models.heads import build_head
from speech_enhancement_by_s3prl_tpu.models.torch_import import (
    convert_spechead_state,
    convert_transformer_state,
    load_s3prl_checkpoint,
    overlay_params,
    pretrained_head_params,
)
from speech_enhancement_by_s3prl_tpu.models.transformer import (
    TransformerConfig,
    TransformerEncoder,
    sinusoidal_position_encoding,
)
from tests.test_e2e import corpus, make_args, make_config  # noqa: F401

# SpecHead-as-downstream consumes hidden_size-dim features (in the
# reference they are the 768-dim upstream hiddens, model.py:119-120); with
# the test's 201-dim linear features the toy hidden size must be 201 too.
HIDDEN, LAYERS, HEADS, INTER = 201, 2, 3, 64
INPUT_DIM = 201   # linear feature (baseline preprocessor)
TARGET_DIM = 201


class TorchEncoder(tnn.Module):
    """S3PRL-layout transformer encoder (post-LN, exact gelu) with the
    state-dict key names the importer consumes."""

    class Layer(tnn.Module):
        def __init__(self):
            super().__init__()
            self.attention = tnn.ModuleDict({
                "self": tnn.ModuleDict({
                    "query": tnn.Linear(HIDDEN, HIDDEN),
                    "key": tnn.Linear(HIDDEN, HIDDEN),
                    "value": tnn.Linear(HIDDEN, HIDDEN),
                }),
                "output": tnn.ModuleDict({
                    "dense": tnn.Linear(HIDDEN, HIDDEN),
                    "LayerNorm": tnn.LayerNorm(HIDDEN, eps=1e-12),
                }),
            })
            self.intermediate = tnn.ModuleDict({"dense": tnn.Linear(HIDDEN, INTER)})
            self.output = tnn.ModuleDict({
                "dense": tnn.Linear(INTER, HIDDEN),
                "LayerNorm": tnn.LayerNorm(HIDDEN, eps=1e-12),
            })

        def forward(self, h):
            B, T, _ = h.shape
            hd = HIDDEN // HEADS
            q = self.attention["self"]["query"](h).view(B, T, HEADS, hd)
            k = self.attention["self"]["key"](h).view(B, T, HEADS, hd)
            v = self.attention["self"]["value"](h).view(B, T, HEADS, hd)
            logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
            probs = torch.softmax(logits, dim=-1)
            ctx = torch.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, T, HIDDEN)
            h = self.attention["output"]["LayerNorm"](
                h + self.attention["output"]["dense"](ctx)
            )
            inter = torch.nn.functional.gelu(self.intermediate["dense"](h))
            return self.output["LayerNorm"](h + self.output["dense"](inter))

    def __init__(self):
        super().__init__()
        self.input_representations = tnn.ModuleDict({
            "spec_transform": tnn.Linear(INPUT_DIM, HIDDEN),
            "LayerNorm": tnn.LayerNorm(HIDDEN, eps=1e-12),
        })
        self.encoder = tnn.ModuleDict(
            {"layer": tnn.ModuleList([self.Layer() for _ in range(LAYERS)])}
        )

    def forward(self, spec):
        h = self.input_representations["spec_transform"](spec)
        pe = torch.tensor(sinusoidal_position_encoding(h.shape[1], HIDDEN))
        h = self.input_representations["LayerNorm"](h + pe[None])
        for layer in self.encoder["layer"]:
            h = layer(h)
        return h


class TorchSpecHead(tnn.Module):
    def __init__(self):
        super().__init__()
        self.dense = tnn.Linear(HIDDEN, HIDDEN)
        self.LayerNorm = tnn.LayerNorm(HIDDEN, eps=1e-12)
        self.output = tnn.Linear(HIDDEN, TARGET_DIM)

    def forward(self, h):
        x = self.LayerNorm(torch.nn.functional.gelu(self.dense(h)))
        return self.output(x), x


def _pretrain_config():
    return {
        "transformer": {
            "input_dim": INPUT_DIM,
            "hidden_size": HIDDEN,
            "num_hidden_layers": LAYERS,
            "num_attention_heads": HEADS,
            "intermediate_size": INTER,
            "hidden_act": "gelu",
            "hidden_dropout_prob": 0.0,
            "attention_probs_dropout_prob": 0.0,
            "layer_norm_eps": 1e-12,
            "share_layer": False,
            "downsample_rate": 1,
        },
        "online": {
            "sample_rate": 16000,
            "win_ms": 25,
            "hop_ms": 10,
            "n_freq": 201,
            "n_mels": 40,
            "n_mfcc": 13,
            "input": {"feat_type": "linear", "channel": 0, "log": False,
                      "delta": 0, "cmvn": False},
            "target": {"feat_type": "linear", "channel": 1, "log": True,
                       "delta": 0, "cmvn": False},
        },
    }


@pytest.fixture(scope="module")
def s3prl_ckpt(tmp_path_factory):
    torch.manual_seed(0)
    enc = TorchEncoder().eval()
    head = TorchSpecHead().eval()
    path = tmp_path_factory.mktemp("ckpt") / "states-1000.ckpt"
    torch.save(
        {
            "Transformer": enc.state_dict(),
            "SpecHead": head.state_dict(),
            "Settings": {"Config": _pretrain_config(), "Paras": {}},
        },
        str(path),
    )
    return str(path), enc, head


class _SpecHeadHidden(TorchSpecHead):
    pass


def test_encoder_import_forward_parity(s3prl_ckpt):
    """Imported encoder + head reproduce the torch forward to fp32 tolerance."""
    path, enc, head = s3prl_ckpt
    rng = np.random.default_rng(0)
    spec = rng.standard_normal((2, 17, INPUT_DIM)).astype(np.float32)
    with torch.no_grad():
        t_hidden = enc(torch.tensor(spec))
        t_pred, _ = head(t_hidden)

    lc = load_s3prl_checkpoint(path)
    assert lc.log_domain is True
    assert lc.input_dim == INPUT_DIM and lc.output_size == TARGET_DIM

    jenc = TransformerEncoder(lc.config)
    j_hidden = jenc.apply({"params": lc.params["encoder"]}, jnp.asarray(spec))
    np.testing.assert_allclose(
        np.asarray(j_hidden), t_hidden.numpy(), atol=2e-4
    )

    from speech_enhancement_by_s3prl_tpu.models.transformer import (
        TransformerSpecPredictionHead,
    )

    jhead = TransformerSpecPredictionHead(lc.config, TARGET_DIM)
    j_pred, _ = jhead.apply({"params": lc.params["spechead"]}, j_hidden)
    np.testing.assert_allclose(np.asarray(j_pred), t_pred.numpy(), atol=2e-4)


def _make_runner(corpus, tmp_path, ckpt_path, downstream, random_init=False,
                 **args_over):
    from speech_enhancement_by_s3prl_tpu.models.upstream import DummyUpstream
    from speech_enhancement_by_s3prl_tpu.ops.features import (
        OnlinePreprocessor,
        get_feat_config,
    )
    from speech_enhancement_by_s3prl_tpu.runner.runner import Runner

    config = make_config(corpus)
    if random_init:
        config.setdefault("model", {})[downstream] = {"random_init": True}
    args = make_args(str(tmp_path), downstream=downstream, **args_over)

    feat_list = [get_feat_config("linear", 0) for _ in range(3)] + [
        get_feat_config("phase", 0),
        get_feat_config("linear", 1),
        get_feat_config("phase", 1),
    ]
    pre = OnlinePreprocessor(feat_list=feat_list)
    pre.channel_inp, pre.channel_tar = 0, 1
    cfg = dict(config.get("model", {}).get(downstream, {}) or {})
    cfg.update(vars(args))
    model = build_head(downstream, input_size=201, output_size=201, **cfg)
    up = DummyUpstream(201)
    runner = Runner(args=args, config=config, preprocessor=pre, upstream=up,
                    upstream2=up, downstream=model, expdir=str(tmp_path))
    runner.set_model()
    return runner


def _tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    return len(la) == len(lb) and all(
        np.allclose(np.asarray(x), np.asarray(y), atol=1e-6)
        for x, y in zip(la, lb)
    )


def test_spechead_runner_loads_pretrained(corpus, s3prl_ckpt, tmp_path):
    path, _, head = s3prl_ckpt
    runner = _make_runner(corpus, tmp_path, path, "SpecHead", ckpt=path)
    want = convert_spechead_state(head.state_dict())
    got = runner.state.params["params"]["spechead"]
    assert _tree_equal(got, want), "SpecHead must carry the ckpt weights"
    # log-domain flag from online.target.log travels into the module
    assert runner.downstream_model.log_domain is True

    runner.train()  # a few steps must run end to end
    assert runner.global_step == 5


def test_spechead_random_init_escape_hatch(corpus, s3prl_ckpt, tmp_path):
    path, _, head = s3prl_ckpt
    runner = _make_runner(corpus, tmp_path, path, "SpecHead", ckpt=path,
                          random_init=True)
    want = convert_spechead_state(head.state_dict())
    got = runner.state.params["params"]["spechead"]
    assert not _tree_equal(got, want), "random_init must skip the ckpt weights"


def test_mockingjay_runner_loads_pretrained(corpus, s3prl_ckpt, tmp_path):
    path, enc, head = s3prl_ckpt
    runner = _make_runner(corpus, tmp_path, path, "Mockingjay", dckpt=path)
    got = runner.state.params["params"]
    assert _tree_equal(got["mockingjay"], convert_transformer_state(enc.state_dict()))
    assert _tree_equal(got["spechead"], convert_spechead_state(head.state_dict()))

    # one step of finetuning updates the encoder too (it's a downstream here)
    before = np.asarray(
        got["mockingjay"]["layer_0"]["intermediate"]["kernel"]
    ).copy()
    runner.train()
    after = np.asarray(
        runner.state.params["params"]["mockingjay"]["layer_0"]["intermediate"]["kernel"]
    )
    assert not np.allclose(before, after)


def test_mockingjay_sampler_scoring(corpus, s3prl_ckpt, tmp_path):
    """Active-learning scoring must handle dropout-bearing downstreams:
    the reference scores whatever downstream is configured with the
    train-mode model (/root/reference/sampler.py:89-106), so a Mockingjay
    head needs a dropout rng threaded through vmap(grad)."""
    from speech_enhancement_by_s3prl_tpu.active.sampler import (
        make_scoring_fn,
        matching,
    )

    # dropout-bearing variant of the fixture ckpt (the fixture pins 0.0 for
    # bit-exact forward parity; scoring must survive live dropout)
    path, _, _ = s3prl_ckpt
    payload = torch.load(path, map_location="cpu", weights_only=False)
    payload["Settings"]["Config"]["transformer"]["hidden_dropout_prob"] = 0.1
    drop_path = str(tmp_path / "states-drop.ckpt")
    torch.save(payload, drop_path)

    runner = _make_runner(corpus, tmp_path, drop_path, "Mockingjay",
                          dckpt=drop_path)
    scoring = make_scoring_fn(runner.builder)
    rng = np.random.default_rng(3)
    wavs = rng.standard_normal((2, 3, 8000)).astype(np.float32) * 0.1
    lengths = np.asarray([8000, 6000])

    per = np.asarray(scoring(runner.state.params, wavs, lengths))
    assert per.shape[0] == 2 and np.isfinite(per).all()
    assert (np.abs(per).sum(1) > 0).all()

    mean = np.asarray(scoring(runner.state.params, wavs, lengths, mean=True))
    assert mean.shape[0] == 1 and np.isfinite(mean).all()

    m = np.asarray(matching(jnp.asarray(mean), jnp.asarray(per)))
    assert m.shape == (2,) and np.isfinite(m).all()

    # dropout is live in scoring (train-mode loss): different rng keys
    # give different gradient embeddings, same key is deterministic
    a = np.asarray(
        scoring(runner.state.params, wavs, lengths, rng=jax.random.PRNGKey(1))
    )
    b = np.asarray(
        scoring(runner.state.params, wavs, lengths, rng=jax.random.PRNGKey(2))
    )
    c = np.asarray(
        scoring(runner.state.params, wavs, lengths, rng=jax.random.PRNGKey(1))
    )
    assert not np.allclose(a, b)
    np.testing.assert_allclose(a, c)


def test_overlay_params_rejects_mismatches():
    base = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
    ok = overlay_params(base, {"b": {"c": np.ones(4)}})
    assert np.allclose(ok["b"]["c"], 1.0) and np.allclose(ok["a"], 0.0)
    with pytest.raises(AssertionError):
        overlay_params(base, {"zz": np.zeros(1)})
    with pytest.raises(AssertionError):
        overlay_params(base, {"a": np.zeros((3, 2))})


def test_pretrained_head_params_none_paths(s3prl_ckpt):
    path, *_ = s3prl_ckpt
    assert pretrained_head_params("LSTM", ckpt=path) is None
    assert pretrained_head_params("SpecHead", ckpt="") is None
    assert pretrained_head_params("SpecHead", ckpt=path, random_init=True) is None
    assert pretrained_head_params("Mockingjay", dckpt="") is None
