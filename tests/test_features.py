"""Tests for the OnlinePreprocessor-equivalent feature engine."""
import numpy as np
import pytest

import jax.numpy as jnp

from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    apply_cmvn,
    compute_deltas,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.ops.mel import (
    dct_matrix,
    mel_filterbank,
    mel_to_hz,
    hz_to_mel,
)


def make_preprocessor():
    """The six-feature list wired by the reference CLI
    (/root/reference/run_downstream.py:150-157)."""
    feat_list = [
        get_feat_config("mel", 0, log=True, delta=1, cmvn=True),  # upstream inp
        get_feat_config("linear", 0),                             # downstream inp
        get_feat_config("linear", 0),
        get_feat_config("phase", 0),
        get_feat_config("linear", 1),
        get_feat_config("phase", 1),
    ]
    return OnlinePreprocessor(feat_list=feat_list)


def test_six_feature_contract_shapes():
    pre = make_preprocessor()
    wavs = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 3, 32000)), dtype=jnp.float32
    )
    feats = pre(wavs)
    n_frames = 1 + 32000 // 160
    assert len(feats) == 6
    assert feats[0].shape == (2, n_frames, 80)   # mel 40 + delta 40
    assert feats[1].shape == (2, n_frames, 201)
    assert feats[3].shape == (2, n_frames, 201)
    # channel selection: feats[2] (ch 0) differs from feats[4] (ch 1)
    assert not np.allclose(np.asarray(feats[2]), np.asarray(feats[4]))
    # linear is non-negative power
    assert np.asarray(feats[1]).min() >= 0


def test_dummy_call_for_shape_inference():
    """Called with no wavs it must return dummy features
    (/root/reference/run_downstream.py:163-164)."""
    pre = make_preprocessor()
    feats = pre()
    assert [f.shape[-1] for f in feats] == [80, 201, 201, 201, 201, 201]
    assert pre.feat_dims() == [80, 201, 201, 201, 201, 201]


def test_istft_decode_path():
    """preprocessor(wavs) then istft(linear_tar, phase_inp) reconstructs a
    waveform of (n_frames - 1) * hop samples (/root/reference/runner.py:266-270)."""
    pre = make_preprocessor()
    rng = np.random.default_rng(1)
    wavs = jnp.asarray(rng.standard_normal((2, 2, 16000)) * 0.1, dtype=jnp.float32)
    _, _, linear_inp, phase_inp, linear_tar, phase_tar = pre(wavs)
    wav = pre.istft(linear_tar, phase_tar)
    n_frames = 1 + 16000 // 160
    assert wav.shape == (2, (n_frames - 1) * 160)
    # perfect-phase reconstruction of channel 1 should be close to input
    np.testing.assert_allclose(
        np.asarray(wav)[:, 400:-400], np.asarray(wavs)[:, 1, 400 : wav.shape[-1] - 400],
        atol=1e-3,
    )


def test_compute_deltas_matches_direct_formula():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 10, 4)), dtype=jnp.float32)
    out = np.asarray(compute_deltas(x))
    xp = np.asarray(x)[0]
    padded = np.concatenate([xp[:1], xp[:1], xp, xp[-1:], xp[-1:]], axis=0)
    expect = np.zeros_like(xp)
    for t in range(10):
        expect[t] = sum(i * padded[t + 2 + i] for i in range(-2, 3)) / 10.0
    np.testing.assert_allclose(out[0], expect, atol=1e-5)


def test_deltas_match_torchaudio_reference_values():
    """compute_deltas parity against precomputed torchaudio.functional
    .compute_deltas output for a fixed ramp input."""
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 6, 2)
    out = np.asarray(compute_deltas(x))[0]
    # replicate-padded ramp: interior slope = 2 per step per column
    np.testing.assert_allclose(out[2:4, 0], [2.0, 2.0], atol=1e-5)
    # edges with replicate padding: (-2*x0 - x0 + x1 + 2*x2)/10 = 1.0
    np.testing.assert_allclose(out[0, 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(out[-1, 0], 1.0, atol=1e-5)


def test_cmvn_zero_mean_unit_std():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 100, 8)) * 5 + 3, dtype=jnp.float32)
    out = np.asarray(apply_cmvn(x))
    np.testing.assert_allclose(out.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(axis=1, ddof=1), 1.0, atol=1e-3)


def test_mel_filterbank_properties():
    fb = np.asarray(mel_filterbank(201, 40, 16000))
    assert fb.shape == (201, 40)
    assert (fb >= 0).all()
    # triangle peaks are at increasing frequencies
    peaks = fb.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    # mel scale round trip
    np.testing.assert_allclose(mel_to_hz(hz_to_mel(1234.5)), 1234.5, rtol=1e-10)
    # htk formula spot value: 1000 Hz -> ~999.99 mel? (2595*log10(1+1000/700))
    np.testing.assert_allclose(hz_to_mel(1000.0), 1000.0, atol=2.0)


def test_dct_is_orthonormal():
    d = np.asarray(dct_matrix(40, 40))
    np.testing.assert_allclose(d.T @ d, np.eye(40), atol=1e-5)


def test_mfcc_shape():
    pre = OnlinePreprocessor(feat_list=[get_feat_config("mfcc", 0)])
    wavs = jnp.asarray(
        np.random.default_rng(4).standard_normal((1, 1, 16000)), dtype=jnp.float32
    )
    (mfcc,) = pre(wavs)
    assert mfcc.shape == (1, 101, 13)


def test_extract_skips_unreferenced_channels():
    """A 3-channel batch whose feat_list references only channels 0 and 2
    must produce the same features as the full-channel compute — the
    channel-slicing fast path (extract only transforms referenced
    channels) is a pure optimization."""
    import numpy as np

    from speech_enhancement_by_s3prl_tpu.ops.features import (
        OnlinePreprocessor,
        get_feat_config,
    )

    rng = np.random.default_rng(11)
    wavs = jnp.asarray(rng.standard_normal((2, 3, 8000)), jnp.float32) * 0.1
    fl = [
        get_feat_config("mel", 0, log=True),
        get_feat_config("linear", 2),
        get_feat_config("uphase", 2),
    ]
    pre = OnlinePreprocessor(feat_list=fl)
    sliced = pre(wavs)

    # reference: force the all-channel path by adding a channel-1 entry
    fl_all = fl + [get_feat_config("linear", 1)]
    pre_all = OnlinePreprocessor(feat_list=fl_all)
    full = pre_all(wavs)

    for a, b in zip(sliced, full[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
