"""The 'uphase' phase carrier: packed [re | im] complex spectrum.

TPU-first replacement for the radian phase round trip
(arctan2 at extract, cos/sin at istft — three transcendental VPU passes
over the full spectrogram). istft dispatches on the phase tensor's last
dim: n_freq = radians (reference contract, /root/reference/runner.py:267),
2 * n_freq = packed complex, reconstructed by magnitude rescaling.
Both must produce identical waveforms, including at |z| = 0 bins where
arctan2(0, 0) = 0 pins the unit vector to (1, 0).
"""
import jax
import jax.numpy as jnp
import numpy as np

from speech_enhancement_by_s3prl_tpu.ops.features import (
    OnlinePreprocessor,
    get_feat_config,
)
from speech_enhancement_by_s3prl_tpu.ops.stft import (
    StftParams,
    istft,
    magphase,
    stft,
)

SP = StftParams()
F = SP.n_freq


def _wav(batch=2, t=16000, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((batch, t)), jnp.float32) * 0.1


def test_istft_uphase_matches_radians():
    w = _wav()
    cx = stft(w, SP)
    power, phase = magphase(cx, F)
    rng = np.random.default_rng(1)
    pred = jnp.asarray(
        rng.standard_normal(power.shape) ** 2, jnp.float32
    )
    ref = istft(pred, phase, SP)
    out = istft(pred, cx, SP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_istft_uphase_zero_bins_match_arctan2_convention():
    # all-zero spectrum: arctan2(0, 0) = 0 -> unit (1, 0); the rescale
    # path must reproduce that, not emit zeros
    n_frames = 11
    pred = jnp.ones((1, n_frames, F), jnp.float32)
    zeros_packed = jnp.zeros((1, n_frames, 2 * F), jnp.float32)
    zeros_rad = jnp.zeros((1, n_frames, F), jnp.float32)
    ref = istft(pred, zeros_rad, SP)
    out = istft(pred, zeros_packed, SP)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    assert float(jnp.abs(ref).max()) > 0  # the convention is observable


def test_uphase_feature_bundle_equivalent_enhance():
    # six-feature bundle with uphase phase carriers decodes to the same
    # waveform as the radian bundle; uphase dim doubles
    def bundle(phase_type):
        return [
            get_feat_config("mel", 0, log=True, delta=1, cmvn=True),
            get_feat_config("mel", 0, log=True, delta=2),
            get_feat_config("linear", 0),
            get_feat_config(phase_type, 0),
            get_feat_config("linear", 1),
            get_feat_config(phase_type, 1),
        ]

    rng = np.random.default_rng(2)
    wavs = jnp.asarray(rng.standard_normal((2, 2, 8000)), jnp.float32) * 0.1

    pre_rad = OnlinePreprocessor(feat_list=bundle("phase"))
    pre_u = OnlinePreprocessor(feat_list=bundle("uphase"))
    feats_rad = pre_rad(wavs)
    feats_u = pre_u(wavs)

    assert pre_rad.feat_dims()[3] == F
    assert pre_u.feat_dims()[3] == 2 * F
    # non-phase features identical
    for i in (0, 1, 2, 4):
        np.testing.assert_allclose(
            np.asarray(feats_rad[i]), np.asarray(feats_u[i]), atol=0
        )

    # a mask-enhanced spectrum decodes identically through either carrier
    mask = jax.nn.sigmoid(jnp.asarray(
        rng.standard_normal(feats_rad[2].shape), jnp.float32))
    predicted = feats_rad[2] * mask
    wav_rad = pre_rad.istft(predicted, feats_rad[3])
    wav_u = pre_u.istft(predicted, feats_u[3])
    np.testing.assert_allclose(
        np.asarray(wav_u), np.asarray(wav_rad), atol=1e-6
    )


def test_phase_still_available_on_request():
    # the radian contract survives the lazy-phase refactor
    pre = OnlinePreprocessor(feat_list=[get_feat_config("phase", 0)])
    wavs = _wav(1, 4800)[None]  # (1, 1, T)
    (phase_feat,) = pre(wavs)
    cx = stft(wavs[:, 0], SP)
    _, phase_ref = magphase(cx, F)
    np.testing.assert_allclose(
        np.asarray(phase_feat), np.asarray(phase_ref), atol=1e-6
    )
