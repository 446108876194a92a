"""Parity tests for the STFT/iSTFT core against torch.stft / torch.istft,
which define the reference's spectral conventions (SURVEY.md section 7,
'hard part (a)')."""
import numpy as np
import pytest

import jax.numpy as jnp
import torch

from speech_enhancement_by_s3prl_tpu.ops.stft import (
    StftParams,
    hann_window,
    istft,
    magphase,
    stft,
)

P = StftParams()  # 16 kHz, 25 ms / 10 ms, 201 bins


def torch_stft(x: np.ndarray):
    t = torch.from_numpy(x)
    spec = torch.stft(
        t,
        n_fft=P.n_fft,
        hop_length=P.hop_length,
        win_length=P.win_length,
        window=torch.hann_window(P.win_length),
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    return spec.numpy()  # (..., n_freq, n_frames)


@pytest.mark.parametrize("method", ["matmul", "fft"])
@pytest.mark.parametrize("time", [16000, 16000 * 3 + 7, 4321])
def test_stft_matches_torch(method, time):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, time)).astype(np.float32)
    ours = np.asarray(stft(jnp.asarray(x), P, method=method))
    ref = torch_stft(x)

    assert ours.shape == (2, 1 + time // P.hop_length, 2 * P.n_freq)
    re, im = ours[..., : P.n_freq], ours[..., P.n_freq :]
    np.testing.assert_allclose(re, np.swapaxes(ref.real, -1, -2), atol=2e-3)
    np.testing.assert_allclose(im, np.swapaxes(ref.imag, -1, -2), atol=2e-3)


def test_magphase_power_convention():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16000)).astype(np.float32)
    spec = stft(jnp.asarray(x), P)
    power, phase = magphase(spec, P.n_freq)
    ref = torch_stft(x)
    ref_power = np.swapaxes(np.abs(ref) ** 2, -1, -2)
    ref_phase = np.swapaxes(np.angle(ref), -1, -2)
    np.testing.assert_allclose(np.asarray(power), ref_power, atol=2e-2, rtol=1e-3)
    # phase comparison only where magnitude is non-negligible
    mask = ref_power > 1e-4
    diff = np.abs(np.asarray(phase) - ref_phase)[mask]
    diff = np.minimum(diff, 2 * np.pi - diff)
    assert diff.max() < 5e-2


@pytest.mark.parametrize("time", [16000, 16000 * 2 + 160 * 3])
def test_istft_matches_torch(time):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((3, time)).astype(np.float32) * 0.1
    spec = stft(jnp.asarray(x), P)
    power, phase = magphase(spec, P.n_freq)
    wav = np.asarray(istft(power, phase, P, linear_power=2.0))

    t_spec = torch.from_numpy(np.asarray(spec))
    re, im = t_spec[..., : P.n_freq], t_spec[..., P.n_freq :]
    complex_spec = torch.complex(re, im).transpose(-1, -2)
    ref = torch.istft(
        complex_spec,
        n_fft=P.n_fft,
        hop_length=P.hop_length,
        win_length=P.win_length,
        window=torch.hann_window(P.win_length),
        center=True,
        normalized=False,
        onesided=True,
    ).numpy()

    n_frames = 1 + time // P.hop_length
    assert wav.shape == (3, (n_frames - 1) * P.hop_length)
    L = min(wav.shape[-1], ref.shape[-1])
    np.testing.assert_allclose(wav[..., :L], ref[..., :L], atol=2e-3)


def test_istft_round_trip_reconstruction():
    """iSTFT(STFT(x)) ~= x away from the edges."""
    rng = np.random.default_rng(3)
    time = 16000
    x = rng.standard_normal((1, time)).astype(np.float32)
    spec = stft(jnp.asarray(x), P)
    power, phase = magphase(spec, P.n_freq)
    wav = np.asarray(istft(power, phase, P))
    L = wav.shape[-1]
    np.testing.assert_allclose(wav[0, 400:L - 400], x[0, 400:L - 400], atol=1e-3)


def test_hann_window_matches_torch():
    np.testing.assert_allclose(
        hann_window(400), torch.hann_window(400).numpy(), atol=1e-6
    )
