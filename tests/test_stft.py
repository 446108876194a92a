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


def test_stft_hopmm_method_matches_matmul():
    """'hopmm' (hop-blocked matmul, a recorded ablation — docs/PERF.md) is
    the same linear map as the default strided-conv lowering."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    base = np.asarray(stft(x, P, method="matmul"))
    hop = np.asarray(stft(x, P, method="hopmm"))
    np.testing.assert_allclose(hop, base, atol=2e-3)


def test_pallas_dsp_env_dispatch(monkeypatch):
    """SE_PALLAS_STFT / SE_PALLAS_DECODE route stft()/istft() through the
    fused Pallas kernels (interpret mode on CPU) — the dispatch itself,
    not just the kernels, must preserve parity."""
    from speech_enhancement_by_s3prl_tpu.ops.stft import istft, magphase

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32) * 0.1)
    base_spec = np.asarray(stft(x, P, method="matmul"))
    power, phase = magphase(jnp.asarray(base_spec), P.n_freq, power=2.0)
    base_wav = np.asarray(istft(power, phase, P))

    monkeypatch.setenv("SE_PALLAS_STFT", "1")
    monkeypatch.setenv("SE_PALLAS_DECODE", "1")
    k_spec = np.asarray(stft(x, P, method="matmul"))
    k_wav = np.asarray(istft(power, phase, P))
    # the kernels run bf16 MXU matmuls: scale-relative tolerance, like
    # tests/test_pallas_dsp.py's direct kernel parity checks
    np.testing.assert_allclose(
        k_spec, base_spec, atol=5e-3 * max(np.abs(base_spec).max(), 1.0)
    )
    np.testing.assert_allclose(
        k_wav, base_wav, atol=5e-3 * max(np.abs(base_wav).max(), 1.0)
    )
