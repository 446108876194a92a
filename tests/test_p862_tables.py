"""P.862 constant tables (metrics/p862_tables.py): the transcribed data
must satisfy the internal-consistency properties the published tables
have — a transcription error in any entry trips these.
"""
import numpy as np

from speech_enhancement_by_s3prl_tpu.metrics import p862_tables as T


def test_validate_tables():
    T.validate_tables()


def test_bark_bands_tile_and_start_at_zero():
    c, w = T.CENTRE_OF_BAND_BARK, T.WIDTH_OF_BAND_BARK
    gaps = c[1:] - c[:-1] - 0.5 * (w[1:] + w[:-1])
    assert np.abs(gaps).max() < 5e-6
    assert abs(c[0] - w[0] / 2) < 5e-7
    # 42-band (8 kHz) top edge lands on 4 kHz territory (~17.39 bark),
    # 49-band (16 kHz) on ~21.34 bark
    assert abs((c[41] + w[41] / 2) - 17.385849) < 1e-5
    assert abs((c[48] + w[48] / 2) - 21.335650) < 1e-5


def test_abs_thresholds_are_decibel_exact():
    """Every threshold equals 10^(d/10) for a one-decimal dB value (the
    published table is the hearing threshold rounded to 0.1 dB)."""
    db = 10.0 * np.log10(T.ABS_THRESH_POWER)
    assert np.abs(db - np.round(db, 1)).max() < 2e-5
    # U-shaped: falls to the ~1-3 kHz floor, rises again
    i_min = int(np.argmin(T.ABS_THRESH_POWER))
    assert 20 < i_min < 40
    assert T.ABS_THRESH_POWER[0] > 1e7 and T.ABS_THRESH_POWER[-1] < 1.0


def test_bin_grouping_covers_spectrum_exactly():
    assert T.NR_OF_HZ_BANDS_8K.sum() == 128   # bins 1..128 of 256-pt frame
    assert T.NR_OF_HZ_BANDS_16K.sum() == 256  # bins 1..256 of 512-pt frame
    # 16 kHz table extends the 8 kHz table below 4 kHz (shared bark
    # bands, same 31.25 Hz bin width)
    assert (T.NR_OF_HZ_BANDS_16K[:41] == T.NR_OF_HZ_BANDS_8K[:41]).all()
    # the published tables diverge at band 41: the 8 kHz model truncates
    # it at its 4 kHz Nyquist (bin 128), the 16 kHz model does not
    assert T.NR_OF_HZ_BANDS_8K[41] == 128 - T.NR_OF_HZ_BANDS_8K[:41].sum()
    assert T.NR_OF_HZ_BANDS_16K[41] == 12 and T.NR_OF_HZ_BANDS_8K[41] == 11
    # bins per band grow with the bark widths except the final band,
    # which the 8 kHz Nyquist clips below trend (20 bins vs ~26)
    assert (np.diff(T.NR_TAIL_16K[:-1]) >= 0).all()
    assert T.NR_TAIL_16K[-1] < T.NR_TAIL_16K[-2]
    assert T.NR_TAIL_16K.sum() == 256 - 117  # bands 41..48 span bins 118..256


def test_pow_dens_correction_is_mean_normalization():
    for fs in (8000, 16000):
        t = T.band_tables(fs)
        np.testing.assert_allclose(
            t["pow_dens_correction"] * t["nr_of_hz_bands"], 100.0
        )


def test_irs_receive_characteristic():
    g = T.irs_receive_gain(np.array([0.0, 200.0, 600.0, 3000.0, 3250.0,
                                     3500.0, 4000.0]))
    assert g[0] < 1e-9                    # DC blocked
    assert abs(g[1] - 1.0) < 1e-9         # 0 dB point at 200 Hz
    assert g[2] == g[3] == g[4]           # 12 dB plateau
    assert g[5] < g[4]                    # rolloff starts
    assert g[6] < 1e-9                    # stopband
    # monotone rise through the low edge
    lows = T.irs_receive_gain(np.array([50.0, 100.0, 125.0, 160.0, 200.0]))
    assert (np.diff(lows) > 0).all()


def test_band_tables_shapes_and_scales():
    t8, t16 = T.band_tables(8000), T.band_tables(16000)
    assert t8["nb"] == 42 and t16["nb"] == 49
    assert t8["abs_thresh"].shape == (42,)
    np.testing.assert_allclose(t8["abs_thresh"], T.ABS_THRESH_POWER[:42])
    assert t16["sp"] == T.SP_16K and t8["sp"] == T.SP_8K
    assert abs(t8["sp"] / t16["sp"] - 4.0) < 1e-3  # published 4x relation
