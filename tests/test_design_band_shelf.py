"""Band EQ / shelving / Orfanidis peak / polyroot tests."""

import numpy as np
import pytest

from algodsp_tpu.filters import design
from algodsp_tpu.filters.biquad import sos_response
from algodsp_tpu.utils import polyroot

SR = 48000.0


def mag_db(sos, f, sr=SR):
    return 20.0 * np.log10(np.abs(sos_response(sos, f, sr)))


# -- polyroot ---------------------------------------------------------------

def test_split_fourth_order_roundtrip():
    # build a 4th-order section from two known biquads, split, compare response
    b_poly = np.polynomial.polynomial.polymul([1.0, 0.4, 0.3], [1.0, -0.2, 0.5]) * 2.0
    a_poly = np.polynomial.polynomial.polymul([1.0, -0.5, 0.25], [1.0, 0.3, 0.8])
    sos = polyroot.split_fourth_order(b_poly, a_poly)
    assert sos.shape == (2, 5)
    freqs = np.linspace(10, 20000, 64)
    got = sos_response(sos, freqs, SR)
    z1 = np.exp(-1j * 2 * np.pi * freqs / SR)
    want = (sum(c * z1 ** k for k, c in enumerate(b_poly))
            / sum(c * z1 ** k for k, c in enumerate(a_poly)))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_split_fourth_order_degenerate():
    with pytest.raises(polyroot.DegeneratePolynomialError):
        polyroot.split_fourth_order([0, 1, 1, 1, 1], [1, 0, 0, 0, 1])


# -- band EQ ---------------------------------------------------------------

@pytest.mark.parametrize("designer", [
    design.butterworth_band, design.chebyshev1_band,
    design.chebyshev2_band, design.elliptic_band])
def test_band_boost_center_gain(designer):
    gain = 9.0
    sos = designer(SR, 1000.0, 400.0, gain, 4)
    # center hits the requested gain
    assert abs(mag_db(sos, 1000.0)[0] - gain) < 0.3, designer.__name__
    # far away ~ unity
    assert abs(mag_db(sos, 50.0)[0]) < 0.6
    assert abs(mag_db(sos, 15000.0)[0]) < 0.6


@pytest.mark.parametrize("designer", [
    design.butterworth_band, design.chebyshev1_band,
    design.chebyshev2_band, design.elliptic_band])
def test_band_cut(designer):
    sos = designer(SR, 2000.0, 800.0, -12.0, 6)
    assert abs(mag_db(sos, 2000.0)[0] + 12.0) < 0.3
    assert abs(mag_db(sos, 100.0)[0]) < 0.6


def test_band_zero_gain_passthrough():
    sos = design.butterworth_band(SR, 1000.0, 400.0, 0.0, 4)
    np.testing.assert_array_equal(sos, [[1.0, 0.0, 0.0, 0.0, 0.0]])


def test_band_invalid_params():
    with pytest.raises(design.BandParamError):
        design.butterworth_band(SR, 1000.0, 400.0, 6.0, 3)  # odd order
    with pytest.raises(design.BandParamError):
        design.butterworth_band(SR, 100.0, 400.0, 6.0, 4)  # band below DC


# -- shelving ---------------------------------------------------------------

def test_butterworth_low_shelf():
    gain = 10.0
    sos = design.butterworth_low_shelf(SR, 500.0, gain, 4)
    assert abs(mag_db(sos, 1.0)[0] - gain) < 0.05
    assert abs(mag_db(sos, 20000.0)[0]) < 0.05
    # cut is the inverse
    cut = design.butterworth_low_shelf(SR, 500.0, -gain, 4)
    assert abs(mag_db(cut, 1.0)[0] + gain) < 0.05


def test_butterworth_high_shelf():
    sos = design.butterworth_high_shelf(SR, 5000.0, 8.0, 5)
    assert abs(mag_db(sos, 23900.0)[0] - 8.0) < 0.05
    assert abs(mag_db(sos, 10.0)[0]) < 0.05


def test_chebyshev1_shelves():
    sos = design.chebyshev1_low_shelf(SR, 500.0, 12.0, 1.0, 4)
    assert abs(mag_db(sos, 1.0)[0] - 12.0) < 0.5
    assert abs(mag_db(sos, 20000.0)[0]) < 0.5
    hs = design.chebyshev1_high_shelf(SR, 5000.0, -9.0, 0.5, 3)
    assert abs(mag_db(hs, 23900.0)[0] + 9.0) < 0.5
    assert abs(mag_db(hs, 10.0)[0]) < 0.5


def test_chebyshev2_shelves():
    sos = design.chebyshev2_low_shelf(SR, 500.0, 12.0, 3.0, 4)
    # realized as Butterworth at gain-stopband
    assert abs(mag_db(sos, 1.0)[0] - 9.0) < 0.1
    cut = design.chebyshev2_low_shelf(SR, 500.0, -12.0, 3.0, 4)
    assert abs(mag_db(cut, 1.0)[0] + 9.0) < 0.1
    with pytest.raises(design.ShelvingParamError):
        design.chebyshev2_low_shelf(SR, 500.0, 2.0, 3.0, 4)  # stopband >= gain


def test_shelving_zero_gain_and_validation():
    np.testing.assert_array_equal(
        design.butterworth_low_shelf(SR, 500.0, 0.0, 4),
        [[1.0, 0.0, 0.0, 0.0, 0.0]])
    with pytest.raises(design.ShelvingParamError):
        design.butterworth_low_shelf(SR, 30000.0, 6.0, 4)


# -- Orfanidis peak ---------------------------------------------------------

def test_peak_raw_prescribed_gains():
    # The formula mirrors peak_orfanidis.go:28-126 (including its plain
    # q-product in C/D, which restricts solvability to the inverted-gain
    # regime G < 1 and only guarantees the DC/Nyquist anchors — that is
    # exactly why the reference validates the center gain and silently
    # falls back to RBJ, design.go:112-120 / peak_orfanidis.go:190-200).
    G0, G1, G, GB = 1.0, 0.9, 0.5, 0.707
    w0, dw = 0.3 * np.pi, 0.1 * np.pi
    c = design.peak_raw(G0, G1, G, GB, w0, dw)
    assert abs(np.abs(sos_response(c, 1e-9, SR))[0] - G0) < 1e-6
    assert abs(np.abs(sos_response(c, SR / 2 - 1e-6, SR))[0] - G1) < 1e-3


def test_peak_raw_invalid():
    with pytest.raises(design.orfanidis.PeakParamError):
        design.peak_raw(-1.0, 1.0, 2.0, 1.4, 0.3, 0.1)
    with pytest.raises(design.orfanidis.PeakParamError):
        design.peak_raw(1.0, 1.0, 2.0, 1.4, 4.0, 0.1)  # w0 > pi


def test_peak_with_nyquist_gain_falls_back_cleanly():
    # RBJ fallback keeps the center gain even if Orfanidis can't
    out = design.peak(1000.0, 12.0, 2.0, SR, nyquist_gain_db=0.0)
    assert out.shape == (5,)
    assert abs(mag_db(out, 1000.0)[0] - 12.0) < 1.0


def test_peak_cascade():
    sos = design.peak_cascade(SR, 1000.0, 2.0, 12.0, 3)
    assert sos.shape == (3, 5)
    assert abs(mag_db(sos, 1000.0)[0] - 12.0) < 0.05
