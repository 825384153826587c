"""Filter-design tests with analytic oracles: response levels at DC,
cutoff, Nyquist; ripple bounds; standards tables for weighting."""

import math

import numpy as np
import pytest

from algodsp_tpu.filters import design
from algodsp_tpu.filters.biquad import sos_response, magnitude_squared
from algodsp_tpu.filters.weighting import WeightingType, weighting_chain

SR = 48000.0


def mag_db(sos, f, sr=SR):
    return 20.0 * np.log10(np.abs(sos_response(sos, f, sr)))


def test_rbj_lowpass_anchor_points():
    sos = design.lowpass(1000.0, 1 / math.sqrt(2), SR)
    assert abs(mag_db(sos, 1.0)[0]) < 1e-3            # DC ~ 0 dB
    assert abs(mag_db(sos, 1000.0)[0] + 3.01) < 0.05  # -3 dB at fc (Q=0.707)
    assert mag_db(sos, 20000.0)[0] < -40              # strong HF rejection


def test_rbj_highpass_anchor_points():
    sos = design.highpass(1000.0, 1 / math.sqrt(2), SR)
    assert abs(mag_db(sos, 23000.0)[0]) < 0.1
    assert abs(mag_db(sos, 1000.0)[0] + 3.01) < 0.05
    assert mag_db(sos, 50.0)[0] < -50


def test_rbj_bandpass_notch_allpass():
    bp = design.bandpass(1000.0, 5.0, SR)
    # constant-skirt-gain variant (design.go:49-69): peak gain = Q
    assert abs(mag_db(bp, 1000.0)[0] - 20 * math.log10(5.0)) < 0.01
    assert mag_db(bp, 100.0)[0] < -25 + 20 * math.log10(5.0)

    nt = design.notch(1000.0, 5.0, SR)
    assert mag_db(nt, 1000.0)[0] < -40           # deep null
    assert abs(mag_db(nt, 100.0)[0]) < 0.1

    ap = design.allpass(1000.0, 1.0, SR)
    freqs = np.linspace(20, 20000, 50)
    np.testing.assert_allclose(np.abs(sos_response(ap, freqs, SR)), 1.0, atol=1e-9)


def test_rbj_peak_and_shelves():
    pk = design.peak(1000.0, 12.0, 2.0, SR)
    assert abs(mag_db(pk, 1000.0)[0] - 12.0) < 0.01
    assert abs(mag_db(pk, 20.0)[0]) < 0.1

    ls = design.low_shelf(200.0, 6.0, 0.707, SR)
    assert abs(mag_db(ls, 1.0)[0] - 6.0) < 0.05
    assert abs(mag_db(ls, 20000.0)[0]) < 0.1

    hs = design.high_shelf(5000.0, -6.0, 0.707, SR)
    assert abs(mag_db(hs, 23000.0)[0] + 6.0) < 0.1
    assert abs(mag_db(hs, 20.0)[0]) < 0.05


def test_invalid_params_return_zero_coeffs():
    # freq out of range -> zero coefficients (design.go:192-211)
    np.testing.assert_array_equal(design.lowpass(-1.0, 1.0, SR), np.zeros(5))
    np.testing.assert_array_equal(design.lowpass(30000.0, 1.0, SR), np.zeros(5))
    # q <= 0 -> default Q
    np.testing.assert_allclose(design.lowpass(1000.0, 0.0, SR),
                               design.lowpass(1000.0, design.DEFAULT_Q, SR))


def test_bilinear_transform():
    out = design.bilinear_transform([0.0, 0.0, 1.0], SR)
    np.testing.assert_allclose(out, [1.0, 2.0, 1.0], atol=1e-12)
    out = design.bilinear_transform([1.0, 0.0, 0.0], 0.0)  # invalid sr
    np.testing.assert_allclose(out, [1.0, 0.0, 0.0])


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 6, 8, 10])
def test_butterworth_lp_minus3db_at_cutoff(order):
    sos = design.butterworth_lp(1000.0, order, SR)
    assert sos.shape[0] == (order + 1) // 2
    assert abs(mag_db(sos, 1000.0)[0] + 3.01) < 0.05
    assert abs(mag_db(sos, 1.0)[0]) < 1e-3
    # rolloff at least the analog -6*order dB/oct (BLT warp steepens it)
    d = mag_db(sos, 8000.0)[0] - mag_db(sos, 4000.0)[0]
    assert d < -6.02 * order * 0.9


@pytest.mark.parametrize("order", [2, 4, 7])
def test_butterworth_hp(order):
    sos = design.butterworth_hp(1000.0, order, SR)
    assert abs(mag_db(sos, 1000.0)[0] + 3.01) < 0.05
    assert mag_db(sos, 50.0)[0] < -20 * order / 2


def test_butterworth_passband_monotonic():
    sos = design.butterworth_lp(1000.0, 6, SR)
    freqs = np.linspace(10, 990, 200)
    m = np.abs(sos_response(sos, freqs, SR))
    assert np.all(np.diff(m) < 1e-6)  # monotonically decreasing


def test_chebyshev1_ripple_bounded():
    ripple_db = 1.0
    sos = design.chebyshev1_lp(1000.0, 6, ripple_db, SR)
    freqs = np.linspace(5, 995, 400)
    m_db = mag_db(sos, freqs)
    # legacy convention (MFFilter.pas): mu = asinh(rippleDB)/order, ripple
    # peaks sit ABOVE unity; swing stays bounded, stopband falls steeply.
    assert np.max(m_db) < 3.2
    assert np.min(m_db) > -0.1
    assert mag_db(sos, 4000.0)[0] < -60


def test_chebyshev1_hp():
    sos = design.chebyshev1_hp(1000.0, 4, 1.0, SR)
    assert mag_db(sos, 100.0)[0] < -40
    assert abs(mag_db(sos, 20000.0)[0]) < 1.0


def test_chebyshev2_flat_passband_stopband_ripple():
    sos = design.chebyshev2_lp(1000.0, 6, 40.0, SR)
    assert abs(mag_db(sos, 1.0)[0]) < 1e-3     # unity DC
    # passband nearly flat
    freqs = np.linspace(10, 500, 100)
    assert np.max(np.abs(mag_db(sos, freqs))) < 1.0
    sos_hp = design.chebyshev2_hp(1000.0, 6, 40.0, SR)
    assert abs(mag_db(sos_hp, 23900.0)[0]) < 0.01


@pytest.mark.parametrize("order", [1, 2, 3, 4, 5, 6, 7, 8, 9, 10])
def test_bessel_orders(order):
    sos = design.bessel_lp(1000.0, order, SR)
    assert sos is not None
    assert abs(mag_db(sos, 1.0)[0]) < 1e-3
    # -3 dB point near cutoff (Bessel -3dB normalization, loose tol)
    assert abs(mag_db(sos, 1000.0)[0] + 3.01) < 0.35
    hp = design.bessel_hp(1000.0, order, SR)
    assert abs(mag_db(hp, 23900.0)[0]) < 0.01
    assert abs(mag_db(hp, 1000.0)[0] + 3.01) < 0.35
    assert design.bessel_lp(1000.0, 11, SR) is None


def test_bessel_flat_group_delay():
    sos = design.bessel_lp(2000.0, 6, SR)
    freqs = np.linspace(50, 1500, 100)
    h = sos_response(sos, freqs, SR)
    ph = np.unwrap(np.angle(h))
    gd = -np.gradient(ph, freqs * 2 * np.pi)
    # group delay variation small in passband
    assert np.std(gd) / np.mean(gd) < 0.02


@pytest.mark.parametrize("order", [2, 4, 8])
def test_linkwitz_riley_crossover(order):
    lp = design.linkwitz_riley_lp(1000.0, order, SR)
    hp = design.linkwitz_riley_hp(1000.0, order, SR)
    assert abs(mag_db(lp, 1000.0)[0] + 6.02) < 0.1
    assert abs(mag_db(hp, 1000.0)[0] + 6.02) < 0.1
    # allpass summation (with polarity flip when needed)
    if design.linkwitz_riley_needs_hp_invert(order):
        hp = design.linkwitz_riley_hp_inverted(1000.0, order, SR)
    freqs = np.linspace(20, 20000, 200)
    total = sos_response(lp, freqs, SR) + sos_response(hp, freqs, SR)
    np.testing.assert_allclose(np.abs(total), 1.0, atol=1e-6)


def test_elliptic_lp_specs():
    rp, rs = 1.0, 60.0
    sos = design.elliptic_lp(1000.0, 6, rp, rs, SR)
    assert sos is not None
    freqs_pass = np.linspace(10, 990, 300)
    m_db = mag_db(sos, freqs_pass)
    # DC is normalized to the ripple bottom (elliptic.go:649-677), so the
    # even-order passband rides in [0, +rp] dB
    assert np.max(m_db) < rp + 0.05
    assert np.min(m_db) > -0.05
    freqs_stop = np.linspace(1500, 20000, 300)
    assert np.max(mag_db(sos, freqs_stop)) < -(rs - 1.0)


def test_elliptic_hp_specs():
    rp, rs = 0.5, 50.0
    sos = design.elliptic_hp(2000.0, 5, rp, rs, SR)
    assert sos is not None
    freqs_pass = np.linspace(2050, 23000, 300)
    m_db = mag_db(sos, freqs_pass)
    assert np.max(m_db) < rp + 0.05
    assert np.min(m_db) > -(rp + 0.1)
    freqs_stop = np.linspace(20, 1300, 300)
    assert np.max(mag_db(sos, freqs_stop)) < -(rs - 1.0)


def test_elliptic_invalid():
    assert design.elliptic_lp(1000.0, 0, 1.0, 60.0, SR) is None
    assert design.elliptic_lp(1000.0, 4, 0.0, 60.0, SR) is None
    assert design.elliptic_lp(1000.0, 4, 60.0, 1.0, SR) is None  # rs <= rp


# IEC 61672-1 Table values (dB) — the reference asserts these within
# 0.5 dB (`weighting_test.go:138-162`); digital BLT deviates more near
# Nyquist so the top band uses a looser tolerance.
IEC_A = {63: -26.2, 125: -16.1, 250: -8.6, 500: -3.2, 1000: 0.0,
         2000: 1.2, 4000: 1.0, 8000: -1.1}
IEC_C = {63: -0.8, 125: -0.2, 250: 0.0, 500: 0.0, 1000: 0.0,
         2000: -0.2, 4000: -0.8, 8000: -3.0}


@pytest.mark.parametrize("wtype,table", [
    (WeightingType.A, IEC_A), (WeightingType.C, IEC_C)])
def test_weighting_iec61672(wtype, table):
    chain = weighting_chain(wtype, SR)
    for f, expected in table.items():
        got = float(chain.magnitude_db(f, SR)[0])
        # 0.5 dB below 4 kHz (reference tolerance, weighting_test.go:138-162);
        # the bilinear transform deviates more approaching Nyquist
        tol = 0.5 if f <= 4000 else 1.0
        assert abs(got - expected) < tol, f"{wtype} {f} Hz: {got} vs {expected}"


def test_weighting_z_is_unity():
    chain = weighting_chain(WeightingType.Z, SR)
    freqs = np.linspace(20, 20000, 50)
    np.testing.assert_allclose(np.abs(chain.response(freqs, SR)), 1.0, atol=1e-12)


def test_weighting_b():
    chain = weighting_chain(WeightingType.B, SR)
    assert abs(float(chain.magnitude_db(1000.0, SR)[0])) < 0.01
    # B-weighting at 63 Hz: -9.3 dB per IEC 61672
    assert abs(float(chain.magnitude_db(63.0, SR)[0]) + 9.3) < 0.5
