"""Closed-form parity oracles for the dynamics family and Orfanidis peak.

Hardened parity evidence (the analog of the reference's legacy-parity
tests, `dsp/effects/dynamics/legacy_parity_test.go:8-60`): instead of
re-derived simulations, these assert *analytically derivable* points of
the static transfer curves, so a shared misunderstanding between
implementation and oracle can't pass silently.

Static-curve algebra (from `core.go:288-329` GainForLevel, log2 domain;
gains in dB below, W = knee width, T = threshold, R = ratio):
  level = T - W/2 ......... gain = 0 dB            (below knee: unity)
  level = T ............... gain = -(W/8)(1-1/R)   (quadratic knee mid)
  level = T + W/2 ......... gain = -(W/2)(1-1/R)   (knee top)
  level = T + X (X>W/2) ... gain = -X(1-1/R)       (straight segment)
Hard knee (W=0): gain = -max(X,0)(1-1/R) exactly.

Downward expansion (`expander.go:358-411`): undershoot U = T - level,
factor (R-1), same quadratic knee in U, clamped at -range.
"""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.effects.dynamics.core import (
    DynamicsConfig, DynamicsCore, compression_gain,
    downward_expansion_gain, LOG2_OF_10_DIV_20)
from algodsp_tpu.filters.design.orfanidis import peak_orfanidis
from algodsp_tpu.filters.biquad import magnitude_squared

SR = 48000.0


def _db(lin):
    return 20.0 * np.log10(np.maximum(np.asarray(lin, np.float64), 1e-300))


def _lin(db):
    return 10.0 ** (db / 20.0)


def _comp_gain_db(level_db, threshold_db, ratio, knee_db):
    t_log2 = threshold_db * LOG2_OF_10_DIV_20
    w_log2 = knee_db * LOG2_OF_10_DIV_20
    inv_w = 1.0 / w_log2 if knee_db > 0 else 0.0
    cf = 1.0 - 1.0 / ratio
    g = compression_gain(jnp.asarray(_lin(np.asarray(level_db))),
                         t_log2, knee_db, w_log2, inv_w, cf)
    return _db(g)


@pytest.mark.parametrize("threshold,ratio,knee", [
    (-20.0, 4.0, 6.0), (-30.0, 2.0, 12.0), (-10.0, 10.0, 3.0)])
def test_compressor_static_curve_closed_form(threshold, ratio, knee):
    cf = 1.0 - 1.0 / ratio
    pts = np.array([threshold - knee / 2,          # knee bottom
                    threshold,                     # knee middle
                    threshold + knee / 2,          # knee top
                    threshold + knee])             # straight segment
    want = np.array([0.0,
                     -(knee / 8.0) * cf,
                     -(knee / 2.0) * cf,
                     -knee * cf])
    got = _comp_gain_db(pts, threshold, ratio, knee)
    np.testing.assert_allclose(got, want, atol=5e-5)
    # well below the knee: exactly unity
    assert _comp_gain_db(np.array([threshold - knee]),
                         threshold, ratio, knee)[0] == pytest.approx(0.0,
                                                                     abs=1e-9)


def test_compressor_hard_knee_closed_form():
    got = _comp_gain_db(np.array([-30.0, -20.0, -14.0, -8.0]),
                        -20.0, 4.0, 0.0)
    np.testing.assert_allclose(got, [0.0, 0.0, -4.5, -9.0], atol=5e-5)


def test_expander_static_curve_closed_form():
    """Downward expansion: at U dB under threshold, gain = -U(R-1),
    quadratic knee mirrored, clamped at -range."""
    threshold, ratio, knee, range_db = -40.0, 3.0, 8.0, 60.0
    t_log2 = threshold * LOG2_OF_10_DIV_20
    w_log2 = knee * LOG2_OF_10_DIV_20
    factor = ratio - 1.0
    pts_db = np.array([threshold + knee / 2,   # above knee: unity
                       threshold,              # knee middle
                       threshold - knee / 2,   # knee edge
                       threshold - knee])      # straight segment
    want = np.array([0.0,
                     -(knee / 8.0) * factor,
                     -(knee / 2.0) * factor,
                     -knee * factor])
    g = downward_expansion_gain(
        jnp.asarray(_lin(pts_db)), t_log2, knee, w_log2, 1.0 / w_log2,
        ratio, _lin(-range_db))
    np.testing.assert_allclose(_db(g), want, atol=5e-5)
    # deep undershoot clamps at -range
    g_deep = downward_expansion_gain(
        jnp.asarray(_lin(np.array([threshold - 80.0]))), t_log2, knee,
        w_log2, 1.0 / w_log2, ratio, _lin(-range_db))
    assert _db(g_deep)[0] == pytest.approx(-range_db, abs=5e-4)


def test_core_gain_for_level_matches_closed_form():
    """The DynamicsCore wrapper (with its config plumbing) hits the same
    closed-form points — guards the threshold/knee unit conversions."""
    cfg = DynamicsConfig(sample_rate=SR, threshold_db=-24.0, ratio=4.0,
                         knee_db=6.0)
    core = DynamicsCore(cfg)
    g_mid = float(core.gain_for_level(jnp.asarray(_lin(-24.0))))
    assert _db(g_mid) == pytest.approx(-(6.0 / 8.0) * 0.75, abs=5e-5)
    g_top = float(core.gain_for_level(jnp.asarray(_lin(-21.0))))
    assert _db(g_top) == pytest.approx(-(6.0 / 2.0) * 0.75, abs=5e-5)


@pytest.mark.parametrize("gain_db,q", [(6.0, 1.0), (-9.0, 2.5), (12.0, 0.7)])
def test_orfanidis_prescribed_gains_exact(gain_db, q):
    """peak_raw's whole point: |H| at DC, Nyquist, center, and band
    edges equals the PRESCRIBED gains (Orfanidis 1997 eq. 14-24).

    The designer's dB mapping is inverted (peak_orfanidis.go:170-177):
    the realized center gain is +gain_db."""
    freq = 1000.0
    sos = peak_orfanidis(freq, gain_db, q, SR)
    assert sos is not None
    # center gain: prescribed +gain_db
    mag_c = math.sqrt(float(magnitude_squared(sos, freq, SR)[0]))
    assert _db(mag_c) == pytest.approx(gain_db, abs=1e-2)
    # DC and Nyquist: unity by default
    for f_edge in (1e-6, SR / 2 - 1e-6):
        m = math.sqrt(float(magnitude_squared(sos, f_edge, SR)[0]))
        assert _db(m) == pytest.approx(0.0, abs=1e-3)


def test_orfanidis_prescribed_dc_nyquist_gains():
    sos = peak_orfanidis(2000.0, 8.0, 1.2, SR, dc_gain_db=2.0,
                         nyquist_gain_db=-1.0)
    assert sos is not None
    m_dc = math.sqrt(float(magnitude_squared(sos, 1e-6, SR)[0]))
    m_ny = math.sqrt(float(magnitude_squared(sos, SR / 2 - 1e-6, SR)[0]))
    assert _db(m_dc) == pytest.approx(2.0, abs=1e-3)
    assert _db(m_ny) == pytest.approx(-1.0, abs=1e-3)
