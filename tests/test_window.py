"""Window tests — analytic oracles, mirroring the reference's strategy
(`dsp/window/window_test.go`): closed-form values, symmetry, ENBW vs
published metadata, option semantics."""

import numpy as np
import pytest

from algodsp_tpu import window
from algodsp_tpu.window import WindowType, Slope


ALL_TYPES = list(WindowType)


def test_hann_closed_form():
    n = 16
    w = window.generate(WindowType.HANN, n)
    i = np.arange(n)
    expected = 0.5 - 0.5 * np.cos(2 * np.pi * i / (n - 1))
    np.testing.assert_allclose(w, expected, atol=1e-15)


def test_hann_periodic():
    n = 16
    w = window.generate(WindowType.HANN, n, periodic=True)
    i = np.arange(n)
    expected = 0.5 - 0.5 * np.cos(2 * np.pi * i / n)
    np.testing.assert_allclose(w, expected, atol=1e-15)


def test_symmetric_windows_are_symmetric():
    for t in ALL_TYPES:
        if t == WindowType.FREE_COSINE:
            continue
        w = window.generate(t, 33, alpha=2.0)
        np.testing.assert_allclose(w, w[::-1], atol=1e-12, err_msg=str(t))


def test_all_windows_peak_near_one():
    # symmetric odd-length windows peak at the center with value ~sum of coeffs
    for t in ALL_TYPES:
        if t in (WindowType.FREE_COSINE,):
            continue
        w = window.generate(t, 65, alpha=2.0)
        # some optimized families (Lawrey, FlatTop) slightly overshoot 1.0
        assert 0.9 <= w[32] <= 1.01, f"{t}: center={w[32]}"


def test_metadata_enbw_matches_numeric():
    # published ENBW vs numerically computed ENBW for large N
    for t, tol in [(WindowType.HANN, 0.01), (WindowType.HAMMING, 0.01),
                   (WindowType.BLACKMAN, 0.01), (WindowType.FLAT_TOP, 0.01),
                   (WindowType.BLACKMAN_HARRIS_4TERM, 0.01)]:
        w = window.generate(t, 4096)
        enbw = window.equivalent_noise_bandwidth(w)
        meta = window.info(t)
        assert abs(enbw - meta.enbw) < tol, f"{t}: {enbw} vs {meta.enbw}"


def test_kaiser_beta_zero_is_rectangular():
    w = window.generate(WindowType.KAISER, 32, alpha=0.0)
    np.testing.assert_allclose(w, np.ones(32), atol=1e-15)


def test_kaiser_analyze_sidelobe():
    # Kaiser beta=8.6 should have sidelobes below -60 dB
    w = window.generate(WindowType.KAISER, 512, alpha=8.6)
    a = window.analyze(w)
    assert a.highest_sidelobe_db < -60


def test_tukey_limits():
    n = 64
    # alpha=0 -> rectangular
    np.testing.assert_allclose(window.generate(WindowType.TUKEY, n, alpha=0.0),
                               np.ones(n), atol=1e-15)
    # alpha=1 -> Hann
    np.testing.assert_allclose(window.generate(WindowType.TUKEY, n, alpha=1.0),
                               window.generate(WindowType.HANN, n), atol=1e-15)


def test_triangle_and_bartlett():
    w = window.generate(WindowType.TRIANGLE, 5)
    np.testing.assert_allclose(w, [0.0, 0.5, 1.0, 0.5, 0.0], atol=1e-15)
    wb = window.generate(WindowType.TRIANGLE, 5, bartlett=True)
    np.testing.assert_allclose(wb, [0.0, 0.5, 1.0, 0.5, 0.0], atol=1e-15)


def test_slope_left_right():
    n = 64
    w = window.generate(WindowType.HANN, n, slope=Slope.LEFT)
    assert np.all(w[n // 2:] == 1.0)
    assert w[0] < 1e-10
    w = window.generate(WindowType.HANN, n, slope=Slope.RIGHT)
    # x = i/(n-1) <= 0.5 holds for i <= 31 when n=64
    assert np.all(w[: n // 2] == 1.0)
    assert w[-1] < 1e-10


def test_invert_and_dc_removal():
    w = window.generate(WindowType.HANN, 64)
    wi = window.generate(WindowType.HANN, 64, invert=True)
    np.testing.assert_allclose(wi, 1.0 - w, atol=1e-15)
    wdc = window.generate(WindowType.HANN, 64, dc_removal=True)
    assert abs(wdc.mean()) < 1e-15


def test_free_cosine():
    coeffs = (0.4, -0.5, 0.1)
    w = window.generate(WindowType.FREE_COSINE, 32, custom_coeffs=coeffs)
    x = np.arange(32) / 31.0
    expected = sum(c * np.cos(2 * np.pi * k * x) for k, c in enumerate(coeffs))
    np.testing.assert_allclose(w, expected, atol=1e-15)
    # no coeffs -> all ones
    np.testing.assert_allclose(window.generate(WindowType.FREE_COSINE, 8), np.ones(8))


def test_apply_broadcasts_channels():
    x = np.ones((3, 32), dtype=np.float32)
    y = np.asarray(window.apply(x, WindowType.HANN))
    w = window.generate(WindowType.HANN, 32)
    for ch in range(3):
        np.testing.assert_allclose(y[ch], w.astype(np.float32), rtol=1e-6)


def test_apply_coefficients_mismatch_raises():
    with pytest.raises(ValueError):
        window.apply_coefficients(np.ones(8), np.ones(9))


def test_enbw_rectangular_is_one():
    assert abs(window.equivalent_noise_bandwidth(np.ones(128)) - 1.0) < 1e-12


def test_analyze_hann():
    w = window.generate(WindowType.HANN, 1024)
    a = window.analyze(w)
    assert abs(a.enbw - 1.5) < 0.01
    assert abs(a.coherent_gain - 0.5) < 0.01
    assert abs(a.highest_sidelobe_db - (-31.5)) < 0.5
    # Hann first null at 2 bins
    assert abs(a.first_minimum_bins - 2.0) < 0.1
    # Hann scallop loss ~ -1.42 dB
    assert abs(a.scallop_loss_db - (-1.42)) < 0.05
    # 3 dB bandwidth ~ 1.44 bins
    assert abs(a.bandwidth_3db - 1.44) < 0.05


def test_analyze_rectangular():
    a = window.analyze(np.ones(1024))
    assert abs(a.enbw - 1.0) < 1e-6
    assert abs(a.highest_sidelobe_db - (-13.26)) < 0.2
    assert abs(a.first_minimum_bins - 1.0) < 0.05
    assert abs(a.scallop_loss_db - (-3.92)) < 0.05


def test_generate_zero_length():
    assert window.generate(WindowType.HANN, 0).size == 0
