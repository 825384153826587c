import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu import signal


SR = 48000.0


def test_sine():
    x = np.asarray(signal.sine(1000.0, 0.5, 480, SR, dtype=jnp.float64))
    t = np.arange(480)
    expected = 0.5 * np.sin(2 * np.pi * 1000.0 * t / SR)
    np.testing.assert_allclose(x, expected, atol=1e-12)


def test_multisine():
    x = np.asarray(signal.multisine([1000.0, 2000.0], 1.0, 480, SR, dtype=jnp.float64))
    t = np.arange(480)
    expected = 0.5 * (np.sin(2 * np.pi * 1000.0 * t / SR) +
                      np.sin(2 * np.pi * 2000.0 * t / SR))
    np.testing.assert_allclose(x, expected, atol=1e-12)


def test_impulse():
    x = np.asarray(signal.impulse(2.0, 16, 3))
    assert x[3] == 2.0
    assert np.sum(np.abs(x)) == 2.0
    with pytest.raises(ValueError):
        signal.impulse(1.0, 16, 16)


def test_linear_sweep_instantaneous_freq():
    # At t=0 freq ~ start; phase formula check
    x = np.asarray(signal.linear_sweep(100.0, 1000.0, 1.0, 4800, SR, dtype=jnp.float64))
    dur = 4800 / SR
    k = (1000.0 - 100.0) / dur
    t = np.arange(4800) / SR
    expected = np.sin(2 * np.pi * (100.0 * t + 0.5 * k * t * t))
    np.testing.assert_allclose(x, expected, atol=1e-9)


def test_log_sweep_phase():
    n = 4800
    x = np.asarray(signal.log_sweep(20.0, 20000.0, 1.0, n, SR, dtype=jnp.float64))
    dur = n / SR
    k = np.log(20000.0 / 20.0) / dur
    t = np.arange(n) / SR
    expected = np.sin(2 * np.pi * 20.0 * (np.exp(k * t) - 1) / k)
    np.testing.assert_allclose(x, expected, atol=1e-7)


def test_white_noise_stats():
    x = np.asarray(signal.white_noise(1.0, 100000, seed=1))
    assert np.all(np.abs(x) <= 1.0)
    assert abs(x.mean()) < 0.01
    # uniform variance = 1/3
    assert abs(x.var() - 1 / 3) < 0.01
    # determinism
    y = np.asarray(signal.white_noise(1.0, 100000, seed=1))
    np.testing.assert_array_equal(x, y)


def test_pink_noise_spectrum_slope():
    x = np.asarray(signal.pink_noise(1.0, 2 ** 16, seed=1)).astype(np.float64)
    assert np.all(np.isfinite(x))
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(x.size, 1 / SR)
    # average power in octave bands should fall ~3 dB/octave
    def band_power(lo, hi):
        m = (freqs >= lo) & (freqs < hi)
        return spec[m].mean()
    p1 = band_power(100, 200)
    p2 = band_power(1600, 3200)
    slope_db_per_oct = 10 * np.log10(p2 / p1) / 4  # 4 octaves apart
    assert -4.5 < slope_db_per_oct < -1.5, slope_db_per_oct


def test_normalize():
    x = np.array([0.1, -0.5, 0.25])
    out = np.asarray(signal.normalize(x, 1.0))
    np.testing.assert_allclose(out, [0.2, -1.0, 0.5], atol=1e-12)
    # zero signal stays zero
    np.testing.assert_allclose(np.asarray(signal.normalize(np.zeros(4), 1.0)), np.zeros(4))


def test_clip_remove_dc():
    x = np.array([-2.0, 0.5, 2.0])
    np.testing.assert_allclose(np.asarray(signal.clip(x, -1.0, 1.0)), [-1.0, 0.5, 1.0])
    y = np.asarray(signal.remove_dc(np.array([1.0, 2.0, 3.0])))
    np.testing.assert_allclose(y, [-1.0, 0.0, 1.0], atol=1e-12)


def test_envelope_follower_matches_oracle():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(256)
    attack, release = 0.5, 0.05
    out = np.asarray(signal.envelope_follower(jnp.asarray(x), attack, release))

    env = 0.0
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        target = abs(v)
        coeff = attack if target > env else release
        env += coeff * (target - env)
        expected[i] = env
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_envelope_follower_batched():
    x = np.abs(np.random.default_rng(6).standard_normal((3, 128)))
    out = np.asarray(signal.envelope_follower(jnp.asarray(x), 0.3, 0.1))
    assert out.shape == (3, 128)
    # each channel independent
    single = np.asarray(signal.envelope_follower(jnp.asarray(x[1]), 0.3, 0.1))
    np.testing.assert_allclose(out[1], single, atol=1e-12)
