"""Resampler, delay-line, interpolation tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.resample import (
    Resampler, resample, approximate_ratio, quality_profile, Quality)
from algodsp_tpu import interp, delayline
from algodsp_tpu.delayline import DelayLine, delayed, fractional_read
from tests.conftest import snr_db


def go_resample_oracle(x, r):
    """Direct port of the Go streaming loop (resample.go:249-292) as an
    oracle (zero start state, one shot)."""
    out = []
    phase = 0
    input_index = 0
    last = len(x) - 1
    while input_index <= last:
        taps = r._bank[phase]
        y = 0.0
        for k in range(r.max_phase_len):
            idx = input_index - k
            if 0 <= idx <= last:
                y += taps[k] * x[idx]
        out.append(y)
        phase += r.down
        input_index += phase // r.up
        phase %= r.up
    return np.array(out)


@pytest.mark.parametrize("up,down", [(2, 1), (1, 2), (3, 2), (160, 147), (147, 160)])
def test_resampler_matches_go_loop(up, down):
    r = Resampler(up, down, quality=Quality.FAST)
    rng = np.random.default_rng(42)
    x = rng.standard_normal(512)
    got = np.asarray(r.process(jnp.asarray(x)))
    expected = go_resample_oracle(x, r)
    assert got.shape == expected.shape, (got.shape, expected.shape)
    assert snr_db(expected, got) > 180


def test_resampler_sine_preserved():
    # 1 kHz sine through 44.1k -> 48k keeps its frequency and amplitude
    r = Resampler.for_rates(44100.0, 48000.0)
    n = 44100
    t = np.arange(n) / 44100.0
    x = np.sin(2 * np.pi * 1000.0 * t)
    y = np.asarray(r.process(jnp.asarray(x)))
    assert y.size == r.output_len(n)
    # the causal polyphase FIR delays by (len(prototype)-1)/(2*up) input
    # samples — same as the Go reference's backward-tap loop
    gd_in = (r.taps.size - 1) / (2.0 * r.up) / 44100.0
    t2 = np.arange(y.size) / 48000.0 - gd_in
    expected = np.sin(2 * np.pi * 1000.0 * t2)
    # compare away from edges (filter transient)
    lo, hi = 2000, y.size - 2000
    assert snr_db(expected[lo:hi], y[lo:hi]) > 60


def test_resampler_streaming():
    r = Resampler(3, 2, quality=Quality.FAST)
    rng = np.random.default_rng(43)
    x = rng.standard_normal(600)
    y_once = np.asarray(r.process(jnp.asarray(x)))
    state = r.init_state(dtype=jnp.float64)
    outs = []
    for blk in x.reshape(3, 200):  # 200 % down==2 -> ok
        state, y = r.process_stream(state, jnp.asarray(blk))
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs)
    assert snr_db(y_once[:y_stream.size], y_stream) > 180
    with pytest.raises(ValueError):
        r.process_stream(state, jnp.zeros(201))


def test_approximate_ratio():
    assert approximate_ratio(48000 / 44100) == (160, 147)
    assert approximate_ratio(2.0) == (2, 1)
    assert approximate_ratio(0.5) == (1, 2)
    assert approximate_ratio(-1.0) == (1, 1)


def test_quality_profiles():
    assert quality_profile(Quality.FAST).taps_per_phase == 16
    assert quality_profile(Quality.BALANCED).taps_per_phase == 32
    assert quality_profile(Quality.BEST).taps_per_phase == 64


def test_resample_downsample_antialias():
    # energy above the new Nyquist must be attenuated
    n = 8192
    t = np.arange(n)
    x = np.sin(2 * np.pi * 0.4 * t)  # 0.4 cycles/sample > new nyquist 0.25
    y = np.asarray(resample(jnp.asarray(x), 1, 2, quality=Quality.BEST))
    assert np.sqrt(np.mean(y[100:-100] ** 2)) < 1e-3


# -- interp -----------------------------------------------------------------

def test_interp_kernels_exact_at_integer():
    xm1, x0, x1, x2 = 1.0, 2.0, 3.0, 4.0
    for f in [interp.hermite4, interp.lagrange4]:
        assert abs(float(f(0.0, xm1, x0, x1, x2)) - x0) < 1e-12
        assert abs(float(f(1.0, xm1, x0, x1, x2)) - x1) < 1e-12
    assert abs(float(interp.linear2(0.25, 2.0, 3.0)) - 2.25) < 1e-12


def test_interp_linear_on_line():
    # all kernels reproduce a straight line exactly
    pts = np.array([0.0, 1.0, 2.0, 3.0])
    for t in [0.2, 0.5, 0.9]:
        assert abs(float(interp.hermite4(t, *pts)) - (1 + t)) < 1e-12
        assert abs(float(interp.lagrange4(t, *pts)) - (1 + t)) < 1e-12


def test_lanczos_and_sinc_interp():
    # on a smooth sinusoid, higher-order kernels are accurate
    n = 64
    x = np.sin(2 * np.pi * 3 * np.arange(n) / n)
    t = 0.37
    center = 20
    samples6 = x[center - 2:center + 4]
    got = float(interp.lanczos6(t, jnp.asarray(samples6)))
    expected = np.sin(2 * np.pi * 3 * (center + t) / n)
    assert abs(got - expected) < 5e-3
    samples16 = x[center - 7:center + 9]
    got = float(interp.sinc_interp(t, jnp.asarray(samples16), 8))
    assert abs(got - expected) < 1e-3


def test_allpass_coeff():
    assert abs(float(interp.allpass_coeff(0.0)) - 1.0) < 1e-12
    assert abs(float(interp.allpass_coeff(1.0))) < 1e-12


# -- delayline --------------------------------------------------------------

def test_fractional_read_modes():
    x = np.sin(2 * np.pi * 2 * np.arange(256) / 256)
    pos = jnp.asarray(np.linspace(50.0, 60.0, 21))
    expected = np.sin(2 * np.pi * 2 * np.asarray(pos) / 256)
    for mode, tol in [(interp.Mode.LINEAR, 1e-2), (interp.Mode.HERMITE, 1e-4),
                      (interp.Mode.LAGRANGE3, 1e-4), (interp.Mode.LANCZOS3, 1e-4),
                      (interp.Mode.SINC, 1e-5)]:
        got = np.asarray(fractional_read(jnp.asarray(x), pos, mode))
        assert np.max(np.abs(got - expected)) < tol, mode


def test_fractional_read_out_of_range_zero():
    x = jnp.asarray(np.ones(16))
    got = np.asarray(fractional_read(x, jnp.asarray([-5.0, 100.0])))
    np.testing.assert_allclose(got, 0.0)


def test_delayed_integer():
    x = np.arange(16.0)
    y = np.asarray(delayed(jnp.asarray(x), 3.0))
    np.testing.assert_allclose(y[3:], x[:-3], atol=1e-6)
    np.testing.assert_allclose(y[:3], 0.0, atol=1e-6)


def test_delayline_streaming_continuity():
    dl = DelayLine(max_delay=50, mode=interp.Mode.HERMITE)
    rng = np.random.default_rng(44)
    x = rng.standard_normal(400)
    # one-shot reference with the same semantics
    y_ref = np.asarray(delayed(jnp.asarray(x), 37.5, interp.Mode.HERMITE))
    state = dl.init_state(dtype=jnp.float64)
    outs = []
    for blk in x.reshape(4, 100):
        state, y = dl.process(state, jnp.asarray(blk), 37.5)
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs)
    assert snr_db(y_ref[60:], y_stream[60:]) > 150


def test_delayline_modulated():
    dl = DelayLine(max_delay=30)
    x = np.sin(2 * np.pi * 0.01 * np.arange(200))
    d = 10.0 + 5.0 * np.sin(2 * np.pi * 0.005 * np.arange(200))
    state = dl.init_state(dtype=jnp.float64)
    _, y = dl.process(state, jnp.asarray(x), jnp.asarray(d))
    assert y.shape == (200,)
    assert np.all(np.isfinite(np.asarray(y)))


def test_walking_read_matches_gather():
    from algodsp_tpu.delayline import walking_read, fractional_read
    from algodsp_tpu.interp import Mode
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((3, 3000)))
    n = 2000
    t = np.arange(n)
    pos = 960.0 + t - (100.0 + 90.0 * np.sin(2 * np.pi * 0.8 * t / 48000.0 + 0.3))
    drift = 90.0 * 2 * np.pi * 0.8 / 48000.0
    for mode in (Mode.LINEAR, Mode.HERMITE, Mode.LAGRANGE3):
        yw = walking_read(x, jnp.asarray(pos), drift, mode)
        yg = fractional_read(x, jnp.broadcast_to(jnp.asarray(pos), (3, n)), mode)
        np.testing.assert_allclose(np.asarray(yw), np.asarray(yg), atol=1e-12)
    # non-divisible length + fast wobble exercises padding and small blocks
    yw = walking_read(x, jnp.asarray(pos[:1999]), 0.5, Mode.HERMITE)
    yg = fractional_read(x, jnp.broadcast_to(jnp.asarray(pos[:1999]), (3, 1999)),
                         Mode.HERMITE)
    np.testing.assert_allclose(np.asarray(yw), np.asarray(yg), atol=1e-12)
