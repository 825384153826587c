"""Goertzel tests: matmul formulation vs the sequential reference
recurrence (the analog of the reference's SIMD-vs-generic dispatch
tests, SURVEY.md §4.4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.spectrum import Goertzel, goertzel_power, goertzel_magnitude


def sequential_goertzel(x, freq, sr):
    """Direct port of the reference recurrence (goertzel.go:72-97) as a
    float64 oracle."""
    coeff = 2.0 * np.cos(2.0 * np.pi * freq / sr)
    s0 = s1 = 0.0
    for v in x:
        s = v + coeff * s0 - s1
        s1 = s0
        s0 = s
    return s0 * s0 + s1 * s1 - coeff * s0 * s1


def test_matches_sequential_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(512)
    sr = 48000.0
    for freq in [0.0, 440.0, 1000.0, 12345.6, 24000.0]:
        expected = sequential_goertzel(x, freq, sr)
        got = float(goertzel_power(jnp.asarray(x), freq, sr))
        np.testing.assert_allclose(got, expected, rtol=1e-9, err_msg=f"f={freq}")


def test_tone_detection():
    sr = 8000.0
    n = 400
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 697.0 * t)  # DTMF row 1
    freqs = [697.0, 770.0, 852.0, 941.0]
    p = np.asarray(goertzel_power(jnp.asarray(x), freqs, sr))
    assert np.argmax(p) == 0
    assert p[0] > 100 * p[1]


def test_magnitude_matches_dft():
    # For bin-centered frequency, Goertzel magnitude == |DFT bin|
    sr = 48000.0
    n = 480
    freq = 10 * sr / n
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * freq * t) * 0.5
    mag = float(goertzel_magnitude(jnp.asarray(x), freq, sr))
    dft = np.abs(np.fft.rfft(x))[10]
    np.testing.assert_allclose(mag, dft, rtol=1e-9)


def test_streaming_blocks_equal_one_shot():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(1024)
    sr = 44100.0
    g = Goertzel([1000.0, 2000.0], sr)
    state = g.init_state(dtype=jnp.float64)
    for blk in x.reshape(8, 128):
        state = g.process_block(state, jnp.asarray(blk))
    p_stream = np.asarray(g.power(state))
    p_once = np.asarray(goertzel_power(jnp.asarray(x), [1000.0, 2000.0], sr))
    np.testing.assert_allclose(p_stream, p_once, rtol=1e-8)


def test_batched_channels():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((4, 256))
    sr = 48000.0
    p = np.asarray(goertzel_power(jnp.asarray(x), [500.0, 1500.0], sr))
    assert p.shape == (4, 2)
    for ch in range(4):
        for j, f in enumerate([500.0, 1500.0]):
            np.testing.assert_allclose(p[ch, j], sequential_goertzel(x[ch], f, sr),
                                       rtol=1e-9)


def test_validation():
    with pytest.raises(ValueError):
        Goertzel(1000.0, -1.0)
    with pytest.raises(ValueError):
        Goertzel(30000.0, 48000.0)  # above Nyquist
    with pytest.raises(ValueError):
        Goertzel(-1.0, 48000.0)
