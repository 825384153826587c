"""Biquad runtime tests: blocked-scan engine vs float64 per-sample
oracle (the analog of the reference's SIMD-vs-generic dispatch tests),
streaming continuity, response math."""

import numpy as np
import jax.numpy as jnp

from algodsp_tpu.filters import BiquadChain, Section
from algodsp_tpu.filters import biquad as bq
from algodsp_tpu.filters import design
from tests.conftest import snr_db


def df2t_oracle(sos, x, gain=1.0):
    """Per-sample DF2T float64 oracle (section.go:47-53, chain.go:59-72)."""
    sos = np.asarray(sos, dtype=np.float64).reshape(-1, 5)
    y = np.asarray(x, dtype=np.float64) * gain
    for b0, b1, b2, a1, a2 in sos:
        d0 = d1 = 0.0
        out = np.empty_like(y)
        for i, v in enumerate(y):
            o = b0 * v + d0
            d0 = b1 * v - a1 * o + d1
            d1 = b2 * v - a2 * o
            out[i] = o
        y = out
    return y


def test_blocked_matches_oracle_lowpass():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(1024)
    sos = design.lowpass(1000.0, 0.707, 48000.0)
    chain = BiquadChain(sos)
    y = np.asarray(chain.process(jnp.asarray(x)))
    expected = df2t_oracle(sos, x)
    assert snr_db(expected, y) > 200


def test_blocked_matches_oracle_high_q_cascade():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4096)
    sos = np.stack([
        design.peak(500.0, 12.0, 8.0, 48000.0),
        design.lowpass(2000.0, 4.0, 48000.0),
        design.highpass(100.0, 2.0, 48000.0),
    ])
    chain = BiquadChain(sos, gain=0.5)
    y = np.asarray(chain.process(jnp.asarray(x)))
    expected = df2t_oracle(sos, x, gain=0.5)
    assert snr_db(expected, y) > 150


def test_scan_mode_matches_blocked():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(512)
    sos = design.butterworth_lp(2000.0, 4, 48000.0)
    chain = BiquadChain(sos)
    y_b = np.asarray(chain.process(jnp.asarray(x), mode="blocked"))
    y_s = np.asarray(chain.process(jnp.asarray(x), mode="scan"))
    assert snr_db(y_s, y_b) > 200


def test_non_multiple_block_length():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(1000)  # not a multiple of 128
    sos = design.lowpass(3000.0, 1.0, 48000.0)
    chain = BiquadChain(sos)
    y = np.asarray(chain.process(jnp.asarray(x)))
    expected = df2t_oracle(sos, x)
    assert snr_db(expected, y) > 200


def test_streaming_blocks_equal_one_shot():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(1024)
    sos = design.butterworth_lp(1000.0, 6, 48000.0)
    chain = BiquadChain(sos)
    y_once = np.asarray(chain.process(jnp.asarray(x)))

    state = chain.init_state(dtype=jnp.float64)
    outs = []
    for blk in x.reshape(4, 256):
        state, y = chain.process_stream(state, jnp.asarray(blk))
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs)
    assert snr_db(y_once, y_stream) > 200


def test_streaming_odd_blocks():
    # streaming with block lengths not aligned to the engine block size
    rng = np.random.default_rng(6)
    x = rng.standard_normal(700)
    sos = design.highpass(500.0, 0.9, 48000.0)
    chain = BiquadChain(sos)
    expected = df2t_oracle(sos, x)

    state = chain.init_state(dtype=jnp.float64)
    outs = []
    for lo, hi in [(0, 100), (100, 350), (350, 700)]:
        state, y = chain.process_stream(state, jnp.asarray(x[lo:hi]))
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs)
    assert snr_db(expected, y_stream) > 200


def test_batched_channels():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((8, 512))
    sos = design.lowpass(4000.0, 0.707, 48000.0)
    chain = BiquadChain(sos)
    y = np.asarray(chain.process(jnp.asarray(x)))
    assert y.shape == (8, 512)
    for ch in range(8):
        assert snr_db(df2t_oracle(sos, x[ch]), y[ch]) > 200


def test_first_order_section():
    # B2=A2=0 sections (odd-order tails) must work in the blocked engine
    rng = np.random.default_rng(8)
    x = rng.standard_normal(512)
    sos = design.butterworth_lp(1000.0, 3, 48000.0)  # has first-order tail
    assert sos.shape[0] == 2
    y = np.asarray(BiquadChain(sos).process(jnp.asarray(x)))
    assert snr_db(df2t_oracle(sos, x), y) > 200


def test_response_vs_fft_of_impulse():
    sos = design.peak(2000.0, 6.0, 2.0, 48000.0)
    chain = Section(*sos)
    n = 8192
    ir = chain.impulse_response(n)
    spec = np.fft.rfft(ir)
    freqs = np.fft.rfftfreq(n, 1 / 48000.0)
    h = chain.response(freqs, 48000.0)
    # compare away from the very last bins
    assert snr_db(np.abs(h[:-10]), np.abs(spec[:-10])) > 80


def test_magnitude_squared_closed_form():
    sos = design.low_shelf(300.0, 6.0, 0.9, 44100.0)
    freqs = np.linspace(10, 20000, 64)
    h = bq.sos_response(sos, freqs, 44100.0)
    m2 = bq.magnitude_squared(sos, freqs, 44100.0)
    np.testing.assert_allclose(m2, np.abs(h) ** 2, rtol=1e-9)


def test_poles_zeros_and_stability():
    sos = design.lowpass(1000.0, 0.707, 48000.0)
    zeros, poles = bq.poles_zeros(sos)
    assert np.all(np.abs(poles) < 1.0)
    assert bq.is_stable(sos)
    # unstable section
    assert not bq.is_stable([[1.0, 0.0, 0.0, -2.1, 1.2]])


def test_update_coefficients_preserves_state_shape():
    chain = BiquadChain(design.lowpass(1000.0, 1.0, 48000.0))
    state = chain.init_state(dtype=jnp.float64)
    chain2 = chain.update_coefficients(design.lowpass(2000.0, 1.0, 48000.0))
    # same section count -> same state works (hot swap, chain.go:99-114)
    state2, _ = chain2.process_stream(state, jnp.zeros(128, dtype=jnp.float64))
    assert state2.shape == state.shape


def test_hot_swap_state_count_guard():
    """After `update_coefficients`, a stale state whose runtime section
    count no longer matches is rejected instead of silently sliced
    (`chain.go:99-114` contract); conditioning mode is preserved."""
    import pytest
    from algodsp_tpu.filters.weighting import WeightingType, weighting_chain
    sr = 48000.0
    aw = weighting_chain(WeightingType.A, sr)   # conditioning splits
    assert aw.num_runtime_sections > aw.num_sections
    state = aw.init_state((2,))
    swapped = aw.update_coefficients(design.butterworth_lp(2000.0, 3, sr))
    assert swapped._condition == aw._condition
    if swapped.num_runtime_sections != aw.num_runtime_sections:
        with pytest.raises(ValueError, match="hot-swap|section"):
            swapped.process_stream(state, jnp.zeros((2, 256), jnp.float32))
    # same-count swap keeps the state valid
    same = aw.update_coefficients(aw.sos)
    _, y = same.process_stream(state, jnp.zeros((2, 256), jnp.float32))
    assert y.shape == (2, 256)
