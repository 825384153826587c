"""FIR runtime and crossover tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.filters import FIRFilter, Crossover, MultiBand
from tests.conftest import snr_db

SR = 48000.0


def test_fir_matches_numpy_convolve():
    rng = np.random.default_rng(1)
    h = rng.standard_normal(33)
    x = rng.standard_normal(500)
    f = FIRFilter(h)
    y = np.asarray(f.process(jnp.asarray(x)))
    expected = np.convolve(x, h)[:500]
    assert snr_db(expected, y) > 200


def test_fir_streaming():
    rng = np.random.default_rng(2)
    h = rng.standard_normal(64)
    x = rng.standard_normal(1000)
    f = FIRFilter(h)
    expected = np.convolve(x, h)[:1000]

    state = f.init_state(dtype=jnp.float64)
    outs = []
    for lo, hi in [(0, 100), (100, 137), (137, 600), (600, 1000)]:
        state, y = f.process_stream(state, jnp.asarray(x[lo:hi]))
        outs.append(np.asarray(y))
    assert snr_db(expected, np.concatenate(outs)) > 200


def test_fir_batched():
    rng = np.random.default_rng(3)
    h = rng.standard_normal(16)
    x = rng.standard_normal((4, 256))
    f = FIRFilter(h)
    y = np.asarray(f.process(jnp.asarray(x)))
    for ch in range(4):
        assert snr_db(np.convolve(x[ch], h)[:256], y[ch]) > 200


def test_fir_single_tap_and_response():
    f = FIRFilter([2.0])
    y = np.asarray(f.process(jnp.asarray(np.ones(8))))
    np.testing.assert_allclose(y, 2.0)
    with pytest.raises(ValueError):
        FIRFilter([])
    # moving average response: null at fs/taps multiples
    f = FIRFilter(np.ones(4) / 4)
    h = f.frequency_response([0.0, SR / 4], SR)
    assert abs(abs(h[0]) - 1.0) < 1e-12
    assert abs(h[1]) < 1e-12


def _allpass_check(xo_order):
    # impulse response of lo+hi must be allpass: |FFT| == 1 once the IR
    # has fully decayed inside the window
    xo = Crossover(1000.0, xo_order, SR)
    imp = jnp.zeros(16384, dtype=jnp.float64).at[0].set(1.0)
    lo, hi = xo.process(imp)
    total = np.asarray(lo + hi)
    mag = np.abs(np.fft.rfft(total))
    np.testing.assert_allclose(mag, 1.0, atol=1e-6)


def test_crossover_reconstruction():
    _allpass_check(4)


def test_crossover_lr2_polarity():
    # LR2 needs HP inversion; the class applies it automatically
    _allpass_check(2)


def test_crossover_validation():
    with pytest.raises(ValueError):
        Crossover(1000.0, 3, SR)  # odd order
    with pytest.raises(ValueError):
        Crossover(30000.0, 4, SR)


def test_multiband_splits_and_sums():
    mb = MultiBand([200.0, 2000.0], 4, SR)
    assert mb.num_bands == 3
    imp = jnp.zeros(16384, dtype=jnp.float64).at[0].set(1.0)
    bands = mb.process(imp)
    assert len(bands) == 3
    total = np.asarray(sum(bands))
    mag = np.abs(np.fft.rfft(total))
    # serial 2-way tree without phase compensation: ~1.3% worst-case
    # magnitude ripple near the lower crossover is inherent (the lowest
    # band misses the upper stages' allpass phase), same as the reference
    np.testing.assert_allclose(mag, 1.0, atol=0.05)


def test_multiband_band_isolation():
    from algodsp_tpu import signal
    mb = MultiBand([200.0, 2000.0], 8, SR)
    tone = signal.sine(50.0, 1.0, 4096, SR, dtype=jnp.float64)
    bands = [np.asarray(b) for b in mb.process(tone)]
    powers = [float((b ** 2).sum()) for b in bands]
    assert powers[0] > 100 * powers[1] > 0
    tone = signal.sine(10000.0, 1.0, 4096, SR, dtype=jnp.float64)
    bands = [np.asarray(b) for b in mb.process(tone)]
    powers = [float((b ** 2).sum()) for b in bands]
    assert powers[2] > 100 * powers[1]


def test_multiband_validation():
    with pytest.raises(ValueError):
        MultiBand([], 4, SR)
    with pytest.raises(ValueError):
        MultiBand([1000.0, 500.0], 4, SR)  # not ascending


def test_fir_long_kernel_fft_path_matches_direct():
    # > 128 taps routes through fftconvolve; must equal the direct conv
    rng = np.random.default_rng(3)
    h = rng.standard_normal(200)
    x = jnp.asarray(rng.standard_normal((3, 1000)))
    from algodsp_tpu.filters.fir import _causal_conv, _FFT_TAPS
    assert len(h) > _FFT_TAPS
    f = FIRFilter(h)
    y_fft = np.asarray(f.process(x))
    y_ref = np.stack([np.convolve(np.asarray(x)[c], h)[:1000] for c in range(3)])
    assert snr_db(y_ref, y_fft) > 200
    # streaming must agree with one-shot across the fft path
    st = f.init_state((3,), dtype=jnp.float64)
    st, y1 = f.process_stream(st, x[..., :400])
    st, y2 = f.process_stream(st, x[..., 400:])
    y_stream = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    assert snr_db(y_ref, y_stream) > 200
