"""Multirate fractional-octave analyzer (`bank/analyzer.go:136-346`).

Parity checks: decimation-factor selection (`chooseDownsample`,
`analyzer.go:360-377`), envelope cutoff clamping (`analyzer.go:380-396`),
peak-band detection, agreement between multirate and native-rate
processing within passband tolerance, and exact streaming continuity.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.filters.bank import (MultirateOctaveAnalyzer,
                                      choose_downsample, clamp_envelope_hz)

SR = 48000.0


def _tone(freq, n, amp=0.5):
    t = np.arange(n) / SR
    return jnp.asarray(amp * np.sin(2 * np.pi * freq * t), jnp.float64)


def test_choose_downsample_matches_reference_rule():
    # analyzer.go:360-377: double while ds*high < sr/8 and ds <= max
    assert choose_downsample(48000.0, 17800.0, 64) == (1, 0)
    assert choose_downsample(48000.0, 1122.0, 64) == (8, 3)
    assert choose_downsample(48000.0, 22.4, 64) == (64, 6)
    assert choose_downsample(48000.0, 22.4, 8) == (8, 3)
    assert choose_downsample(48000.0, 0.0, 64) == (1, 0)
    assert choose_downsample(48000.0, 100.0, 0) == (1, 0)


def test_clamp_envelope_hz():
    assert clamp_envelope_hz(100.0, 48000.0) == 100.0
    assert clamp_envelope_hz(100.0, 48.0) == pytest.approx(24.0 * 0.45)
    assert clamp_envelope_hz(0.0, 48000.0) == 1.0
    assert clamp_envelope_hz(0.0, 10.0) == pytest.approx(0.5)


def test_band_metadata_and_groups():
    an = MultirateOctaveAnalyzer(3, SR)
    info = an.bands()
    assert len(info) == an.num_bands
    # centers ascending, downsample non-increasing
    centers = [b.center_hz for b in info]
    assert centers == sorted(centers)
    ds = [b.downsample for b in info]
    assert all(a >= b for a, b in zip(ds, ds[1:]))
    assert ds[-1] == 1 and ds[0] > 1
    for b in info:
        assert b.sample_rate == pytest.approx(SR / b.downsample)


def test_peak_band_detection():
    an = MultirateOctaveAnalyzer(3, SR, lower_hz=50.0)
    n = 3 * an.max_ds * ((SR // (3 * an.max_ds)) and int(0.5 * SR) // an.max_ds)
    n = (int(0.75 * SR) // an.max_ds) * an.max_ds
    state = an.init_state(dtype=jnp.float64)
    for freq in (100.0, 1000.0, 8000.0):
        _, peaks = an.process(state, _tone(freq, n))
        best = int(np.argmax(np.asarray(peaks)))
        assert abs(an.centers[best] - freq) / freq < 0.12, (freq, an.centers[best])


def test_multirate_matches_native_rate_in_passband():
    """Steady-state in-band levels agree with the non-resampling analyzer
    (`WithoutAnalyzerResampling`, analyzer.go:124-129) within tolerance."""
    an_mr = MultirateOctaveAnalyzer(1, SR, lower_hz=60.0, upper_hz=12000.0)
    an_nr = MultirateOctaveAnalyzer(1, SR, lower_hz=60.0, upper_hz=12000.0,
                                    resample=False)
    n = (int(1.0 * SR) // an_mr.max_ds) * an_mr.max_ds
    for freq in (125.0, 1000.0, 4000.0):
        x = _tone(freq, n)
        _, p_mr = an_mr.process(an_mr.init_state(dtype=jnp.float64), x)
        _, p_nr = an_nr.process(an_nr.init_state(dtype=jnp.float64), x)
        band = int(np.argmin(np.abs(an_mr.centers - freq)))
        db_mr = 20 * np.log10(float(p_mr[band]))
        db_nr = 20 * np.log10(float(p_nr[band]))
        # envelope smoothing designed at legacy envRate differs slightly;
        # passband tolerance per VERDICT done-criterion
        assert abs(db_mr - db_nr) < 1.0, (freq, db_mr, db_nr)


def test_streaming_continuity():
    an = MultirateOctaveAnalyzer(3, SR, lower_hz=100.0, upper_hz=8000.0)
    n = (int(0.5 * SR) // an.max_ds) * an.max_ds * 2
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(n), jnp.float64)
    state = an.init_state(dtype=jnp.float64)
    _, p_one = an.process(state, x)
    state = an.init_state(dtype=jnp.float64)
    state, _ = an.process(state, x[:n // 2])
    _, p_two = an.process(state, x[n // 2:])
    np.testing.assert_allclose(np.asarray(p_one), np.asarray(p_two),
                               rtol=1e-9, atol=1e-12)


def test_batched_channels():
    an = MultirateOctaveAnalyzer(1, SR, lower_hz=100.0, upper_hz=8000.0)
    n = (int(0.25 * SR) // an.max_ds) * an.max_ds
    x = jnp.stack([_tone(250.0, n), _tone(4000.0, n)])
    state = an.init_state((2,), dtype=jnp.float64)
    _, peaks = an.process(state, x)
    assert peaks.shape == (2, an.num_bands)
    b0 = int(np.argmax(np.asarray(peaks[0])))
    b1 = int(np.argmax(np.asarray(peaks[1])))
    assert abs(an.centers[b0] - 250.0) < 60.0
    assert abs(an.centers[b1] - 4000.0) < 900.0


def test_validation():
    with pytest.raises(ValueError):
        MultirateOctaveAnalyzer(3, SR, order=3)
    with pytest.raises(ValueError):
        MultirateOctaveAnalyzer(3, SR, envelope_order=5)
    with pytest.raises(ValueError):
        MultirateOctaveAnalyzer(3, -1.0)
    an = MultirateOctaveAnalyzer(3, SR)
    with pytest.raises(ValueError):
        an.process(an.init_state(), jnp.zeros(an.max_ds + 1))


def test_analyzer_streamed_matches_block_at_a_time(rng):
    """`scan_blocks` over the analyzer (the dispatch-floor-amortized
    bench form) carries all group states exactly: same floats as
    sequential process calls."""
    import functools
    import jax
    from algodsp_tpu.streaming import scan_blocks
    an = MultirateOctaveAnalyzer(3, SR, max_downsample=8)
    n = 1024
    x = np.asarray(rng.standard_normal((2, n * 4)), np.float64)
    st = an.init_state((2,), dtype=jnp.float64)
    f = jax.jit(functools.partial(scan_blocks, an.process, block_size=n))
    st_s, peaks_s = f(st, jnp.asarray(x))
    st_b = an.init_state((2,), dtype=jnp.float64)
    rows = []
    for b in range(4):
        st_b, p = an.process(st_b, jnp.asarray(x[:, b * n:(b + 1) * n]))
        rows.append(np.asarray(p))
    # scan stacks the per-block peaks on the block axis then merges on
    # the last axis: (2, 4*B) with block-major order
    want = np.concatenate(rows, axis=-1)
    np.testing.assert_array_equal(np.asarray(peaks_s), want)
    for a, b in zip(jax.tree_util.tree_leaves(st_s),
                    jax.tree_util.tree_leaves(st_b)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
