"""EBU Tech 3341 loudness-meter compliance cases (BS.1770 gating).

Standards-conformance tests in the style of the reference's IEC/R128
assertions (`measure/loudness/r128_test.go:10-50`, SURVEY.md §4.2).
Segment durations are shortened where the expected result is
duration-ratio-invariant, keeping the edge-block fraction at or below
the spec's (gating blocks straddling level transitions are the only
duration-sensitive term); tolerances are the spec's +/-0.1 LU.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.measure import loudness

SR = 48000.0


def _stereo_sine(level_dbfs: float, seconds: float) -> np.ndarray:
    n = int(round(seconds * SR))
    t = np.arange(n) / SR
    amp = 10.0 ** (level_dbfs / 20.0)
    mono = amp * np.sin(2 * np.pi * 997.0 * t)
    return np.tile(mono, (2, 1))


def _integrated(x: np.ndarray) -> float:
    m = loudness.Meter(SR, channels=x.shape[0], true_peak=False)
    state = m.init_state()
    _, reading = m.process(state, jnp.asarray(x, jnp.float32))
    return float(reading.integrated_lufs)


@pytest.mark.parametrize("level", [-23.0, -33.0])
def test_3341_case_1_2_absolute_level(level):
    """Cases 1-2: a steady stereo 997 Hz sine at L dBFS reads L LUFS."""
    x = _stereo_sine(level, 5.0)
    assert abs(_integrated(x) - level) < 0.1


def test_3341_case_3_relative_gating():
    """Case 3: -36 dBFS pads around a -23 dBFS tone are gated out by the
    -10 LU relative gate; I = -23.0 +/- 0.1."""
    x = np.concatenate([_stereo_sine(-36.0, 2.0),
                        _stereo_sine(-23.0, 20.0),
                        _stereo_sine(-36.0, 2.0)], axis=-1)
    assert abs(_integrated(x) - (-23.0)) < 0.1


def test_3341_case_4_absolute_gating():
    """Case 4: -72 dBFS pads fall below the -70 LUFS absolute gate."""
    x = np.concatenate([_stereo_sine(-72.0, 2.0),
                        _stereo_sine(-23.0, 20.0),
                        _stereo_sine(-72.0, 2.0)], axis=-1)
    assert abs(_integrated(x) - (-23.0)) < 0.1


def test_3341_case_5_level_steps():
    """Case 5: -26 / -20 / -26 dBFS at durations 2:1.005:2 integrates to
    -23.0 +/- 0.1 (all blocks pass both gates; energy mean by design)."""
    x = np.concatenate([_stereo_sine(-26.0, 5.0),
                        _stereo_sine(-20.0, 5.025),
                        _stereo_sine(-26.0, 5.0)], axis=-1)
    assert abs(_integrated(x) - (-23.0)) < 0.1


def test_3341_case_6_surround_weights():
    """Case 6: 3.0-style set — same tone on L, R, Ls, Rs with BS.1770-4
    surround weights G=1.41: loudness gains 10*log10((1+1+1.41*2)/2)
    over the stereo reading."""
    seg = _stereo_sine(-23.0, 4.0)
    x4 = np.tile(seg[:1], (4, 1))
    m = loudness.Meter(SR, channels=4, true_peak=False,
                       channel_weights=[1.0, 1.0, 1.41, 1.41])
    state = m.init_state()
    _, reading = m.process(state, jnp.asarray(x4, jnp.float32))
    expected = -23.0 + 10 * np.log10((1.0 + 1.0 + 1.41 * 2) / 2.0)
    assert abs(float(reading.integrated_lufs) - expected) < 0.1


def test_channel_weights_validation():
    with pytest.raises(ValueError):
        loudness.Meter(SR, channels=2, channel_weights=[1.0])
    with pytest.raises(ValueError):
        loudness.Meter(SR, channels=2, channel_weights=[1.0, -0.5])


def test_true_peak_flush_catches_trailing_peak():
    """A transient in the last few samples must appear in true_peaks:
    the one-shot `measure` flushes the 4x-oversampler's group delay, so
    an end-of-signal impulse reads the same true peak as a mid-signal
    one (without the flush the tail impulse reads ~0)."""
    n = 48000
    tail = np.zeros((1, n), np.float32)
    tail[0, -3] = 1.0  # impulse right at the end
    mid = np.zeros((1, n), np.float32)
    mid[0, n // 2] = 1.0
    tp_tail = float(loudness.measure(jnp.asarray(tail), SR).true_peaks[0])
    tp_mid = float(loudness.measure(jnp.asarray(mid), SR).true_peaks[0])
    assert abs(tp_tail - tp_mid) < 1e-3, (tp_tail, tp_mid)
    assert tp_tail > 0.9


def test_gating_block_zero_not_dropped():
    """First gating block survives the masked append (the first call's
    invalid scatter slots must not collide with block 0): its stored
    energy equals the first 400 ms mean square."""
    n = int(1.2 * SR)
    t = np.arange(n) / SR
    x = np.sin(2 * np.pi * 997.0 * t)[None, :]
    m = loudness.Meter(SR, 1, true_peak=False, max_blocks=16)
    state = m.init_state()
    state, _ = m.process(state, jnp.asarray(x))
    e0 = float(state["block_energies"][0])
    # 0.5 (sine ms) x the K-weighting gain at 997 Hz (~ +0.66 dB)
    assert abs(e0 - 0.5 * 10 ** (0.066)) < 0.01, e0
    assert int(state["block_count"]) == 9
