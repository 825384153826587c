"""Modulation effects + Hilbert + delay tests with Go-loop oracles."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.effects.modulation import (
    Chorus, Flanger, Phaser, Tremolo, RingModulator, AutoWah, FrequencyShifter)
from algodsp_tpu.effects.delay_effect import Delay
from algodsp_tpu.filters.hilbert import (
    HilbertTransformer, design_coefficients, attenuation_from_order_tbw)
from tests.conftest import snr_db

SR = 48000.0
TWO_PI = 2 * math.pi


def test_tremolo_matches_oracle():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(2048)
    tr = Tremolo(SR, rate_hz=5.0, depth=0.7, mix=0.8, smoothing_ms=2.0)
    state = tr.init_state(dtype=jnp.float64)
    _, y = tr.process(state, jnp.asarray(x))

    phase, mod = 0.0, 0.0
    sc = tr.smoothing_coeff
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        lfo = 0.5 * (1 + math.sin(phase))
        target = (1 - 0.7) + 0.7 * lfo
        mod += (target - mod) * sc
        wet = v * mod
        expected[i] = v * 0.2 + wet * 0.8
        phase = (phase + TWO_PI * 5.0 / SR) % TWO_PI
    assert snr_db(expected, np.asarray(y)) > 150


def test_ring_modulator_oracle():
    x = np.ones(1000)
    rm = RingModulator(SR, carrier_hz=440.0, mix=1.0)
    state = rm.init_state(dtype=jnp.float64)
    _, y = rm.process(state, jnp.asarray(x))
    expected = np.sin(TWO_PI * 440.0 * np.arange(1000) / SR)
    assert snr_db(expected, np.asarray(y)) > 140


def test_chorus_matches_oracle():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(2000)
    ch = Chorus(SR, speed_hz=1.0, depth_seconds=0.002,
                base_delay_seconds=0.01, mix=0.5, stages=2)
    state = ch.init_state(dtype=jnp.float64)
    _, y = ch.process(state, jnp.asarray(x))
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    # dry part present: correlation with input high at lag 0
    c = np.corrcoef(x, y)[0, 1]
    assert c > 0.5


def test_chorus_streaming_continuity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(2000)
    ch = Chorus(SR, stages=3)
    s1 = ch.init_state(dtype=jnp.float64)
    _, y_once = ch.process(s1, jnp.asarray(x))
    s2 = ch.init_state(dtype=jnp.float64)
    outs = []
    for blk in x.reshape(4, 500):
        s2, y = ch.process(s2, jnp.asarray(blk))
        outs.append(np.asarray(y))
    assert snr_db(np.asarray(y_once), np.concatenate(outs)) > 140


def test_flanger_oracle():
    rng = np.random.default_rng(4)
    x = rng.standard_normal(1200)
    fl = Flanger(SR, rate_hz=0.5, depth_seconds=0.001,
                 base_delay_seconds=0.002, feedback=0.4, mix=0.5)
    state = fl.init_state(dtype=jnp.float64)
    _, y = fl.process(state, jnp.asarray(x))

    # per-sample port of flanger.go:259-282
    L = fl.buf_len
    buf = np.zeros(L)
    phase, w = 0.0, 0
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        mod = 0.5 * (1 + math.sin(phase))
        d = max((0.002 + 0.001 * mod) * SR, 1.0)
        pos = w - d
        i0 = math.floor(pos)
        frac = pos - i0
        delayed = buf[i0 % L] * (1 - frac) + buf[(i0 + 1) % L] * frac
        buf[w % L] = v + delayed * 0.4
        phase = (phase + TWO_PI * 0.5 / SR) % TWO_PI
        w += 1
        expected[i] = v * 0.5 + delayed * 0.5
    assert snr_db(expected, np.asarray(y)) > 140


def test_phaser_oracle():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(1000)
    ph = Phaser(SR, rate_hz=1.0, stages=4, feedback=0.3, mix=0.5)
    state = ph.init_state(dtype=jnp.float64)
    _, y = ph.process(state, jnp.asarray(x))

    x1 = np.zeros(4)
    y1 = np.zeros(4)
    fb, phase = 0.0, 0.0
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        mod = 0.5 * (1 + math.sin(phase))
        freq = min(max(300.0 + (1600.0 - 300.0) * mod, 1.0), 0.45 * SR)
        g = math.tan(math.pi * freq / SR)
        a = (g - 1) / (g + 1)
        u = v + fb * 0.3
        for s in range(4):
            out = a * u + x1[s] - a * y1[s]
            x1[s] = u
            y1[s] = out
            u = out
        fb = u
        phase = (phase + TWO_PI * 1.0 / SR) % TWO_PI
        expected[i] = v * 0.5 + u * 0.5
    assert snr_db(expected, np.asarray(y)) > 140


def test_autowah_runs_and_wahs():
    # louder signal -> higher center frequency
    t = np.arange(4800) / SR
    x = np.sin(TWO_PI * 800 * t) * np.linspace(0.05, 1.0, 4800)
    aw = AutoWah(SR, min_freq_hz=400.0, max_freq_hz=2000.0, mix=1.0)
    state = aw.init_state(dtype=jnp.float64)
    _, y = aw.process(state, jnp.asarray(x))
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    # bandpass output: envelope rises with input level
    assert np.abs(y[-480:]).max() > np.abs(y[480:960]).max()


def test_delay_effect_oracle():
    rng = np.random.default_rng(6)
    x = rng.standard_normal(1000)
    dl = Delay(SR, delay_seconds=0.005, feedback=0.5, mix=0.5, smooth_ms=0.0)
    state = dl.init_state(dtype=jnp.float64)
    _, y = dl.process(state, jnp.asarray(x))

    L = dl.buf_len
    buf = np.zeros(L)
    w = 0
    d = round(0.005 * SR)
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        pos = (w - d) % L
        i0 = math.floor(pos)
        frac = pos - i0
        delayed = buf[i0 % L] * (1 - frac) + buf[(i0 + 1) % L] * frac
        buf[w % L] = v + delayed * 0.5
        w += 1
        expected[i] = v * 0.5 + delayed * 0.5
    assert snr_db(expected, np.asarray(y)) > 140


def test_delay_effect_oracle_tier1_ring():
    """Tier-1 aligned-ring path (N a multiple of 128, cursor aligned)
    vs the NumPy per-sample recurrence — CI coverage for the path that
    test_delay_effect_oracle's N=1000 (tier 2) misses."""
    rng = np.random.default_rng(61)
    x = rng.standard_normal(512)
    dl = Delay(SR, delay_seconds=0.005, feedback=0.5, mix=0.5, smooth_ms=0.0)
    state = dl.init_state(dtype=jnp.float64)
    _, y = dl.process(state, jnp.asarray(x))

    L = dl.buf_len
    buf = np.zeros(L)
    w = 0
    d = round(0.005 * SR)
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        pos = (w - d) % L
        i0 = math.floor(pos)
        frac = pos - i0
        delayed = buf[i0 % L] * (1 - frac) + buf[(i0 + 1) % L] * frac
        buf[w % L] = v + delayed * 0.5
        w += 1
        expected[i] = v * 0.5 + delayed * 0.5
    assert snr_db(expected, np.asarray(y)) > 140


def test_delay_validation():
    with pytest.raises(ValueError):
        Delay(SR, feedback=1.5)
    with pytest.raises(ValueError):
        Delay(SR, mix=2.0)


# -- Hilbert ---------------------------------------------------------------

def test_hilbert_design_coefficients():
    c = design_coefficients(8, 0.1)
    assert c.shape == (8,)
    assert np.all(np.abs(c) < 1.0)
    assert np.all(np.diff(c) > 0)  # monotonically increasing toward 1
    att = attenuation_from_order_tbw(8, 0.1)
    assert att > 60  # deep stopband for the default design


def test_hilbert_oracle_parity():
    """Per-sample port of hilbert64.go:283-306 vs the blocked engine."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(512)
    ht = HilbertTransformer(8, 0.1)
    a, b = ht.process(jnp.asarray(x))

    coeffs = ht.coeffs
    n_c = coeffs.size
    y_mem = [np.zeros(n_c), np.zeros(n_c)]
    x_mem = [np.zeros(n_c), np.zeros(n_c)]
    prev = 0.0
    phase = 0
    exp_a = np.empty_like(x)
    exp_b = np.empty_like(x)
    for i, v in enumerate(x):
        y = y_mem[phase]
        xm = x_mem[phase]
        y[0] = (v + y[0]) * coeffs[0] - xm[0]
        xm[0] = v
        y[1] = (prev + y[1]) * coeffs[1] - xm[1]
        xm[1] = prev
        for k in range(2, n_c):
            yk = (y[k - 2] + y[k]) * coeffs[k] - xm[k]
            xm[k] = y[k - 2]
            y[k] = yk
        exp_a[i] = y[n_c - 2]
        exp_b[i] = y[n_c - 1]
        prev = v
        phase = 1 - phase
    assert snr_db(exp_a, np.asarray(a)) > 140
    assert snr_db(exp_b, np.asarray(b)) > 140


def test_hilbert_presets():
    """Preset profiles mirror `hilbert/preset.go:34-45`."""
    from algodsp_tpu.filters.hilbert import Preset, preset_config
    assert preset_config(Preset.FAST) == (8, 0.1)
    assert preset_config(Preset.BALANCED) == (12, 0.06)
    assert preset_config(Preset.LOW_FREQUENCY) == (20, 0.02)
    ht = HilbertTransformer.from_preset(Preset.BALANCED)
    assert ht.coeffs.size == 12
    assert ht.transition == 0.06
    with pytest.raises(ValueError, match="invalid preset"):
        preset_config("extreme")


def test_hilbert_quadrature_phase():
    # steady sine: outputs ~90 degrees apart with unit magnitude
    t = np.arange(8192) / SR
    x = np.sin(TWO_PI * 1000.0 * t)
    ht = HilbertTransformer()
    env = np.asarray(ht.envelope(jnp.asarray(x)))
    # after settling, envelope ~1
    assert np.abs(env[2000:] - 1.0).max() < 0.02


def test_frequency_shifter_shifts():
    t = np.arange(16384) / SR
    x = np.sin(TWO_PI * 1000.0 * t)
    fs = FrequencyShifter(SR, shift_hz=150.0)
    state = fs.init_state(dtype=jnp.float64)
    _, (up, down) = fs.process(state, jnp.asarray(x))
    from algodsp_tpu.spectrum import goertzel_power
    tail = np.asarray(up)[4096:]
    p = np.asarray(goertzel_power(jnp.asarray(tail),
                                  [850.0, 1000.0, 1150.0], SR))
    assert p[2] > 50 * p[1]  # energy moved to 1150
    assert p[2] > 50 * p[0]
    tail_d = np.asarray(down)[4096:]
    p = np.asarray(goertzel_power(jnp.asarray(tail_d),
                                  [850.0, 1000.0, 1150.0], SR))
    assert p[0] > 50 * p[1]  # energy moved to 850

def test_delay_blocked_matches_sample_path():
    # one-shot 1000-sample call takes the blocked path; 100-sample
    # chunks (nb == 0) take the per-sample path — must agree
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1000))
    dl = Delay(SR, delay_seconds=0.25, feedback=0.6, mix=0.4)
    s1 = dl.init_state((2,), dtype=jnp.float64)
    s2 = dl.init_state((2,), dtype=jnp.float64)
    _, y1 = dl.process(s1, jnp.asarray(x), target_delay_samples=6000.0)
    outs = []
    for k in range(10):
        s2, yk = dl.process(s2, jnp.asarray(x[:, k * 100:(k + 1) * 100]),
                            target_delay_samples=6000.0)
        outs.append(np.asarray(yk))
    np.testing.assert_allclose(np.asarray(y1), np.concatenate(outs, axis=1),
                               atol=1e-9)


def test_delay_short_lag_falls_back_to_scan():
    # 1 ms delay (48 samples < block+2): cond must pick the exact scan
    rng = np.random.default_rng(8)
    x = rng.standard_normal(600)
    dl = Delay(SR, delay_seconds=0.001, feedback=0.5, mix=0.5, smooth_ms=0.0)
    state = dl.init_state(dtype=jnp.float64)
    _, y = dl.process(state, jnp.asarray(x))
    L = dl.buf_len
    buf = np.zeros(L)
    w = 0
    d = round(0.001 * SR)
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        pos = (w - d) % L
        i0 = math.floor(pos)
        frac = pos - i0
        delayed = buf[i0 % L] * (1 - frac) + buf[(i0 + 1) % L] * frac
        buf[w % L] = v + delayed * 0.5
        w += 1
        expected[i] = v * 0.5 + delayed * 0.5
    assert snr_db(expected, np.asarray(y)) > 140


def test_flanger_blocked_matches_chunked_sample_path():
    fl = Flanger(SR, rate_hz=0.5, depth_seconds=0.001,
                 base_delay_seconds=0.003, feedback=0.4, mix=0.5)
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 960))
    s1 = fl.init_state((2,), dtype=jnp.float64)
    s2 = fl.init_state((2,), dtype=jnp.float64)
    _, y1 = fl.process(s1, jnp.asarray(x))     # blocked path
    outs = []
    for k in range(32):                        # 30-sample chunks: scan path
        s2, yk = fl.process(s2, jnp.asarray(x[:, k * 30:(k + 1) * 30]))
        outs.append(np.asarray(yk))
    np.testing.assert_allclose(np.asarray(y1), np.concatenate(outs, axis=1),
                               atol=1e-9)


def test_autowah_affine_scan_matches_sample_loop():
    aw = AutoWah(SR, sensitivity=8.0, mix=1.0)
    rng = np.random.default_rng(10)
    x = rng.standard_normal(800) * 0.5
    state = aw.init_state(dtype=jnp.float64)
    _, y = aw.process(state, jnp.asarray(x))

    # float64 per-sample port of auto_wah.go:315-334 (env + DF2T)
    env = 0.0
    z1 = z2 = 0.0
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        a = abs(v)
        c = aw.attack_coeff if a > env else aw.release_coeff
        env = env + c * (a - env)
        en = min(env * aw.sensitivity, 1.0)
        freq = np.clip(aw.min_freq + en * (aw.max_freq - aw.min_freq),
                       1.0, 0.49 * SR)
        w0 = 2 * np.pi * freq / SR
        sw, cw = np.sin(w0), np.cos(w0)
        alpha = sw / (2 * aw.q)
        inv_a0 = 1.0 / (1.0 + alpha)
        b0 = alpha * inv_a0
        b2 = -alpha * inv_a0
        a1 = -2.0 * cw * inv_a0
        a2 = (1.0 - alpha) * inv_a0
        out = b0 * v + z1
        z1 = -a1 * out + z2
        z2 = b2 * v - a2 * out
        expected[i] = out
    assert snr_db(expected, np.asarray(y)) > 200


def test_phaser_affine_scan_matches_sample_loop():
    ph = Phaser(SR, rate_hz=1.3, stages=4, feedback=0.6, mix=0.7)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 700))
    s1 = ph.init_state((2,), dtype=jnp.float64)
    s2 = ph.init_state((2,), dtype=jnp.float64)
    s1, y1 = ph.process(s1, jnp.asarray(x))
    s2, y2 = ph.process_scan(s2, jnp.asarray(x))
    assert snr_db(np.asarray(y2), np.asarray(y1)) > 200
    # streaming continuation stays aligned
    x2 = rng.standard_normal((2, 301))
    s1, y1b = ph.process(s1, jnp.asarray(x2))
    s2, y2b = ph.process_scan(s2, jnp.asarray(x2))
    assert snr_db(np.asarray(y2b), np.asarray(y1b)) > 180
    for k in ("x1", "y1", "fb"):
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   atol=1e-10)


def test_phaser_reduced_scan_arbitrary_initial_state():
    # The reduced (S+1)-dim scan relies on x1_i' = y1_{i-1}' holding
    # AFTER one sample; an arbitrary user-supplied state need not
    # satisfy it, so sample 0 must be evaluated from the full state.
    ph = Phaser(SR, rate_hz=0.9, stages=4, feedback=0.55, mix=0.6)
    rng = np.random.default_rng(23)
    st = {"x1": jnp.asarray(rng.standard_normal((3, 4))),
          "y1": jnp.asarray(rng.standard_normal((3, 4))),
          "fb": jnp.asarray(rng.standard_normal((3,))),
          "phase": jnp.asarray(1.1, jnp.float64)}
    x = jnp.asarray(rng.standard_normal((3, 513)))
    s1, y1 = ph.process(dict(st), x)
    s2, y2 = ph.process_scan(dict(st), x)
    assert snr_db(np.asarray(y2), np.asarray(y1)) > 200
    for k in ("x1", "y1", "fb"):
        np.testing.assert_allclose(np.asarray(s1[k]), np.asarray(s2[k]),
                                   atol=1e-10)
    # N=1 block (the scan-free early-out) from the same state
    s1, y1 = ph.process(dict(st), x[..., :1])
    s2, y2 = ph.process_scan(dict(st), x[..., :1])
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-12)


def test_phaser_stages_range():
    for stages in (1, 2, 6):
        ph = Phaser(SR, stages=stages)
        s1 = ph.init_state((1,), dtype=jnp.float64)
        s2 = ph.init_state((1,), dtype=jnp.float64)
        x = jnp.asarray(np.random.default_rng(12).standard_normal((1, 256)))
        _, y1 = ph.process(s1, x)
        _, y2 = ph.process_scan(s2, x)
        assert snr_db(np.asarray(y2), np.asarray(y1)) > 200


def test_delay_out_of_range_target_clamps():
    """A runtime target beyond the max-delay ring must clamp to the
    buffer's representable lags, not alias mod L (review finding)."""
    dl = Delay(1000.0, delay_seconds=0.1, max_delay_seconds=0.25,
               smooth_ms=0.0)
    L = dl.buf_len
    x = np.zeros(600)
    x[0] = 1.0
    st = dl.init_state(dtype=jnp.float64)
    _, y = dl.process(st, jnp.asarray(x),
                      target_delay_samples=float(L + 20))
    y = np.asarray(y)
    wet = y.copy()
    wet[0] = 0.0  # remove the dry impulse
    first = int(np.flatnonzero(np.abs(wet) > 1e-9)[0])
    # clamped to <= L-2: the echo lands near the buffer limit, NOT at
    # (L+20) mod L = 20 samples
    assert first > 100, f"aliased echo at {first}"
