"""Dynamics tests: per-sample Go-semantics oracle vs the vectorized
engine (the analog of the reference's legacy-parity tests, SURVEY.md §4.3)."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.effects.dynamics import (
    Compressor, Expander, Gate, Limiter, LookaheadLimiter, DeEsser,
    TransientShaper, MultibandCompressor, BandConfig,
    DynamicsConfig, DynamicsCore, Topology, DetectorMode)
from tests.conftest import snr_db

SR = 48000.0
LOG2_10_20 = math.log2(10.0) / 20.0


def oracle_compressor(x, threshold_db=-20.0, ratio=4.0, knee_db=6.0,
                      attack_ms=10.0, release_ms=100.0, makeup_db=0.0,
                      rms_window=0):
    """Per-sample float64 re-simulation of core.go:274-388 (feedforward peak/RMS)."""
    a = 1.0 - math.exp(-math.log(2.0) / (attack_ms * 1e-3 * SR))
    r = math.exp(-math.log(2.0) / (release_ms * 1e-3 * SR))
    th = threshold_db * LOG2_10_20
    kw = knee_db * LOG2_10_20
    inv_kw = 1.0 / kw if knee_db > 0 else 0.0
    cf = 1.0 - 1.0 / ratio
    makeup = 10.0 ** (makeup_db / 20.0)
    env = 0.0
    out = np.empty_like(x)
    gains = np.empty_like(x)
    rms_buf = np.zeros(rms_window)
    rms_idx = 0
    rms_sum = 0.0
    filled = 0
    for i, v in enumerate(x):
        src = abs(v)
        if rms_window > 0:
            sq = src * src
            if filled == rms_window:
                rms_sum -= rms_buf[rms_idx]
            else:
                filled += 1
            rms_buf[rms_idx] = sq
            rms_sum += sq
            rms_idx = (rms_idx + 1) % rms_window
            mean = rms_sum / rms_window
            src = math.sqrt(mean) if mean > 0 else 0.0
        if src > env:
            env += (src - env) * a
        else:
            env = src + (env - src) * r
        level = env
        if level <= 0:
            g = 1.0
        else:
            overshoot = math.log2(level) - th
            if knee_db <= 0:
                g = 1.0 if overshoot <= 0 else 2.0 ** (-overshoot * cf)
            else:
                half = kw * 0.5
                if overshoot < -half:
                    g = 1.0
                else:
                    eff = overshoot if overshoot > half else \
                        (overshoot + half) ** 2 * 0.5 * inv_kw
                    g = 2.0 ** (-eff * cf)
        gains[i] = g
        out[i] = v * g * makeup
    return out, gains


def test_compressor_matches_oracle_peak():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(4096) * 0.5
    comp = Compressor(SR)
    state = comp.init_state(dtype=jnp.float64)
    _, y = comp.process(state, jnp.asarray(x))
    expected, _ = oracle_compressor(x)
    assert snr_db(expected, np.asarray(y)) > 180


def test_compressor_matches_oracle_rms():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(2048) * 0.5
    comp = Compressor(SR, detector_mode=DetectorMode.RMS, rms_window_ms=30.0)
    w = comp.core.rms_window
    state = comp.init_state(dtype=jnp.float64)
    _, y = comp.process(state, jnp.asarray(x))
    expected, _ = oracle_compressor(x, rms_window=w)
    assert snr_db(expected, np.asarray(y)) > 150


def test_compressor_streaming_continuity():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(2048) * 0.5
    comp = Compressor(SR)
    state = comp.init_state(dtype=jnp.float64)
    outs = []
    for blk in x.reshape(4, 512):
        state, y = comp.process(state, jnp.asarray(blk))
        outs.append(np.asarray(y))
    y_stream = np.concatenate(outs)
    expected, _ = oracle_compressor(x)
    assert snr_db(expected, y_stream) > 180


def test_compressor_hard_knee_static_curve():
    comp = Compressor(SR, knee_db=0.0, threshold_db=-20.0, ratio=4.0)
    # steady state: input at -8 dB -> 12 dB over threshold -> out = thr + 12/4
    lvl = float(comp.calculate_output_level(10 ** (-8 / 20)))
    expected_db = -20.0 + 12.0 / 4.0
    assert abs(20 * math.log10(lvl) - expected_db) < 1e-6
    # below threshold: unity
    lvl = float(comp.calculate_output_level(10 ** (-40 / 20)))
    assert abs(20 * math.log10(lvl) + 40.0) < 1e-9


def test_compressor_sidechain():
    rng = np.random.default_rng(4)
    x = np.ones(1024) * 0.5
    sc = np.abs(rng.standard_normal(1024))
    comp = Compressor(SR)
    state = comp.init_state(dtype=jnp.float64)
    _, y1 = comp.process(state, jnp.asarray(x), jnp.asarray(sc))
    state = comp.init_state(dtype=jnp.float64)
    _, y2 = comp.process(state, jnp.asarray(x))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_compressor_feedback_topology():
    rng = np.random.default_rng(5)
    x = rng.standard_normal(512) * 0.8
    comp = Compressor(SR, topology=Topology.FEEDBACK)
    state = comp.init_state(dtype=jnp.float64)
    _, y = comp.process(state, jnp.asarray(x))
    assert np.all(np.isfinite(np.asarray(y)))
    # loud input must be attenuated overall
    assert np.abs(np.asarray(y)).max() <= np.abs(x).max() + 1e-9


def test_auto_makeup():
    comp = Compressor(SR, auto_makeup=True, threshold_db=-20.0, ratio=4.0)
    assert abs(comp.core.makeup_gain_db - 15.0) < 1e-9


def test_limiter_ceiling():
    x = np.ones(9600)  # 0 dBFS input
    lim = Limiter(SR, threshold_db=-6.0, release_ms=50.0)
    state = lim.init_state(dtype=jnp.float64)
    _, y = lim.process(state, jnp.asarray(x))
    # steady state: limited to ~ -6dB + tiny ratio leakage
    tail = np.asarray(y)[-1000:]
    assert np.max(np.abs(tail)) < 10 ** (-5.5 / 20)


def test_expander_attenuates_quiet():
    ex = Expander(SR, threshold_db=-30.0, ratio=3.0, range_db=-60.0)
    quiet = np.full(4800, 10 ** (-50 / 20))
    loud = np.full(4800, 10 ** (-10 / 20))
    s = ex.init_state(dtype=jnp.float64)
    _, yq = ex.process(s, jnp.asarray(quiet))
    s = ex.init_state(dtype=jnp.float64)
    _, yl = ex.process(s, jnp.asarray(loud))
    # quiet gets pushed down, loud passes
    assert np.abs(np.asarray(yq)[-100:]).max() < quiet[0] * 0.2
    np.testing.assert_allclose(np.asarray(yl)[-100:], loud[-100:], rtol=1e-3)


def test_gate_hold_keeps_open():
    g = Gate(SR, threshold_db=-30.0, hold_ms=10.0, release_ms=5.0,
             attack_ms=0.1, knee_db=0.0)
    hold_n = g.hold_samples
    # burst then silence: gate stays open for the hold period
    x = np.concatenate([np.ones(480) * 0.5, np.zeros(2000)])
    state = g.init_state(dtype=jnp.float64)
    _, y = g.process(state, jnp.asarray(x), with_gain=False)
    state2 = g.init_state(dtype=jnp.float64)
    _, _, gains = g.process(state2, jnp.asarray(x), with_gain=True)
    gains = np.asarray(gains)
    # during hold right after the burst, gain == 1
    assert np.all(gains[480:480 + hold_n - 1] == 1.0)
    # long after, the gate closes deeply
    assert gains[-1] < 1e-3


def test_lookahead_limiter_delay():
    ll = LookaheadLimiter(SR, lookahead_ms=1.0, threshold_db=-6.0)
    d = ll.delay
    x = np.zeros(1024)
    x[100] = 0.1  # small click below threshold
    state = ll.init_state(dtype=jnp.float64)
    _, y = ll.process(state, jnp.asarray(x))
    y = np.asarray(y)
    assert abs(y[100 + d] - 0.1) < 1e-3  # program delayed by lookahead
    assert abs(y[100]) < 1e-6


def test_deesser_reduces_sibilance():
    t = np.arange(9600) / SR
    low = np.sin(2 * np.pi * 500 * t) * 0.3
    sib = np.sin(2 * np.pi * 7000 * t) * 0.5
    x = low + sib
    de = DeEsser(SR, threshold_db=-30.0, ratio=8.0)
    state = de.init_state(dtype=jnp.float64)
    _, y = de.process(state, jnp.asarray(x))
    from algodsp_tpu.spectrum import goertzel_power
    p_in = np.asarray(goertzel_power(jnp.asarray(x[4800:]), [500.0, 7000.0], SR))
    p_out = np.asarray(goertzel_power(jnp.asarray(np.asarray(y)[4800:]),
                                      [500.0, 7000.0], SR))
    # sibilance band reduced by > 6 dB, low band roughly intact
    assert 10 * np.log10(p_out[1] / p_in[1]) < -6.0
    assert abs(10 * np.log10(p_out[0] / p_in[0])) < 2.0


def test_transient_shaper_boosts_attack():
    ts = TransientShaper(SR, attack_amount=1.0, sustain_amount=0.0,
                         attack_ms=1.0, release_ms=100.0)
    x = np.concatenate([np.zeros(100), np.ones(2000) * 0.5])
    state = ts.init_state(dtype=jnp.float64)
    _, y = ts.process(state, jnp.asarray(x))
    y = np.asarray(y)
    # onset region amplified, steady state untouched
    assert y[101] > 0.5
    assert abs(y[-1] - 0.5) < 1e-3


def test_transient_shaper_matches_oracle():
    rng = np.random.default_rng(6)
    x = rng.standard_normal(1024)
    ts = TransientShaper(SR, attack_amount=0.5, sustain_amount=-0.5)
    state = ts.init_state(dtype=jnp.float64)
    _, y = ts.process(state, jnp.asarray(x))

    env = 0.0
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        s = abs(v)
        coeff = ts.attack_coeff if s > env else ts.release_coeff
        new_env = env + coeff * (s - env)
        delta = new_env - env
        norm = min(abs(delta) / (env + 1e-9), 1.0)
        gain = 1.0 + (0.5 * norm if delta >= 0 else -0.5 * norm)
        expected[i] = v * max(gain, 0.0)
        env = new_env
    assert snr_db(expected, np.asarray(y)) > 150


def test_multiband_compressor():
    mb = MultibandCompressor([200.0, 2000.0], 4, SR,
                             [BandConfig(threshold_db=-30.0, ratio=8.0),
                              BandConfig(threshold_db=-20.0, ratio=4.0),
                              BandConfig(threshold_db=-10.0, ratio=2.0)])
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 4096)) * 0.3
    state = mb.init_state((2,), dtype=jnp.float64)
    state, y = mb.process(state, jnp.asarray(x))
    assert np.asarray(y).shape == (2, 4096)
    assert np.all(np.isfinite(np.asarray(y)))
    with pytest.raises(ValueError):
        MultibandCompressor([200.0], 4, SR, [BandConfig()])  # wrong count


def test_config_validation():
    with pytest.raises(ValueError):
        DynamicsConfig(sample_rate=-1.0)
    with pytest.raises(ValueError):
        DynamicsConfig(sample_rate=SR, ratio=0.5)
    with pytest.raises(ValueError):
        DynamicsConfig(sample_rate=SR, sidechain_low_cut_hz=0.5)
