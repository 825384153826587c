"""Waveshaping, bank, vocoder tests."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.effects.waveshape import (
    Distortion, DistortionMode, ChebyshevHarmonicMode, BitCrusher,
    TransformerSimulation, TransformerQuality, HarmonicBass)
from algodsp_tpu.filters.bank import Bank, OctaveAnalyzer, octave_band_specs
from algodsp_tpu.effects.vocoder import Vocoder, BandLayout
from algodsp_tpu.spectrum import goertzel_power
from tests.conftest import snr_db

SR = 48000.0


def test_distortion_modes_finite_and_bounded():
    rng = np.random.default_rng(1)
    x = rng.standard_normal(512) * 2.0
    for mode in DistortionMode:
        kw = {}
        if mode == DistortionMode.CHEBYSHEV:
            kw = {"chebyshev_order": 3}
        d = Distortion(mode=mode, drive=2.0, **kw)
        state = d.init_state(dtype=jnp.float64)
        _, y = d.process(state, jnp.asarray(x))
        y = np.asarray(y)
        assert np.all(np.isfinite(y)), mode
        assert np.max(np.abs(y)) <= 1.5, mode  # soft-clip max 1.5*2/3... bounded


def test_distortion_chebyshev_harmonics():
    # T_2 on a pure sine produces the 2nd harmonic
    t = np.arange(8192) / SR
    x = np.sin(2 * np.pi * 1000.0 * t)
    d = Distortion(mode=DistortionMode.CHEBYSHEV, drive=1.0,
                   chebyshev_order=2,
                   chebyshev_mode=ChebyshevHarmonicMode.EVEN,
                   chebyshev_dc_bypass=True)
    state = d.init_state(dtype=jnp.float64)
    _, y = d.process(state, jnp.asarray(x))
    p = np.asarray(goertzel_power(jnp.asarray(np.asarray(y)[2000:]),
                                  [1000.0, 2000.0], SR))
    assert p[1] > 100 * p[0]  # energy at 2f, not f


def test_distortion_validation():
    with pytest.raises(ValueError):
        Distortion(drive=100.0)
    with pytest.raises(ValueError):
        Distortion(mode=DistortionMode.CHEBYSHEV, chebyshev_order=3,
                   chebyshev_mode=ChebyshevHarmonicMode.EVEN)


def test_bitcrusher_oracle():
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, 300)
    bc = BitCrusher(SR, bit_depth=6.0, downsample=3, mix=1.0)
    state = bc.init_state(dtype=jnp.float64)
    _, y = bc.process(state, jnp.asarray(x))

    levels = 2.0 ** 5
    hold, counter = 0.0, 0
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        counter += 1
        if counter >= 3:
            counter = 0
            hold = round(v * levels) / levels
        expected[i] = hold
    assert snr_db(expected, np.asarray(y)) > 140


def test_bitcrusher_streaming():
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, 300)
    bc = BitCrusher(SR, bit_depth=8.0, downsample=7)
    s1 = bc.init_state(dtype=jnp.float64)
    _, y_once = bc.process(s1, jnp.asarray(x))
    s2 = bc.init_state(dtype=jnp.float64)
    outs = []
    for lo, hi in [(0, 100), (100, 201), (201, 300)]:
        s2, y = bc.process(s2, jnp.asarray(x[lo:hi]))
        outs.append(np.asarray(y))
    assert snr_db(np.asarray(y_once), np.concatenate(outs)) > 200


def test_transformer_saturates():
    t = np.arange(4800) / SR
    x = np.sin(2 * np.pi * 500.0 * t) * 2.0
    for q in [TransformerQuality.LIGHTWEIGHT, TransformerQuality.HIGH]:
        ts = TransformerSimulation(SR, quality=q, drive=3.0)
        state = ts.init_state(dtype=jnp.float64)
        _, y = ts.process(state, jnp.asarray(x))
        y = np.asarray(y)
        assert np.all(np.isfinite(y))
        # saturation creates odd harmonics
        p = np.asarray(goertzel_power(jnp.asarray(y[2400:]),
                                      [500.0, 1500.0], SR))
        assert p[1] > 1e-4 * p[0]


def test_harmonic_bass_generates_harmonics():
    t = np.arange(19200) / SR
    x = np.sin(2 * np.pi * 60.0 * t) * 0.8
    hb = HarmonicBass(SR, frequency=120.0, harmonic_bass_gain=1.0,
                      original_bass_gain=0.0, high_frequency_gain=0.0)
    state = hb.init_state(dtype=jnp.float64)
    _, y = hb.process(state, jnp.asarray(x))
    p = np.asarray(goertzel_power(jnp.asarray(np.asarray(y)[9600:]),
                                  [60.0, 120.0, 180.0], SR))
    # harmonic content above the fundamental band exists
    assert p[1] + p[2] > 0.01 * p[0]


def test_octave_band_specs():
    specs = octave_band_specs(1, SR)
    centers = [s[0] for s in specs]
    assert any(abs(c - 1000.0) < 1e-6 for c in centers)
    # octave spacing ~ G = 2
    ratios = np.diff(np.log2(centers))
    np.testing.assert_allclose(ratios, np.log2(10 ** 0.3), atol=1e-6)


def test_bank_band_isolation():
    bank = Bank.octave(1, SR, order=4, lower_hz=100.0, upper_hz=10000.0)
    from algodsp_tpu import signal
    tone = signal.sine(1000.0, 1.0, 8192, SR, dtype=jnp.float64)
    bands = np.asarray(bank.process(tone))
    assert bands.shape == (bank.num_bands, 8192)
    powers = (bands[:, 4000:] ** 2).sum(axis=-1)
    best = np.argmax(powers)
    assert abs(bank.centers[best] - 1000.0) < 1.0
    # neighbors strongly attenuated
    for i in range(bank.num_bands):
        if abs(i - best) > 1:
            assert powers[i] < 0.01 * powers[best]


def test_bank_matches_per_band_chains():
    """Banded engine vs independent BiquadChain per band."""
    from algodsp_tpu.filters import BiquadChain
    from algodsp_tpu.filters.design.cascades import butterworth_lp, butterworth_hp
    bank = Bank.octave(3, SR, order=4, lower_hz=400.0, upper_hz=2000.0)
    rng = np.random.default_rng(4)
    x = rng.standard_normal(1024)
    bands = np.asarray(bank.process(jnp.asarray(x)))
    for i in range(bank.num_bands):
        lp = butterworth_lp(bank.high_edges[i], 4, SR)
        hp = butterworth_hp(bank.low_edges[i], 4, SR)
        chain = BiquadChain(np.concatenate([lp, hp]))
        ref = np.asarray(chain.process(jnp.asarray(x)))
        assert snr_db(ref, bands[i]) > 180, i


def test_octave_analyzer_levels():
    an = OctaveAnalyzer(1, SR, lower_hz=100.0, upper_hz=10000.0)
    from algodsp_tpu import signal
    tone = signal.sine(1000.0, 1.0, 9600, SR, dtype=jnp.float64)
    state = an.init_state(dtype=jnp.float64)
    state, bands, levels = an.process(state, tone)
    levels = np.asarray(levels)
    best = np.argmax(levels)
    assert abs(an.centers[best] - 1000.0) < 1.0


def test_vocoder_transfers_envelope():
    # modulated 500 Hz tone as modulator, broadband sawish carrier
    n = 24000
    t = np.arange(n) / SR
    am = 0.5 * (1 + np.sin(2 * np.pi * 3.0 * t))
    modulator = np.sin(2 * np.pi * 500.0 * t) * am
    rng = np.random.default_rng(5)
    carrier = rng.standard_normal(n) * 0.5
    voc = Vocoder(SR)
    state = voc.init_state(dtype=jnp.float64)
    _, y = voc.process(state, jnp.asarray(modulator), jnp.asarray(carrier))
    y = np.asarray(y)
    assert np.all(np.isfinite(y))
    # output envelope follows the modulator AM: loud vs quiet segments differ
    seg = 1600  # 10 segments per AM period
    e = np.array([np.sqrt(np.mean(y[i:i + seg] ** 2))
                  for i in range(4800, n - seg, seg)])
    assert e.max() > 3 * e.min()


def test_vocoder_band_count():
    voc = Vocoder(SR)
    assert voc.num_bands == sum(
        1 for f in [16, 20, 25, 31, 40, 50, 63, 80, 100, 125, 160, 200, 250,
                    315, 400, 500, 630, 800, 1000, 1250, 1600, 2000, 2500,
                    3150, 4000, 5000, 6300, 8000, 10000, 12500, 16000, 20000]
        if f < SR / 2 * 0.9)
    voc_bark = Vocoder(SR, layout=BandLayout.BARK)
    assert voc_bark.num_bands == 24
    with pytest.raises(ValueError):
        Vocoder(SR, attack_ms=0.0)
