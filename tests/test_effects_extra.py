"""Pitch, spectral, granular, spatial, moog, dither tests."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.effects.pitch import SpectralPitchShifter, WSOLAPitchShifter
from algodsp_tpu.effects.spectral import SpectralFreeze, Granular, FreezePhaseMode
from algodsp_tpu.effects.spatial import (
    StereoWidener, CrosstalkCanceller, CrosstalkSimulator)
from algodsp_tpu.filters.moog import MoogFilter, MoogVariant
from algodsp_tpu.dither import Quantizer, DitherType, Preset, design_shaper
from algodsp_tpu.spectrum import goertzel_power
from tests.conftest import snr_db

SR = 48000.0


def tone(freq, n, amp=1.0):
    return amp * np.sin(2 * np.pi * freq * np.arange(n) / SR)


def test_spectral_pitch_bin_shift():
    x = tone(440.0, 48000)
    ps = SpectralPitchShifter(SR, pitch_ratio=1.1)
    y = np.asarray(ps.process(jnp.asarray(x)))
    assert y.shape == x.shape
    p = np.asarray(goertzel_power(jnp.asarray(y[8000:40000]), [440.0, 484.0], SR))
    assert p[1] > 3 * p[0]


def test_spectral_pitch_stretch_path():
    x = tone(440.0, 48000)
    ps = SpectralPitchShifter(SR, pitch_ratio=1.5)
    y = np.asarray(ps.process(jnp.asarray(x)))
    p = np.asarray(goertzel_power(jnp.asarray(y[8000:40000]), [440.0, 660.0], SR))
    assert p[1] > 1000 * p[0]


def test_spectral_pitch_semitones_and_validation():
    ps = SpectralPitchShifter(SR)
    ps.set_pitch_semitones(12.0)
    assert abs(ps.pitch_ratio - 2.0) < 1e-12
    with pytest.raises(ValueError):
        SpectralPitchShifter(SR, frame_size=1000)  # not pow2
    with pytest.raises(ValueError):
        SpectralPitchShifter(SR, pitch_ratio=8.0)


def test_wsola_pitch_shift():
    x = tone(440.0, 48000)
    ws = WSOLAPitchShifter(SR, pitch_ratio=1.5)
    y = np.asarray(ws.process(jnp.asarray(x)))
    assert y.shape == x.shape
    p = np.asarray(goertzel_power(jnp.asarray(y[8000:40000]), [440.0, 660.0], SR))
    assert p[1] > 1000 * p[0]
    with pytest.raises(ValueError):
        ws.process(jnp.zeros(1000))  # too short


def test_spectral_freeze_holds_spectrum():
    # tone then silence; frozen output keeps the tone through the silence
    x = np.concatenate([tone(1000.0, 8192), np.zeros(8192)])
    fz = SpectralFreeze(SR, frozen=True, phase_mode=FreezePhaseMode.ADVANCE)
    y = np.asarray(fz.process(jnp.asarray(x)))
    p_tail = float(goertzel_power(jnp.asarray(y[10000:16000]), 1000.0, SR))
    p_tail_dry = float(goertzel_power(jnp.asarray(x[10000:16000]), 1000.0, SR))
    assert p_tail > 100 * max(p_tail_dry, 1e-12)
    # unfrozen = near-identity resynthesis
    fz2 = SpectralFreeze(SR, frozen=False)
    y2 = np.asarray(fz2.process(jnp.asarray(x)))
    assert snr_db(x[4096:12000], y2[4096:12000]) > 40


def test_granular_identity_when_unity():
    x = tone(500.0, 9600, 0.5)
    g = Granular(SR, grain_seconds=0.04, overlap=0.75, pitch=1.0, mix=1.0)
    y = np.asarray(g.process(jnp.asarray(x)))
    assert y.shape == x.shape
    # with pitch 1 and no spray, grains reconstruct the signal closely
    assert snr_db(x[2000:8000], y[2000:8000]) > 20


def test_granular_pitch():
    x = tone(400.0, 19200)
    g = Granular(SR, grain_seconds=0.05, overlap=0.5, pitch=2.0)
    y = np.asarray(g.process(jnp.asarray(x)))
    p = np.asarray(goertzel_power(jnp.asarray(y[4800:14400]), [400.0, 800.0], SR))
    assert p[1] > p[0]


def test_stereo_widener():
    n = 4800
    l = tone(500.0, n, 1.0)
    r = tone(500.0, n, 0.5)
    x = jnp.asarray(np.stack([l, r]))
    w = StereoWidener(SR, width=2.0)
    _, y = w.process(w.init_state(dtype=jnp.float64), x)
    y = np.asarray(y)
    mid = (l + r) / 2
    side = (l - r) / 2
    np.testing.assert_allclose(y[0], mid + 2 * side, atol=1e-9)
    np.testing.assert_allclose(y[1], mid - 2 * side, atol=1e-9)
    # width 0 -> mono
    w0 = StereoWidener(SR, width=0.0)
    _, y0 = w0.process(w0.init_state(dtype=jnp.float64), x)
    np.testing.assert_allclose(np.asarray(y0)[0], np.asarray(y0)[1], atol=1e-9)


def test_stereo_widener_bass_mono():
    n = 9600
    low_l = tone(60.0, n, 1.0)
    x = jnp.asarray(np.stack([low_l, -low_l]))  # out-of-phase bass
    w = StereoWidener(SR, width=2.0, bass_mono_hz=200.0)
    _, y = w.process(w.init_state(dtype=jnp.float64), x)
    y = np.asarray(y)
    # out-of-phase bass collapses toward mono -> low output energy
    assert np.abs(y[:, 4800:]).max() < 0.4


def test_crosstalk_canceller_and_simulator():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 4800)))
    cc = CrosstalkCanceller(SR)
    _, y = cc.process(cc.init_state(dtype=jnp.float64), x)
    assert np.asarray(y).shape == (2, 4800)
    assert np.all(np.isfinite(np.asarray(y)))

    cs = CrosstalkSimulator(SR, crossfeed_mix=0.5)
    _, y2 = cs.process(cs.init_state(dtype=jnp.float64), x)
    assert np.all(np.isfinite(np.asarray(y2)))
    # crossfeed blends channels: inter-channel correlation increases
    cx = np.corrcoef(np.asarray(x))[0, 1]
    cy = np.corrcoef(np.asarray(y2))[0, 1]
    assert cy > cx


@pytest.mark.parametrize("variant", list(MoogVariant))
def test_moog_variants_lowpass(variant):
    os = 4 if variant == MoogVariant.HUOVILAINEN else 1
    # the legacy "improved" rule multiplies the stage coefficient by
    # 2*Vt (moog.go:598-601); at the default Vt=5 that saturates the
    # ladder (reference behavior) — test it in its usable Vt regime
    improved = variant in (MoogVariant.IMPROVED_CLASSIC,
                           MoogVariant.IMPROVED_CLASSIC_LIGHTWEIGHT)
    vt = 0.5 if improved else 5.0
    m = MoogFilter(SR, variant=variant, cutoff_hz=1000.0, resonance=0.5,
                   oversampling=os, thermal_voltage=vt)
    lo = tone(200.0, 4800, 0.2)
    hi = tone(8000.0, 4800, 0.2)
    state = m.init_state(dtype=jnp.float64)
    _, y_lo = m.process(state, jnp.asarray(lo))
    state = m.init_state(dtype=jnp.float64)
    _, y_hi = m.process(state, jnp.asarray(hi))
    e_lo = float(jnp.sum(y_lo[2400:] ** 2))
    e_hi = float(jnp.sum(y_hi[2400:] ** 2))
    assert e_lo > 20 * e_hi, variant  # lowpass behavior


def test_moog_matches_classic_oracle():
    m = MoogFilter(SR, variant=MoogVariant.CLASSIC, cutoff_hz=2000.0,
                   resonance=1.0)
    rng = np.random.default_rng(2)
    x = rng.standard_normal(512) * 0.3
    state = m.init_state(dtype=jnp.float64)
    _, y = m.process(state, jnp.asarray(x))

    stage = np.zeros(4)
    tl = np.zeros(3)
    coef = m.coefficient
    ds = m.drive_scale
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        u = v * m.input_gain - m.feedback * stage[3]
        t_in = math.tanh(ds * u)
        stage[0] = np.clip(stage[0] + coef * (t_in - tl[0]), -32, 32)
        tl[0] = math.tanh(ds * stage[0])
        stage[1] = np.clip(stage[1] + coef * (tl[0] - tl[1]), -32, 32)
        tl[1] = math.tanh(ds * stage[1])
        stage[2] = np.clip(stage[2] + coef * (tl[1] - tl[2]), -32, 32)
        tl[2] = math.tanh(ds * stage[2])
        stage[3] = np.clip(stage[3] + coef * (tl[2] - math.tanh(ds * stage[3])), -32, 32)
        expected[i] = m.output_scale * stage[3]
    assert snr_db(expected, np.asarray(y)) > 150


def test_moog_validation():
    with pytest.raises(ValueError):
        MoogFilter(SR, cutoff_hz=30000.0)
    with pytest.raises(ValueError):
        MoogFilter(SR, resonance=5.0)


def test_quantizer_snr_by_bit_depth():
    x = tone(997.0, 48000, 0.5)
    for bits, min_snr in [(8, 35), (16, 80)]:
        q = Quantizer(SR, bit_depth=bits, preset=Preset.NONE,
                      dither_type=DitherType.TRIANGULAR)
        state = q.init_state(dtype=jnp.float64)
        _, y = q.process(state, jnp.asarray(x))
        assert snr_db(x, np.asarray(y)) > min_snr, bits


def test_quantizer_noise_shaping_moves_noise_up():
    # shaped noise has less energy at low frequencies than flat TPDF
    x = tone(997.0, 1 << 16, 0.5)
    def noise_spectrum(preset):
        q = Quantizer(SR, bit_depth=8, preset=preset, seed=3)
        state = q.init_state(dtype=jnp.float64)
        _, y = q.process(state, jnp.asarray(x))
        err = np.asarray(y) - x
        spec = np.abs(np.fft.rfft(err)) ** 2
        freqs = np.fft.rfftfreq(x.size, 1 / SR)
        return spec, freqs
    s_flat, freqs = noise_spectrum(Preset.NONE)
    s_shaped, _ = noise_spectrum(Preset.FC9)
    # exclude DC: the +0.5 output offset (quantizer.go:119) cancels the
    # floor bias exactly when unshaped but leaves a net DC through the
    # shaper's NTF(0)=0.25 — a single-bin artifact, not band noise
    low = (freqs > 100) & (freqs < 4000)
    assert s_shaped[low].mean() < 0.2 * s_flat[low].mean()


def test_quantizer_oracle_parity():
    """Scan path vs per-sample Go-semantics loop with identical noise."""
    rng = np.random.default_rng(4)
    x = rng.uniform(-0.9, 0.9, 256)
    q = Quantizer(SR, bit_depth=12, preset=Preset.FC3,
                  dither_type=DitherType.NONE)
    state = q.init_state(dtype=jnp.float64)
    _, y = q.process(state, jnp.asarray(x))

    coeffs = q.shaper_coeffs
    hist = np.zeros(coeffs.size)
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        scaled = q.bit_mul * v
        shaped = scaled - np.dot(coeffs, hist)
        qq = math.floor(shaped)
        qq = max(q.limit_lo, min(q.limit_hi, qq))
        err = qq - shaped
        hist = np.concatenate([[err], hist[:-1]])
        expected[i] = (qq + 0.5) * q.bit_div
    assert snr_db(expected, np.asarray(y)) > 200


def test_design_shaper():
    calls = []
    c = design_shaper(SR, order=5, iterations=30, population=16, seed=2,
                      progress=lambda i, cost: calls.append(cost))
    assert c.shape == (5,)
    assert len(calls) == 30
    assert calls[-1] <= calls[0]
    # designed shaper should push noise out of the sensitive band vs flat
    from algodsp_tpu.dither.designer import _shaped_noise_cost, ath_weight_db
    freqs = np.linspace(20.0, SR / 2 * 0.95, 256)
    ath = ath_weight_db(freqs)
    w = 10.0 ** (-(ath - ath.min()) / 10.0)
    flat = _shaped_noise_cost(np.zeros((1, 5)), freqs, w, SR)[0]
    designed = _shaped_noise_cost(c[None, :], freqs, w, SR)[0]
    assert designed < flat


def test_spectral_pitch_batched_matches_mono():
    # phase propagation must broadcast over leading batch dims
    ps = SpectralPitchShifter(SR, pitch_ratio=2 ** (4 / 12))
    rng = np.random.default_rng(13)
    x1 = rng.standard_normal(8192).astype(np.float32) * 0.3
    xb = np.stack([x1, 0.5 * x1])
    y1 = np.asarray(ps.process(jnp.asarray(x1)))
    yb = np.asarray(ps.process(jnp.asarray(xb)))
    np.testing.assert_allclose(yb[0], y1, atol=1e-5)
    np.testing.assert_allclose(yb[1], 0.5 * yb[0], atol=1e-4)


def test_wsola_batched_matches_mono():
    # per-channel alignment search: batch rows must equal mono runs
    ws = WSOLAPitchShifter(SR, pitch_ratio=2 ** (3 / 12))
    rng = np.random.default_rng(14)
    x0 = rng.standard_normal(1 << 15).astype(np.float32) * 0.3
    x1 = rng.standard_normal(1 << 15).astype(np.float32) * 0.3
    yb = np.asarray(ws.process(jnp.asarray(np.stack([x0, x1]))))
    np.testing.assert_array_equal(yb[0], np.asarray(ws.process(jnp.asarray(x0))))
    np.testing.assert_array_equal(yb[1], np.asarray(ws.process(jnp.asarray(x1))))


def test_quantizer_process_integer_codes():
    """Integer codes obey `ProcessInteger` (`quantizer.go:95-119`):
    float output == (code + 0.5) * bit_div, codes within range."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1.0, 1.0, 512))
    q = Quantizer(SR, bit_depth=8, preset=Preset.FC3,
                  dither_type=DitherType.TRIANGULAR, seed=11)
    s0 = q.init_state(dtype=jnp.float64)
    _, codes = q.process_integer(s0, x)
    _, y = q.process(s0, x)
    assert codes.dtype == jnp.int32
    np.testing.assert_allclose(
        np.asarray(y), (np.asarray(codes) + 0.5) * q.bit_div, rtol=0, atol=0)
    assert int(codes.min()) >= q.limit_lo and int(codes.max()) <= q.limit_hi


def test_quantizer_iir_shelf_oracle_parity():
    """IIR shelf shaper scan vs a per-sample Go-semantics loop
    (`shaper_iir.go:47-57`: shaped = in - shelf(prev_err), DF2T shelf,
    error recorded after quantization), identical (zero) noise."""
    from algodsp_tpu.filters.design.rbj import low_shelf
    rng = np.random.default_rng(5)
    x = rng.uniform(-0.9, 0.9, 256)
    q = Quantizer(SR, bit_depth=12, iir_shelf_freq=3000.0,
                  dither_type=DitherType.NONE)
    state = q.init_state(dtype=jnp.float64)
    _, y = q.process(state, jnp.asarray(x))

    b0, b1, b2, a1, a2 = np.asarray(low_shelf(3000.0, -5.0,
                                              1.0 / math.sqrt(2.0), SR))
    d0 = d1 = lerr = 0.0
    expected = np.empty_like(x)
    for i, v in enumerate(x):
        fo = b0 * lerr + d0
        d0 = b1 * lerr - a1 * fo + d1
        d1 = b2 * lerr - a2 * fo
        shaped = q.bit_mul * v - fo
        qq = math.floor(shaped)
        qq = max(q.limit_lo, min(q.limit_hi, qq))
        lerr = qq - shaped
        expected[i] = (qq + 0.5) * q.bit_div
    assert snr_db(expected, np.asarray(y)) > 200


def test_quantizer_iir_shelf_deemphasizes_low_band():
    """The -5 dB low shelf on the error feedback pushes quantization
    noise ABOVE the shelf corner relative to flat TPDF."""
    x = tone(997.0, 1 << 16, 0.5)

    def noise_spectrum(**kw):
        q = Quantizer(SR, bit_depth=8, seed=3, **kw)
        state = q.init_state(dtype=jnp.float64)
        _, y = q.process(state, jnp.asarray(x))
        err = np.asarray(y) - x
        spec = np.abs(np.fft.rfft(err)) ** 2
        freqs = np.fft.rfftfreq(x.size, 1 / SR)
        return spec, freqs

    s_flat, freqs = noise_spectrum(preset=Preset.NONE)
    s_shelf, _ = noise_spectrum(iir_shelf_freq=4000.0)
    low = (freqs > 100) & (freqs < 2000)
    assert s_shelf[low].mean() < 0.7 * s_flat[low].mean()


def test_quantizer_iir_shelf_validation_and_state():
    with pytest.raises(ValueError):
        Quantizer(SR, iir_shelf_freq=-10.0)
    with pytest.raises(ValueError):
        Quantizer(SR, iir_shelf_freq=float("nan"))
    # streaming continuity: two half blocks == one full block
    rng = np.random.default_rng(6)
    x = rng.uniform(-0.5, 0.5, (2, 512))
    q = Quantizer(SR, bit_depth=10, iir_shelf_freq=2000.0,
                  dither_type=DitherType.NONE)
    s = q.init_state((2,), dtype=jnp.float64)
    _, y_full = q.process(s, jnp.asarray(x))
    s2 = q.init_state((2,), dtype=jnp.float64)
    s2, y1 = q.process(s2, jnp.asarray(x[:, :256]))
    # reseed the key so the (unused, NONE-dither) stream split matches
    s2["key"] = s["key"]
    s2, y2 = q.process(s2, jnp.asarray(x[:, 256:]))
    got = np.concatenate([np.asarray(y1), np.asarray(y2)], axis=-1)
    np.testing.assert_allclose(got, np.asarray(y_full), atol=1e-12)


def test_hrtf_ir_set_physics():
    """Spherical-head model set: the contralateral (cross) path arrives
    LATER (ITD) and darker (head shadow) than the ipsilateral direct
    path; the set is deterministic."""
    from algodsp_tpu.utils.irlib import hrtf_ir_set
    s = hrtf_ir_set(48000.0)
    assert set(s) == {"left_direct", "left_cross", "right_direct",
                      "right_cross"}
    d, c = s["left_direct"], s["left_cross"]
    # ITD: energy centroid of the cross path is later
    t = np.arange(d.size)
    cen = lambda h: float((t * h * h).sum() / (h * h).sum())
    assert cen(c) > cen(d) + 48000.0 * 0.0002  # >= 0.2 ms ITD at 30 deg
    # head shadow: cross path at 8 kHz well below the direct path
    f = np.fft.rfftfreq(d.size, 1 / 48000.0)
    hi = (f > 6000) & (f < 12000)
    mag = lambda h: np.abs(np.fft.rfft(h))
    assert mag(c)[hi].mean() < 0.6 * mag(d)[hi].mean()
    # deterministic
    s2 = hrtf_ir_set(48000.0)
    np.testing.assert_array_equal(s2["left_cross"], c)
    with pytest.raises(ValueError):
        hrtf_ir_set(-1.0)


def test_crosstalk_simulator_hrtf_set_routing():
    """4-path routing parity with `crosstalk_simulator_hrtf.go:121-137`:
    crossfeed_only = dry + conv(cross); complete = conv(direct) +
    conv(cross)."""
    from algodsp_tpu.effects.spatial import CrosstalkSimulator
    from algodsp_tpu.utils.irlib import hrtf_ir_set
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 1024))
    irs = hrtf_ir_set(SR)
    for mode in ("crossfeed_only", "complete"):
        sim = CrosstalkSimulator(SR, hrtf_irs=irs, hrtf_mode=mode)
        st = sim.init_state()
        _, y = sim.process(st, jnp.asarray(x))
        y = np.asarray(y)
        conv = lambda sig, h: np.convolve(sig, h)[:1024]
        cl = conv(x[1], irs["left_cross"])
        cr = conv(x[0], irs["right_cross"])
        if mode == "crossfeed_only":
            want_l, want_r = x[0] + cl, x[1] + cr
        else:
            want_l = conv(x[0], irs["left_direct"]) + cl
            want_r = conv(x[1], irs["right_direct"]) + cr
        assert snr_db(want_l, y[0]) > 100
        assert snr_db(want_r, y[1]) > 100
    with pytest.raises(ValueError):
        CrosstalkSimulator(SR, hrtf_irs={"left_cross": np.ones(4)})
    with pytest.raises(ValueError):
        CrosstalkSimulator(SR, hrtf_irs=irs, hrtf_mode="bogus")


def test_crosstalk_simulator_hrtf_streaming_tail():
    """The HRTF-set path carries its convolution overlap tail in state
    (the reference's stateful firPath, `crosstalk_simulator_hrtf.go`):
    block-by-block processing equals one whole-signal call (review
    finding, round 4)."""
    from algodsp_tpu.effects.spatial import CrosstalkSimulator
    from algodsp_tpu.utils.irlib import hrtf_ir_set
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 1024))
    irs = hrtf_ir_set(SR)
    for mode in ("crossfeed_only", "complete"):
        sim = CrosstalkSimulator(SR, hrtf_irs=irs, hrtf_mode=mode)
        _, y_once = sim.process(sim.init_state((), jnp.float64),
                                jnp.asarray(x))
        st = sim.init_state((), jnp.float64)
        outs = []
        for b in range(4):
            st, yb = sim.process(st, jnp.asarray(x[:, b * 256:(b + 1) * 256]))
            outs.append(np.asarray(yb))
        y_blocks = np.concatenate(outs, axis=-1)
        assert snr_db(np.asarray(y_once), y_blocks) > 140, mode


def test_hrtf_ir_set_high_rate_and_wide_angle():
    """Causality headroom must cover the Woodworth ITD advance: at
    96 kHz and at wide speaker angles the direct-path impulse must not
    wrap out of the irfft window (review finding, round 4)."""
    from algodsp_tpu.utils.irlib import hrtf_ir_set
    for kw in ({"sample_rate": 96000.0},
               {"sample_rate": 48000.0, "speaker_angle_deg": 60.0}):
        s = hrtf_ir_set(**kw)
        d = s["left_direct"]
        # the direct path is a near-unit impulse: dominant peak with
        # most of its energy in the early taps
        assert np.abs(d).max() > 0.5, kw
        assert (d ** 2)[: d.size // 2].sum() > 0.9 * (d ** 2).sum(), kw


def test_quantizer_iir_shelf_rejects_nyquist():
    """A shelf corner at/above Nyquist would silently design an
    all-zero biquad and disable the shaping (review finding)."""
    with pytest.raises(ValueError):
        Quantizer(SR, iir_shelf_freq=SR / 2)
    with pytest.raises(ValueError):
        Quantizer(SR, iir_shelf_freq=SR)


def test_hrtf_irlib_roundtrip_through_simulator(tmp_path):
    """The bring-your-own-measured-data path (reference HRTFProvider
    contract): a 4-path set stored in an .irlib container loads back
    and drives CrosstalkSimulator hrtf_mode='complete' identically to
    the in-memory set. (The reference ships NO measured data — its
    tests use synthetic fixedHRTFProvider sets; see
    crosstalk_simulator_hrtf_test.go:9-39.)"""
    from algodsp_tpu.effects.spatial import CrosstalkSimulator
    from algodsp_tpu.utils.irlib import (hrtf_ir_set, write_hrtf_irlib,
                                         hrtf_ir_set_from_irlib)
    irs = hrtf_ir_set(SR)
    p = tmp_path / "kemar_like.irlib"
    write_hrtf_irlib(p, irs, SR)
    loaded = hrtf_ir_set_from_irlib(p, expect_sample_rate=SR)
    rng = np.random.default_rng(17)
    x = jnp.asarray(rng.standard_normal((2, 1024)), jnp.float64)
    sim_mem = CrosstalkSimulator(SR, hrtf_irs=irs, hrtf_mode="complete")
    sim_lib = CrosstalkSimulator(SR, hrtf_irs=loaded, hrtf_mode="complete")
    _, y_mem = sim_mem.process(sim_mem.init_state((), jnp.float64), x)
    _, y_lib = sim_lib.process(sim_lib.init_state((), jnp.float64), x)
    # container stores f32; parity is at f32 resolution
    assert snr_db(np.asarray(y_mem), np.asarray(y_lib)) > 120.0
    with pytest.raises(ValueError, match="not found"):
        hrtf_ir_set_from_irlib(p, prefix="other")
    with pytest.raises(ValueError, match="missing paths"):
        write_hrtf_irlib(p, {"left_direct": irs["left_direct"]}, SR)
    with pytest.raises(ValueError, match="expected"):
        hrtf_ir_set_from_irlib(p, expect_sample_rate=44100.0)


def test_wsola_preserves_event_timing_and_duration():
    """Behavioral guard for the round-5 composition fix: pitch shifting
    must keep events at their original positions and fill the full
    output (the old rate-r stretch played everything at r^2 speed and
    left a zero tail). Uses tone bursts at known positions."""
    n = 1 << 15
    burst_starts = [4000, 14000, 24000]
    x = np.zeros(n)
    t = np.arange(2000) / SR
    burst = np.sin(2 * np.pi * 500.0 * t) * np.hanning(2000)
    for s in burst_starts:
        x[s:s + 2000] += burst
    for ratio in (2 ** (3 / 12), 2 ** (-3 / 12)):
        ws = WSOLAPitchShifter(SR, pitch_ratio=ratio)
        y = np.asarray(ws.process(jnp.asarray(x)))
        # full-length output: energy must exist in the last burst's span
        assert float(np.sum(y[23000:27000] ** 2)) > 0.05 * float(
            np.sum(x[23000:27000] ** 2)), ratio
        # events stay in place: per-burst energy localization
        env = np.convolve(y ** 2, np.ones(1000) / 1000, mode="same")
        for s in burst_starts:
            inside = env[s:s + 2500].max()
            outside = env[s + 5000:s + 8000].max() if s + 8000 < n else 0.0
            assert inside > 3 * outside, (ratio, s)
