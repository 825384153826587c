"""Demo spectrum analyzer (`internal/webdemo/spectrum.go` parity)."""

import numpy as np
import pytest

from algodsp_tpu.demo.spectrum import SpectrumAnalyzer, sanitize_params

SR = 48000.0


def test_sanitize_matches_reference_rules():
    # spectrum.go:181-198: bad fft -> 2048, overlap/smoothing clamp
    p = sanitize_params(fft_size=1000, overlap=1.5, smoothing=-3)
    assert p == {"fft_size": 2048, "overlap": 0.95, "window":
                 "blackmanharris", "smoothing": 0.0}
    with pytest.raises(ValueError):
        sanitize_params(window="kaiser")  # unsupported, like the reference


def test_bin_sine_reads_zero_dbfs():
    an = SpectrumAnalyzer(SR, fft_size=2048, smoothing=0.0)
    f = 24 * SR / 2048  # exact bin
    x = np.sin(2 * np.pi * f * np.arange(8192) / SR)
    assert an.push(x) > 0 and an.ready
    peak = float(an.curve_db([f])[0])
    assert abs(peak) < 0.1  # amplitude-1 sine == 0 dBFS
    floor = float(an.curve_db([f * 4.7])[0])
    assert floor < -60.0


def test_push_is_block_size_invariant():
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10000).astype(np.float32)
    a = SpectrumAnalyzer(SR, fft_size=1024, overlap=0.5, smoothing=0.65)
    b = SpectrumAnalyzer(SR, fft_size=1024, overlap=0.5, smoothing=0.65)
    a.push(x)
    for i in range(0, 10000, 160):  # audio-callback sized chunks
        b.push(x[i:i + 160])
    np.testing.assert_allclose(a.db, b.db, atol=1e-5)


def test_not_ready_returns_floor_and_first_frame_unsmoothed():
    an = SpectrumAnalyzer(SR, fft_size=2048, smoothing=0.9)
    assert np.all(an.curve_db([100.0, 1000.0]) == -130.0)
    an.push(np.zeros(2047))
    assert not an.ready  # needs fft_size samples before the first frame
    an.push(np.sin(2 * np.pi * 1000 * np.arange(1) / SR))
    assert an.ready  # first frame bypasses smoothing (spectrum.go:172-176)


def test_curve_interpolates_between_bins():
    an = SpectrumAnalyzer(SR, fft_size=256, smoothing=0.0)
    an.push(np.random.default_rng(1).standard_normal(1024))
    bin_hz = SR / 256
    d0, dmid, d1 = an.curve_db([10 * bin_hz, 10.5 * bin_hz, 11 * bin_hz])
    assert min(d0, d1) - 1e-9 <= dmid <= max(d0, d1) + 1e-9
    # beyond nyquist clamps to the last bin
    assert an.curve_db([SR])[0] == an.db[-1]


def test_engine_integration_and_eq_curve():
    from algodsp_tpu.demo.engine import Engine
    e = Engine(SR)
    e.set_step(0, 440.0)
    # decay must span the rendered window: the sequencer-parity envelope
    # ends voices at decay_samples (sequencer.go:154-173), unlike the
    # old infinite exp tail
    e.set_transport(decay_s=2.0)
    for _ in range(4):
        e.render(4096)
    assert e.spectrum.ready
    assert float(e.spectrum.curve_db([440.0])[0]) > -40.0
    eq = e.eq_curve_db(np.array([1000.0]))
    assert abs(float(eq[0])) < 0.5  # default EQ is flat
    e.reset()
    assert not e.spectrum.ready
