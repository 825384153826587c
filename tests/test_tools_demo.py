"""wininfo CLI and demo engine tests (L8 application layer)."""

import json

import numpy as np
import pytest

from algodsp_tpu.tools import wininfo
from algodsp_tpu.demo import Engine, EQBand, Waveform


def test_wininfo_list(capsys):
    assert wininfo.main(["--list"]) == 0
    out = capsys.readouterr().out
    assert "hann" in out and "albrecht-11t" in out
    assert len(out.strip().splitlines()) == 32


def test_wininfo_single(capsys):
    assert wininfo.main(["hann", "--size", "512"]) == 0
    out = capsys.readouterr().out
    assert "hann" in out
    assert "1.50" in out  # ENBW


def test_wininfo_kaiser_alpha(capsys):
    assert wininfo.main(["kaiser", "--alpha", "8.0"]) == 0
    out = capsys.readouterr().out
    assert "kaiser" in out


def test_wininfo_all_and_unknown(capsys):
    assert wininfo.main(["--all", "--size", "256"]) == 0
    out = capsys.readouterr().out
    assert len(out.strip().splitlines()) >= 34  # header + 32 rows
    assert wininfo.main(["nope"]) == 1


def test_engine_renders_sequence():
    e = Engine(48000.0, bpm=240.0, waveform=Waveform.SINE)
    e.set_step(0, 440.0)
    e.set_step(4, 660.0)
    y = e.render(24000)
    assert y.shape == (24000,)
    assert y.dtype == np.float32
    assert np.abs(y).max() > 0.01  # sound came out
    assert np.all(np.isfinite(y))
    # step boundaries: step period = 60/240/4 s = 3000 samples
    assert e.samples_per_step == 3000


def test_engine_block_continuity():
    e1 = Engine(48000.0, bpm=120.0)
    e1.set_step(0, 220.0)
    full = e1.render(8192)
    e2 = Engine(48000.0, bpm=120.0)
    e2.set_step(0, 220.0)
    parts = np.concatenate([e2.render(2048) for _ in range(4)])
    # float32 state hand-off at block edges is amplified by the EQ's
    # resonant poles; ~60 dB agreement is the f32 expectation
    err = full - parts
    snr = 10 * np.log10((full.astype(np.float64) ** 2).sum()
                        / max((err.astype(np.float64) ** 2).sum(), 1e-30))
    assert snr > 55


def test_engine_eq_shapes_sound():
    e = Engine(48000.0, waveform=Waveform.SAW)
    e.set_step(0, 110.0)
    base = e.render(16384)
    e.reset()
    e.set_eq([EQBand(100.0, 0.0, family="lowshelf"),
              EQBand(400.0), EQBand(1000.0), EQBand(4000.0),
              EQBand(8000.0, -24.0, q=0.5, family="highshelf")])
    shaped = e.render(16384)
    s_base = np.abs(np.fft.rfft(base.astype(np.float64)))
    s_shaped = np.abs(np.fft.rfft(shaped.astype(np.float64)))
    freqs = np.fft.rfftfreq(16384, 1 / 48000.0)
    hi = freqs > 10000
    # high band cut by the shelf
    assert s_shaped[hi].sum() < 0.2 * s_base[hi].sum()


def test_engine_with_effect_chain():
    e = Engine(48000.0)
    e.set_step(0, 330.0)
    e.load_chain(json.dumps({
        "nodes": [{"id": "d", "type": "distortion",
                   "params": {"drive": 5.0, "mode": "tanh"}}],
        "connections": [{"from": "_input", "to": "d"},
                        {"from": "d", "to": "_output"}]}))
    y = e.render(8192)
    assert np.all(np.isfinite(y))
    assert np.abs(y).max() > 0.01


def test_engine_transport_shuffle():
    """Swing timing (`sequencer.go:134-152`): even steps stretch by the
    shuffle ratio, odd steps shrink, pattern length unchanged."""
    from algodsp_tpu.demo.engine import shuffle_ratio
    e = Engine(48000.0, bpm=120.0)
    e.set_transport(shuffle=1.0)
    base = e.samples_per_step
    r = shuffle_ratio(1.0)
    assert r == pytest.approx(1.0 / 3.0)
    assert e.step_duration(0) == pytest.approx(base * (1 + r))
    assert e.step_duration(1) == pytest.approx(base * (1 - r))
    assert e.step_duration(0) + e.step_duration(1) == pytest.approx(2 * base)
    # half-shuffle follows the ^1.6 curve, not linear
    e.set_transport(shuffle=0.5)
    assert e.step_duration(0) / base - 1 == pytest.approx(
        (1.0 / 3.0) * 0.5 ** 1.6)
    # transport setters clamp (`SetTransport`, sequencer.go:39-51)
    e.set_transport(bpm=-5)          # ignored
    assert e.bpm == 120.0
    e.set_transport(decay_s=0.0)     # floored
    assert e.voice_decay > 0


def test_engine_running_gate():
    """SetRunning stops new triggers; restart rewinds to step 0
    (`sequencer.go:53-61`)."""
    e = Engine(48000.0, bpm=960.0)
    e.set_steps([440.0] * 16)
    e.set_running(False)
    y = e.render(4800)
    assert np.all(y == 0)
    e.set_running(True)
    y = e.render(4800)
    assert np.abs(y).max() > 0.01
    assert e.current_step >= 0


def test_engine_step_config_forms():
    """set_steps accepts dicts/StepConfig/floats; freq<=0 defaults to
    110 Hz like `SetSteps` (`sequencer.go:63-73`)."""
    from algodsp_tpu.demo.engine import StepConfig
    e = Engine(48000.0)
    e.set_steps([{"enabled": True, "freq": -1.0},
                 StepConfig(enabled=True, freq_hz=220.0),
                 330.0, 0.0])
    assert e.steps[0].enabled and e.steps[0].freq_hz == 110.0
    assert e.steps[1].freq_hz == 220.0
    assert e.steps[2].enabled and e.steps[2].freq_hz == 330.0
    assert not e.steps[3].enabled
    e.default_pattern()
    assert sum(s.enabled for s in e.steps) == 4


def test_engine_envelope_attack_decay():
    """Envelope rises over ~5 ms to the peak then decays exponentially
    (`sequencer.go:154-173`) — check the rendered onset is ramped, not
    a hard edge, and the tail decays."""
    e = Engine(48000.0, bpm=30.0, waveform=Waveform.SINE,
               voice_decay_s=0.1, voice_amp=0.22)
    e.set_steps([{"enabled": True, "freq": 1000.0}] + [{"enabled": False}] * 15)
    y = np.abs(e.render(24000))
    first_ms = y[:48].max()          # 1 ms in: still ramping
    at_peak = y[:2400].max()         # peak within the first 50 ms
    assert first_ms < 0.5 * at_peak
    assert at_peak == pytest.approx(0.22, rel=0.35)  # EQ is ~flat
    assert y[12000:].max() < 0.01 * at_peak          # decayed by 250 ms


def test_engine_node_curves():
    """Per-node response + dynamics static curve endpoints
    (`engine.go:623-672`)."""
    e = Engine(48000.0)
    e.load_chain(json.dumps({
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -20.0, "ratio": 4.0, "kneeDB": 0.0,
                        "makeupGainDB": 0.0}},
            {"id": "lp", "type": "filter-lowpass",
             "params": {"freq": 1000.0, "order": 2}}],
        "connections": [{"from": "_input", "to": "comp"},
                        {"from": "comp", "to": "lp"},
                        {"from": "lp", "to": "_output"}]}))
    # static curve: identity below threshold, 1:4 slope above
    curve = e.node_static_curve_db("comp", [-40.0, 0.0])
    assert curve[0] == pytest.approx(-40.0, abs=0.2)
    assert curve[1] == pytest.approx(-20.0 + 20.0 / 4.0, abs=0.5)
    # response: lowpass passes 100 Hz, attenuates 10 kHz
    resp = e.node_response_db("lp", [100.0, 10000.0])
    assert resp[0] == pytest.approx(0.0, abs=1.0)
    assert resp[1] < -30.0
    with pytest.raises((KeyError, ValueError)):
        e.node_response_db("comp", [100.0])
    with pytest.raises((KeyError, ValueError)):
        e.node_static_curve_db("nope", [0.0])


def test_engine_voice_stealing():
    e = Engine(48000.0, bpm=960.0)  # very fast steps
    for i in range(16):
        e.set_step(i, 100.0 + i)
    for _ in range(20):
        e.render(4800)
    from algodsp_tpu.demo.engine import MAX_VOICES
    assert len(e._voices) <= MAX_VOICES
