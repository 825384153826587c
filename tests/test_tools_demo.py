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


def test_engine_voice_stealing():
    e = Engine(48000.0, bpm=960.0)  # very fast steps
    for i in range(16):
        e.set_step(i, 100.0 + i)
    for _ in range(20):
        e.render(4800)
    from algodsp_tpu.demo.engine import MAX_VOICES
    assert len(e._voices) <= MAX_VOICES
