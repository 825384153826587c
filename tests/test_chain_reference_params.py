"""Reference-format graph JSONs load unmodified.

Mirrors `dsp/effectchain/integration_test.go:17-51`: the exact
node-type + param-name table the reference's own integration test uses
(its camelCase names, string enums, units). Each entry becomes a
single-node graph `_input -> node -> _output`, processed on a sine
block; output must be finite and (for linear-ish nodes) non-trivial.
"""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from algodsp_tpu.chain import Chain

SR = 44100.0

# (type, params) rows from integration_test.go:21-51, verbatim names.
REFERENCE_TABLE = [
    ("chorus", {"mix": 0.5, "depth": 0.5, "speed": 1.0, "stages": 2.0}),
    ("flanger", {"rate": 0.5, "depth": 0.002, "baseDelay": 0.003,
                 "feedback": 0.5, "mix": 0.5}),
    ("ringmod", {"carrierHz": 440.0, "mix": 0.5}),
    ("bitcrusher", {"bitDepth": 8.0, "downsampleFactor": 2.0, "mix": 0.5}),
    ("distortion", {"drive": 5.0, "mix": 0.5, "mode": "softclip",
                    "approx": "exact"}),
    ("dist-cheb", {"drive": 5.0, "mix": 0.5, "order": 3.0,
                   "harmonicMode": "all"}),
    ("widener", {"width": 1.0, "mix": 0.5}),
    ("phaser", {"rate": 0.5, "depth": 0.5, "feedback": 0.3, "stages": 4.0,
                "mix": 0.5}),
    ("tremolo", {"rate": 4.0, "depth": 0.5, "mix": 0.5}),
    ("delay", {"delayMs": 200.0, "feedback": 0.3, "mix": 0.4}),
    ("delay-simple", {"delaySamples": 100.0, "feedback": 0.3, "mix": 0.5}),
    ("bass", {"drive": 3.0, "freq": 100.0, "mix": 0.5}),
    ("reverb-freeverb", {"roomSize": 0.7, "damping": 0.5, "wet": 0.3,
                         "dry": 0.7}),
    ("reverb-fdn", {"decaySeconds": 1.5, "damping": 0.5, "mix": 0.3}),
    ("reverb", {"model": "fdn", "decaySeconds": 1.0, "mix": 0.3}),
    ("dyn-compressor", {"threshold": -20.0, "ratio": 4.0, "attackMs": 10.0,
                        "releaseMs": 100.0, "makeupGain": 6.0}),
    ("dyn-limiter", {"threshold": -3.0, "attackMs": 1.0, "releaseMs": 50.0}),
    ("dyn-gate", {"threshold": -40.0, "attackMs": 1.0, "releaseMs": 50.0,
                  "ratio": 10.0}),
    ("dyn-expander", {"threshold": -30.0, "ratio": 2.0, "attackMs": 5.0,
                      "releaseMs": 50.0}),
    ("dyn-deesser", {"threshold": -20.0, "freq": 6000.0, "ratio": 4.0,
                     "mode": "splitband", "detector": "bandpass"}),
    ("dyn-transient", {"attack": 0.5, "sustain": 0.5}),
    ("dyn-multiband", None),
    ("pitch-time", {"semitones": 2.0, "mix": 0.5}),
    ("pitch-spectral", {"semitones": -3.0, "mix": 0.5, "frameSize": 2048.0}),
    ("spectral-freeze", {"freeze": 1.0, "mix": 0.5, "phaseMode": "advance"}),
    ("granular", {"grainSize": 50.0, "density": 4.0, "pitchShift": 0.0,
                  "mix": 0.5}),
    ("transformer", {"drive": 3.0, "mix": 0.5, "quality": "high",
                     "oversampling": 2.0}),
    ("vocoder", {"bands": 16.0, "mix": 0.5}),
    ("dyn-lookahead", {"threshold": -3.0, "attackMs": 5.0, "releaseMs": 50.0}),
]


def _sine_block(n=2048):
    t = np.arange(n)
    return jnp.asarray(0.5 * np.sin(2 * np.pi * 440.0 * t / SR),
                       jnp.float32)[None, :]


@pytest.mark.parametrize("etype,params", REFERENCE_TABLE,
                         ids=[t for t, _ in REFERENCE_TABLE])
def test_reference_param_names_load_unmodified(etype, params):
    graph = {
        "nodes": [{"id": "fx", "type": etype, "params": params or {}}],
        "connections": [{"from": "_input", "to": "fx"},
                        {"from": "fx", "to": "_output"}],
    }
    c = Chain(SR)
    c.load_graph(json.dumps(graph))
    st = c.init_state((1,))
    # WSOLA needs >= one full analysis window (82+10+28 ms preset)
    x = _sine_block(8192 if etype == "pitch-time" else 2048)
    _, y = c.process(st, x)
    y = np.asarray(y)
    assert y.shape == x.shape
    assert np.all(np.isfinite(y)), f"{etype}: non-finite output"
    assert float(np.max(np.abs(y))) > 1e-6, f"{etype}: silent output"


def test_reference_style_multinode_graph():
    """A webdemo-style graph: filter -> split-freq -> per-band dynamics ->
    mixed -> reverb, all with reference param names/ports."""
    graph = {
        "nodes": [
            {"id": "eq", "type": "filter",
             "params": {"family": "butterworth", "kind": "lowpass",
                        "freq": 8000.0, "order": 4.0, "gain": 0.0}},
            {"id": "split", "type": "split-freq",
             "params": {"freq": 800.0, "order": 4.0}},
            {"id": "comp", "type": "dyn-compressor",
             "params": {"threshold": -24.0, "ratio": 3.0, "attackMs": 5.0,
                        "releaseMs": 80.0}},
            {"id": "gate", "type": "dyn-gate",
             "params": {"threshold": -45.0, "attackMs": 1.0,
                        "releaseMs": 40.0}},
            {"id": "verb", "type": "reverb-freeverb",
             "params": {"roomSize": 0.6, "damping": 0.4, "wet": 0.2,
                        "dry": 0.8}},
        ],
        "connections": [
            {"from": "_input", "to": "eq"},
            {"from": "eq", "to": "split"},
            {"from": "split", "to": "comp", "fromPortIndex": 0},
            {"from": "split", "to": "gate", "fromPortIndex": 1},
            {"from": "comp", "to": "verb"},
            {"from": "gate", "to": "verb"},
            {"from": "verb", "to": "_output"},
        ],
    }
    c = Chain(SR)
    c.load_graph(json.dumps(graph))
    st = c.init_state((2,))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 4096)) * 0.3, jnp.float32)
    _, y = c.process(st, x)
    y = np.asarray(y)
    assert y.shape == x.shape and np.all(np.isfinite(y))
    assert float(np.max(np.abs(y))) > 1e-4
