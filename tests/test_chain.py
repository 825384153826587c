"""Effect-chain graph tests (mirrors effectchain tests, SURVEY.md §2.8)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from algodsp_tpu.chain import Chain, GraphError, parse_graph, default_registry
from tests.conftest import snr_db

SR = 48000.0


def make_chain(graph: dict) -> Chain:
    c = Chain(SR)
    c.load_graph(json.dumps(graph))
    return c


def test_parse_graph_topo_and_errors():
    g = parse_graph(json.dumps({
        "nodes": [{"id": "a", "type": "tremolo"},
                  {"id": "b", "type": "delay"}],
        "connections": [{"from": "_input", "to": "a"},
                        {"from": "a", "to": "b"},
                        {"from": "b", "to": "_output"}]}))
    assert g.order == ["a", "b"]
    assert parse_graph("").order == []
    with pytest.raises(GraphError):
        parse_graph(json.dumps({"nodes": [{"id": "a", "type": "x"},
                                          {"id": "a", "type": "y"}]}))
    with pytest.raises(GraphError):
        parse_graph(json.dumps({
            "nodes": [{"id": "a", "type": "x"}, {"id": "b", "type": "y"}],
            "connections": [{"from": "a", "to": "b"}, {"from": "b", "to": "a"}]}))
    with pytest.raises(GraphError):
        parse_graph(json.dumps({"nodes": [],
                                "connections": [{"from": "zz", "to": "_output"}]}))


def test_registry_has_all_default_types():
    r = default_registry()
    expected = {"chorus", "flanger", "ringmod", "bitcrusher", "distortion",
                "dist-cheb", "transformer", "widener", "phaser", "tremolo",
                "delay", "delay-simple", "filter", "filter-lowpass",
                "filter-highpass", "filter-bandpass", "filter-notch",
                "filter-allpass", "filter-peak", "filter-lowshelf",
                "filter-highshelf", "filter-moog", "bass", "pitch-time",
                "pitch-spectral", "spectral-freeze", "granular", "reverb",
                "reverb-freeverb", "reverb-fdn", "reverb-conv",
                "dyn-compressor", "dyn-limiter", "dyn-lookahead", "dyn-gate",
                "dyn-expander", "dyn-deesser", "dyn-transient",
                "dyn-multiband", "vocoder", "split-freq"}
    assert expected.issubset(set(r.types()))
    with pytest.raises(KeyError):
        r.lookup("nope")


def test_passthrough_chain():
    c = make_chain({"nodes": [],
                    "connections": [{"from": "_input", "to": "_output"}]})
    x = jnp.asarray(np.random.default_rng(0).standard_normal(256))
    state = c.init_state(dtype=jnp.float64)
    _, y = c.process(state, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_filter_node_matches_direct_chain():
    from algodsp_tpu.filters import BiquadChain
    from algodsp_tpu.filters.design import rbj
    c = make_chain({
        "nodes": [{"id": "f", "type": "filter-lowpass",
                   "params": {"freqHz": 2000.0, "q": 0.707}}],
        "connections": [{"from": "_input", "to": "f"},
                        {"from": "f", "to": "_output"}]})
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(1024))
    state = c.init_state(dtype=jnp.float64)
    _, y = c.process(state, x)
    ref = BiquadChain(rbj.lowpass(2000.0, 0.707, SR)).process(x)
    assert snr_db(np.asarray(ref), np.asarray(y)) > 200


def test_fan_in_mixing():
    # input -> (filter-lp, filter-hp) -> output sums the two paths
    c = make_chain({
        "nodes": [{"id": "lo", "type": "filter-lowpass",
                   "params": {"freqHz": 500.0}},
                  {"id": "hi", "type": "filter-highpass",
                   "params": {"freqHz": 500.0}}],
        "connections": [{"from": "_input", "to": "lo"},
                        {"from": "_input", "to": "hi"},
                        {"from": "lo", "to": "_output"},
                        {"from": "hi", "to": "_output"}]})
    x = jnp.asarray(np.random.default_rng(2).standard_normal(512))
    state = c.init_state(dtype=jnp.float64)
    _, y = c.process(state, x)
    assert np.asarray(y).shape == (512,)
    # both paths contribute
    assert float(jnp.sum(y * y)) > 0.1


def test_split_freq_ports():
    c = make_chain({
        "nodes": [{"id": "xo", "type": "split-freq",
                   "params": {"freqHz": 1000.0, "order": 4}}],
        "connections": [{"from": "_input", "to": "xo"},
                        {"from": "xo", "to": "_output", "fromPortIndex": 0},
                        {"from": "xo", "to": "_output", "fromPortIndex": 1}]})
    # lo + hi sums back to allpass of input
    imp = jnp.zeros(8192, dtype=jnp.float64).at[0].set(1.0)
    state = c.init_state(dtype=jnp.float64)
    _, y = c.process(state, imp)
    mag = np.abs(np.fft.rfft(np.asarray(y)))
    np.testing.assert_allclose(mag, 1.0, atol=1e-5)


def test_bypassed_node_passthrough():
    c = make_chain({
        "nodes": [{"id": "d", "type": "distortion", "bypassed": True,
                   "params": {"drive": 10.0}}],
        "connections": [{"from": "_input", "to": "d"},
                        {"from": "d", "to": "_output"}]})
    x = jnp.asarray(np.random.default_rng(3).standard_normal(128))
    state = c.init_state(dtype=jnp.float64)
    _, y = c.process(state, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_sidechain_edge():
    # compressor keyed by a sidechain signal on input port 1
    c = make_chain({
        "nodes": [{"id": "comp", "type": "dyn-compressor",
                   "params": {"thresholdDB": -30.0, "ratio": 10.0,
                              "attackMs": 1.0}},
                  {"id": "sc", "type": "filter-highpass",
                   "params": {"freqHz": 4000.0}}],
        "connections": [{"from": "_input", "to": "comp"},
                        {"from": "_input", "to": "sc"},
                        {"from": "sc", "to": "comp", "toPortIndex": 1},
                        {"from": "comp", "to": "_output"}]})
    t = np.arange(9600) / SR
    x = jnp.asarray(np.sin(2 * np.pi * 100.0 * t) * 0.5)
    state = c.init_state(dtype=jnp.float64)
    _, y = c.process(state, x)
    # sidechain is HP of a pure 100 Hz tone -> nearly silent -> no compression
    np.testing.assert_allclose(np.asarray(y)[4800:], np.asarray(x)[4800:],
                               rtol=1e-2)


def test_config4_chain_compressor_reverb_chorus_delay():
    """BASELINE config 4: soft-knee compressor + Freeverb + chorus +
    feedback delay, multi-channel blocks, one jitted program."""
    c = make_chain({
        "nodes": [
            {"id": "comp", "type": "dyn-compressor",
             "params": {"thresholdDB": -20.0, "ratio": 4.0}},
            {"id": "rev", "type": "reverb-freeverb",
             "params": {"wet": 0.2, "dry": 1.0}},
            {"id": "cho", "type": "chorus", "params": {"mix": 0.4}},
            {"id": "del", "type": "delay",
             "params": {"time": 0.1, "feedback": 0.3, "mix": 0.25}},
        ],
        "connections": [
            {"from": "_input", "to": "comp"},
            {"from": "comp", "to": "rev"},
            {"from": "rev", "to": "cho"},
            {"from": "cho", "to": "del"},
            {"from": "del", "to": "_output"},
        ]})
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((4, 2048)) * 0.3)
    state = c.init_state((4,), dtype=jnp.float64)
    proc = jax.jit(c.process)
    state, y1 = proc(state, x)
    state, y2 = proc(state, x)
    assert np.asarray(y1).shape == (4, 2048)
    assert np.all(np.isfinite(np.asarray(y1)))
    assert not np.allclose(np.asarray(y1), np.asarray(y2))  # stateful


def test_unknown_type_raises():
    c = Chain(SR)
    with pytest.raises(KeyError):
        c.load_graph(json.dumps({
            "nodes": [{"id": "x", "type": "does-not-exist"}],
            "connections": []}))


def test_every_node_type_processes_with_defaults():
    """Single-node graph with default params for EVERY registered type:
    each factory must build and process a finite block (the loader-level
    analog of the reference's per-effect construction tests)."""
    r = default_registry()
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32))
    for t in sorted(r.types()):
        c = make_chain({
            "nodes": [{"id": "n", "type": t, "params": {}}],
            "connections": [{"from": "_input", "to": "n"},
                            {"from": "n", "to": "_output"}]})
        state = c.init_state(batch_shape=(2,), dtype=jnp.float32)
        _, y = c.process(state, x)
        y = np.asarray(y)
        assert y.shape == (2, 1024), t
        assert np.all(np.isfinite(y)), t
        # channel independence: row 0 of the batch equals processing
        # that row alone (catches cross-channel leaks/broadcast bugs)
        s1 = c.init_state(batch_shape=(1,), dtype=jnp.float32)
        _, y1 = c.process(s1, x[:1])
        np.testing.assert_allclose(np.asarray(y1)[0], y[0], atol=2e-5,
                                   err_msg=t)
